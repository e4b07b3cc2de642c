package graft.ext

import graft.{SparkEntry, SparkSpec}

/** Session shared-stage registry (VERDICT r9 next-round #4): the
  * corpus-scale intermediates behind x54/x75/x108 (PPJoin unigram pairs)
  * and x104/x105/x109 (fingerprint frame, mirror edges) must be derived
  * once per (session, dir) and reused, with values unchanged. */
class SharedStageSpec extends SparkSpec {

  private def run(q: String, dir: String = sfDir): Seq[String] =
    SparkEntry.queries(q)(spark, dir).collect().map(_.toString).sorted.toSeq

  test("x104/x105/x109 share the fingerprint + mirror-edge stages") {
    Stages.clearShared()
    val before = Stages.sharedBuilds
    val cold = (run("x104_overlap_matrix"), run("x105_pagerank"),
      run("x109_triangles"))
    val builds = Stages.sharedBuilds
    // docFp + mirrorPairs — exactly two shared builds for all three rows
    assert(builds - before == 2,
      s"expected 2 shared builds, saw ${builds - before}")
    // warm re-run: zero additional builds, identical values
    val warm = (run("x104_overlap_matrix"), run("x105_pagerank"),
      run("x109_triangles"))
    assert(Stages.sharedBuilds == builds, "warm re-run rebuilt a stage")
    assert(warm == cold)
  }

  test("x54/x75/x108 share the PPJoin pair stage and the label frame") {
    Stages.clearShared()
    val before = Stages.sharedBuilds
    val cold = (run("x54_ngram_jaccard"), run("x75_components"),
      run("x108_keep_best"))
    val builds = Stages.sharedBuilds
    // unigramPairs(t=0.8) + components(t=0.8)
    assert(builds - before == 2,
      s"expected 2 shared builds, saw ${builds - before}")
    val warm = (run("x54_ngram_jaccard"), run("x75_components"),
      run("x108_keep_best"))
    assert(Stages.sharedBuilds == builds, "warm re-run rebuilt a stage")
    assert(warm == cold)
  }

  test("builds compose: a shared build may call shared for its inputs") {
    Stages.clearShared()
    val spark2 = spark
    import spark2.implicits._
    val inner = Stages.shared(spark, "ssc-outer") {
      val in = Stages.shared(spark, "ssc-inner") {
        Stages.materialize(Seq(1, 2, 3).toDF("n"))
      }
      Stages.materialize(in.selectExpr("n * 10 AS n"))
    }
    assert(inner.collect().map(_.getInt(0)).sorted.toSeq == Seq(10, 20, 30))
    // the inner stage is independently cached too
    val b = Stages.sharedBuilds
    Stages.shared(spark, "ssc-inner")(fail("must hit cache"))
    Stages.shared(spark, "ssc-outer")(fail("must hit cache"))
    assert(Stages.sharedBuilds == b)
  }

  test("concurrent lookups of one stage never fail and agree on values") {
    Stages.clearShared()
    val spark2 = spark
    import spark2.implicits._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Seq[Int]] {
          def call(): Seq[Int] = Stages.shared(spark, "ssc-conc") {
            Stages.materialize(Seq(7, 8).toDF("n"))
          }.collect().map(_.getInt(0)).sorted.toSeq
        })
      }
      assert(futs.map(_.get()).forall(_ == Seq(7, 8)))
    } finally pool.shutdown()
    // last-writer-wins may build more than once under the race, but the
    // registry must settle: a subsequent call is a pure cache hit
    val b = Stages.sharedBuilds
    Stages.shared(spark, "ssc-conc")(fail("must hit cache"))
    assert(Stages.sharedBuilds == b)
  }

  test("switching data dir invalidates and rebuilds; values follow the dir") {
    Stages.clearShared()
    val small = run("x104_overlap_matrix", "/root/testdata/sf0.001")
    val b1 = Stages.sharedBuilds
    val big = run("x104_overlap_matrix", "/root/testdata/sf0.01")
    assert(Stages.sharedBuilds > b1, "dir switch did not rebuild the stage")
    assert(small != big, "sf0.001 and sf0.01 overlap matrices should differ")
    // and switching back rebuilds again (at most one live entry per stage)
    val again = run("x104_overlap_matrix", "/root/testdata/sf0.001")
    assert(again == small)
  }
}
