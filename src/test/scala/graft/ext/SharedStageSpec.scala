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

  test("builds within one session serialize: concurrency builds exactly once") {
    Stages.clearShared()
    val spark2 = spark
    import spark2.implicits._
    val before = Stages.sharedBuilds
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Seq[Int]] {
          def call(): Seq[Int] = Stages.shared(spark, "ssc-serial") {
            Thread.sleep(50) // widen the window a racy impl would lose
            Stages.materialize(Seq(4, 5).toDF("n"))
          }.collect().map(_.getInt(0)).sorted.toSeq
        })
      }
      assert(futs.map(_.get()).forall(_ == Seq(4, 5)))
    } finally pool.shutdown()
    assert(Stages.sharedBuilds - before == 1,
      s"per-session build serialization must build once, saw ${Stages.sharedBuilds - before}")
  }

  test("two live sessions never share an entry") {
    Stages.clearShared()
    val s2 = spark.newSession()
    import org.apache.spark.sql.functions.lit
    val a = Stages.shared(spark, "ssc-iso") {
      Stages.materialize(spark.range(1).select(lit("sessA").as("v")))
    }
    val b = Stages.shared(s2, "ssc-iso") {
      Stages.materialize(s2.range(1).select(lit("sessB").as("v")))
    }
    assert(a.collect().head.getString(0) == "sessA")
    assert(b.collect().head.getString(0) == "sessB")
    assert(Stages.sharedEntries >= 2)
  }

  test("invalidate(session) evicts exactly that session's entries") {
    Stages.clearShared()
    val s2 = spark.newSession()
    import org.apache.spark.sql.functions.lit
    Stages.shared(spark, "ssc-ev") {
      Stages.materialize(spark.range(1).select(lit(1).as("v")))
    }
    Stages.shared(s2, "ssc-ev") {
      Stages.materialize(s2.range(1).select(lit(2).as("v")))
    }
    assert(Stages.sharedEntries == 2)
    Stages.invalidate(s2)
    assert(Stages.sharedEntries == 1)
    // surviving session still hits its cache
    val b = Stages.sharedBuilds
    Stages.shared(spark, "ssc-ev")(fail("must hit cache"))
    assert(Stages.sharedBuilds == b)
    // the invalidated session rebuilds on next use (no stale frame)
    val rebuilt = Stages.shared(s2, "ssc-ev") {
      Stages.materialize(s2.range(1).select(lit(3).as("v")))
    }
    assert(rebuilt.collect().head.getInt(0) == 3)
  }

  test("registry is capped: churning sessions evict oldest entries first") {
    Stages.clearShared()
    val spark2 = spark
    import spark2.implicits._
    sys.props("graft.sharedStageCap") = "4"
    try {
      (1 to 10).foreach { i =>
        Stages.shared(spark, s"ssc-cap-$i") {
          Stages.materialize(Seq(i).toDF("n"))
        }
      }
      assert(Stages.sharedEntries <= 4,
        s"cap=4 but registry holds ${Stages.sharedEntries}")
      // newest entries survive; oldest were evicted
      val b = Stages.sharedBuilds
      Stages.shared(spark, "ssc-cap-10")(fail("newest must hit cache"))
      assert(Stages.sharedBuilds == b)
      val rebuilt = Stages.shared(spark, "ssc-cap-1") {
        Stages.materialize(Seq(99).toDF("n"))
      }
      assert(rebuilt.collect().head.getInt(0) == 99, "oldest must have been evicted")
    } finally sys.props.remove("graft.sharedStageCap")
  }

  test("session locks die with their sessions, not with invalidate (ADVICE r11)") {
    Stages.clearShared()
    import org.apache.spark.sql.functions.lit
    // invalidate() must NOT drop the session's lock: a concurrent build
    // holding it would otherwise race a fresh lock in the same session
    val s2 = spark.newSession()
    Stages.shared(s2, "ssc-lock") {
      Stages.materialize(s2.range(1).select(lit(1).as("v")))
    }
    val locksBefore = Stages.sessionLockCount
    Stages.invalidate(s2)
    assert(Stages.sessionLockCount == locksBefore,
      "invalidate must leave the session's lock in place")
    // churned sessions release their lock entry once unreachable — the
    // weak per-session entry (id + lock) is the only thing holding it
    (1 to 8).foreach { i =>
      val s = spark.newSession()
      Stages.shared(s, s"ssc-lock-churn-$i") {
        Stages.materialize(s.range(1).select(lit(i).as("v")))
      }
      Stages.invalidate(s) // drop registry pins so the session can be GC'd
    }
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var n = Stages.sessionLockCount
    while (n > locksBefore + 2 && System.nanoTime() < deadline) {
      System.gc(); Thread.sleep(100); n = Stages.sessionLockCount
    }
    assert(n <= locksBefore + 2,
      s"dead sessions must not pin locks: $n live lock entries " +
        s"(baseline $locksBefore)")
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
