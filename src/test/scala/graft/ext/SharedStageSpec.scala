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
