package graft.ext

import graft.SparkSpec

/** Greedy sequence packing: budget respected, order preserved, streaming
  * group scan (flatMapSortedGroups — no group materialization). */
class PackingSpec extends SparkSpec {

  private def pack(rows: Seq[(String, Long, Int)], budget: Int) = {
    import spark.implicits._
    val df = rows.toDF("lang", "doc_id", "ntoks")
    Packing.greedyPack(df, "lang", "doc_id", "ntoks", budget)
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
  }

  test("packs fill greedily and reset exactly at overflow") {
    val got = pack(Seq(
      ("a", 1L, 100), ("a", 2L, 100), ("a", 3L, 60), // 100+100 fits, +60 overflows
      ("a", 4L, 250), ("a", 5L, 10)                  // 250 after 60 overflows; 10 fits? 250+10>256 -> no
    ), budget = 256)
    assert(got.map(t => (t._2, t._4)).toSeq ==
      Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 2L), (5L, 3L)),
      got.mkString(","))
  }

  test("oversize documents get a pack of their own, never split") {
    val got = pack(Seq(
      ("a", 1L, 500), ("a", 2L, 10), ("a", 3L, 700), ("a", 4L, 10)
    ), budget = 256)
    // 500 opens pack 0 alone; 10 overflows -> pack 1; 700 -> pack 2; 10 -> pack 3
    assert(got.map(t => (t._2, t._4)).toSeq ==
      Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)), got.mkString(","))
  }

  test("groups pack independently with 0-based contiguous pack ids") {
    val rows = (0 until 50).map(i => ("g" + (i % 3), i.toLong, 100))
    val got = pack(rows, budget = 256)
    val byGroup = got.groupBy(_._1)
    byGroup.foreach { case (g, rs) =>
      val packs = rs.map(_._4).distinct.sorted.toSeq
      assert(packs == (0L until packs.size.toLong).toSeq,
        s"$g: $packs")
      // every pack except possibly the last holds exactly two 100-token docs
      rs.groupBy(_._4).foreach { case (_, docs) =>
        assert(docs.map(_._3).sum <= 256)
      }
      // greedy means no pack before the last could have accepted its
      // successor's first doc: with uniform 100s every full pack has 2 docs
      val sizes = rs.groupBy(_._4).view.mapValues(_.size).toMap
      (0L until packs.size - 1).foreach(p => assert(sizes(p) == 2, s"$g/$p"))
    }
  }

  test("budget boundary is inclusive (acc + n == budget still fits)") {
    val got = pack(Seq(("a", 1L, 128), ("a", 2L, 128), ("a", 3L, 1)), 256)
    assert(got.map(t => (t._2, t._4)).toSeq ==
      Seq((1L, 0L), (2L, 0L), (3L, 1L)), got.mkString(","))
  }

  test("assignment is deterministic across executions and matches a local reference") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map(i =>
      ("g" + rnd.nextInt(4), i.toLong, rnd.nextInt(300)))
    val got = pack(rows, budget = 256)
    // local reference: same greedy scan per group in doc_id order
    val ref = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      var acc = 0L; var p = -1L
      rs.sortBy(_._2).map { case (_, id, n) =>
        if (p < 0 || acc + n > 256) { p += 1; acc = n } else acc += n
        (g, id, n, p)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == ref, s"first diff: ${got.toSeq.zip(ref).find(x => x._1 != x._2)}")
    assert(pack(rows, budget = 256).toSeq == got.toSeq)
  }
}
