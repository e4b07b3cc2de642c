package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Property coverage for the time-banded interval overlap join: the
  * banding + single-emission construction must agree with the brute-force
  * theta formulation on randomized inputs, including the bucket-boundary
  * cases the 3-bucket replication argument hinges on. */
class IntervalJoinSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Long, Long)]) = { // (key, id, epochSec)
    import spark.implicits._
    rows.toDF("k", "id", "sec")
      .selectExpr("k", "id", "CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts")
  }

  private def brute(rows: Seq[(Long, Long, Long)], d: Long) =
    (for {
      a <- rows; b <- rows
      if a._1 == b._1 && a._2 < b._2 && math.abs(a._3 - b._3) < d
    } yield (a._1, a._2, b._2)).sortBy(identity)

  test("randomized agreement with the theta formulation") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val d = 60L + rnd.nextInt(240)
      val rows = (1L to 120L).map { id =>
        (rnd.nextInt(4).toLong, id,
          1700000000L + rnd.nextInt(2000).toLong)
      }
      val got = IntervalJoin.overlapSelfJoin(df(rows), "k", "ts", "id", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(identity).toSeq
      assert(got == brute(rows, d), s"trial $trial (d=$d s) diverged")
    }
  }

  test("bucket-boundary pairs: starts exactly D-1, D, D+1 apart") {
    val d = 100L
    val base = 1700000000L // not bucket-aligned: 17000000.00 buckets
    val rows = Seq(
      (1L, 1L, base), (1L, 2L, base + d - 1), // overlap (Δ = D-1)
      (1L, 3L, base + d),                     // no overlap with id 1 (Δ = D)
      (2L, 4L, base), (2L, 5L, base + d + 1)) // different key spacing
    val got = IntervalJoin.overlapSelfJoin(df(rows), "k", "ts", "id", d)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(identity).toSeq
    assert(got == Seq((1L, 2L), (2L, 3L)),
      s"boundary semantics diverged: $got")
  }

  test("each qualifying pair is emitted exactly once") {
    // identical timestamps (maximal bucket sharing) must still yield one
    // row per pair — the single-emission argument's worst case
    val rows = (1L to 6L).map(id => (7L, id, 1700000500L))
    val got = IntervalJoin.overlapSelfJoin(df(rows), "k", "ts", "id", 300L)
      .collect()
    assert(got.length == 15, s"expected C(6,2)=15 rows, got ${got.length}")
  }
}
