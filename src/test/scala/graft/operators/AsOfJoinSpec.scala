package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The distributed as-of join (union + one window pass per key). */
class AsOfJoinSpec extends SparkSpec {

  import java.sql.Timestamp
  private def t(s: Long) = new Timestamp(s * 1000L)

  private def frames() = {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, t(100)),  // matches r2 (ts 90, latest <= 100)
      (2L, 10L, t(50)),   // matches r1 (ts 50, inclusive at equal ts)
      (3L, 10L, t(10)),   // no prior right row -> nulls
      (4L, 20L, t(100)),  // tie at ts 80: rid 41 vs 42 -> 42 wins
      (5L, 30L, t(100))   // key with no right rows at all -> nulls
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (11L, 10L, t(50), "a"),
      (12L, 10L, t(90), "b"),
      (13L, 10L, t(101), "late"), // after every left row of key 10 but t(101) > 100
      (41L, 20L, t(80), "x"),
      (42L, 20L, t(80), "y")
    ).toDF("rid", "k", "ts", "payload")
    (left, right)
  }

  test("as-of join picks the latest right row at or before each left ts") {
    val (l, r) = frames()
    val got = AsOfJoin.asOf(l, r, "k", "ts", Seq("rid", "payload"), "rid")
      .select("event_id", "rid", "payload")
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) -1L else x.getLong(1),
        Option(x.getString(2)).getOrElse(""))).toSet
    assert(got == Set(
      (1L, 12L, "b"),   // latest <= 100 is ts 90
      (2L, 11L, "a"),   // inclusive match at equal ts
      (3L, -1L, ""),    // nothing at or before ts 10
      (4L, 42L, "y"),   // tie on ts: larger tieBreak wins, payload from SAME row
      (5L, -1L, "")     // key absent from right side
    ), got.toString)
  }

  test("tolerance null-extends matches older than the lookback bound") {
    val (l, r) = frames()
    // 30-second lookback: event 1 (ts 100) still matches rid 12 (ts 90),
    // but event 2 keeps its equal-ts match and nothing else changes;
    // with a 5-second lookback event 1's ts-90 match ages out too
    val got30 = AsOfJoin.asOf(l, r, "k", "ts", Seq("rid", "payload"), "rid",
        tolerance = Some("INTERVAL 30 SECONDS"))
      .select("event_id", "rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toSet
    assert(got30 == Set((1L, 12L), (2L, 11L), (3L, -1L), (4L, 42L),
      (5L, -1L)), got30.toString)
    val got5 = AsOfJoin.asOf(l, r, "k", "ts", Seq("rid", "payload"), "rid",
        tolerance = Some("INTERVAL 5 SECONDS"))
      .select("event_id", "rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toSet
    assert(got5 == Set((1L, -1L), (2L, 11L), (3L, -1L), (4L, -1L),
      (5L, -1L)), got5.toString)
  }

  test("as-of plan is one hash shuffle per side + window — no range join") {
    val (l, r) = frames()
    val plan = AsOfJoin.asOf(l, r, "k", "ts", Seq("rid", "payload"), "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct") &&
      !plan.contains("SortMergeJoin"), plan.take(1500))
    assert(plan.contains("Window"), plan.take(1500))
    // exactly the one shuffle that partitions the union by the join key
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n${plan.take(2000)}")
  }

  test("q57 driver row matches the LATERAL-top-1 reference on testdata") {
    graft.Tables.ensure(spark, sfDir)
    val ev = spark.table("events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_id"), col("value").as("view_value"))
    val got = AsOfJoin.asOf(clicks, views, "user_id", "ts",
        Seq("view_id", "view_value"), "view_id")
      .select("event_id", "view_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // reference: per-click correlated top-1, computed with a window rank
    val ref = spark.sql(
      """SELECT event_id, view_id FROM (
        |  SELECT l.event_id, r.event_id AS view_id,
        |         ROW_NUMBER() OVER (PARTITION BY l.event_id
        |                            ORDER BY r.ts DESC, r.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'click') l
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
        |    ON r.user_id = l.user_id AND r.ts <= l.ts
        |) WHERE rn = 1""".stripMargin)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == ref,
      s"${(got.toSet -- ref.toSet).take(5)} vs ${(ref.toSet -- got.toSet).take(5)}")
  }
}
