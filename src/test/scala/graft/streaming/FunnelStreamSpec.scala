package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class FEv(user_id: Long, ts: Timestamp, event_type: String)

/** Streaming funnel progression (FunnelStream) — the online twin of the
  * q88 batch funnel. */
class FunnelStreamSpec extends SparkSpec {

  private def t(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private def run(name: String)(batches: Seq[FEv]*): Seq[FunnelStream.FunnelEvent] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FEv]
    val q = FunnelStream.funnel(mem.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val out = spark.table(name).as[FunnelStream.FunnelEvent].collect().toSeq
    q.stop()
    out
  }

  test("in-order conversion emits one record per step with q88 latencies") {
    val out = run("funnel1")(Seq(
      FEv(1, t(10, 0), "view"),
      FEv(1, t(10, 30), "click"),
      FEv(1, t(11, 0), "purchase")))
    val steps = out.filter(_.user_id == 1).sortBy(_.step)
    assert(steps.map(s => (s.step, s.step_name, s.abandoned)) ===
      Seq((1, "view", false), (2, "click", false), (3, "purchase", false)))
    assert(steps.map(_.sec_from_start) === Seq(0L, 1800L, 3600L))
  }

  test("steps outside the horizon or out of order do not advance") {
    val out = run("funnel2")(Seq(
      FEv(2, t(1, 0), "click"), // before any view: ignored
      FEv(2, t(2, 0), "view"), // enters funnel
      FEv(2, t(23, 0), "click"), // 21 h later: outside 12 h horizon
      FEv(3, t(2, 0), "purchase"))) // wrong first step: ignored
    val u2 = out.filter(_.user_id == 2)
    assert(u2.filterNot(_.abandoned).map(_.step) === Seq(1),
      s"only the view step may advance: $u2")
    // the 23:00 event pushes the watermark past view+12h, so the stalled
    // funnel is evicted and reports the abandonment at the stalled step
    assert(u2.filter(_.abandoned).map(_.step) === Seq(1),
      s"stalled funnel must emit one abandonment: $u2")
    assert(out.filter(_.user_id == 3).isEmpty)
  }

  test("state persists across triggers and step order is enforced across them") {
    val out = run("funnel3")(
      Seq(FEv(4, t(9, 0), "view")),
      Seq(FEv(4, t(9, 10), "purchase")), // skipping click: must not advance
      Seq(FEv(4, t(9, 20), "click"), FEv(4, t(9, 40), "purchase")))
    val steps = out.filter(_.user_id == 4).sortBy(_.step)
    assert(steps.map(s => (s.step, s.step_name)) ===
      Seq((1, "view"), (2, "click"), (3, "purchase")))
    assert(steps.map(_.sec_from_start) === Seq(0L, 1200L, 2400L))
  }

  test("stream agrees with the q88 batch chaining on in-order history") {
    // replay a small multi-user in-order history through BOTH forms
    val history = Seq(
      FEv(10, t(8, 0), "view"), FEv(10, t(8, 5), "click"),
      FEv(10, t(8, 30), "purchase"),
      FEv(11, t(8, 0), "view"), FEv(11, t(8, 10), "click"),
      FEv(12, t(8, 0), "view"),
      FEv(13, t(8, 0), "click")) // never enters
    val out = run("funnel4")(history)
    import spark.implicits._
    val batch = history.toDF()
    batch.createOrReplaceTempView("__funnel_events")
    val q88 = spark.sql(
      """WITH v AS (SELECT user_id, MIN(ts) AS ts1 FROM __funnel_events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM __funnel_events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.ts1
        |        AND e.ts <= v.ts1 + INTERVAL 12 HOUR GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM __funnel_events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.ts2
        |        AND e.ts <= c.ts2 + INTERVAL 12 HOUR GROUP BY e.user_id)
        |SELECT v.user_id,
        |       CASE WHEN p.user_id IS NOT NULL THEN 3
        |            WHEN c.user_id IS NOT NULL THEN 2 ELSE 1 END AS step
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val streamed = out.filterNot(_.abandoned).groupBy(_.user_id)
      .view.mapValues(_.map(_.step).max).toMap
    assert(streamed === q88,
      s"stream $streamed must equal batch funnel $q88")
  }

  test("chatty non-advancing traffic cannot defer eviction past the horizon") {
    // ADVICE r9: a user emitting only non-advancing events after the
    // horizon expired used to re-arm the timeout to watermark+60s every
    // batch, deferring the abandonment (and state reclaim) indefinitely.
    // Now: once the funnel horizon is behind the watermark, the
    // abandonment is emitted inline in the batch that observes it.
    // chatter = "click" events OUTSIDE the horizon: they neither advance
    // the stalled funnel nor start a new one, so the only correct outcome
    // is exactly one abandonment, emitted promptly (via the armed timeout
    // or the inline check — whichever the batch/watermark interleaving
    // hits), never deferred while the chatter continues
    val out = run("funnel5")(
      Seq(FEv(20, t(1, 0), "view")), // enters funnel at 01:00
      // 13h+ later (12h horizon expired once the watermark catches up)
      Seq(FEv(20, t(14, 0), "click"), FEv(20, t(14, 1), "click")),
      Seq(FEv(20, t(14, 30), "click")),
      Seq(FEv(20, t(15, 0), "click")))
    val u = out.filter(_.user_id == 20)
    assert(u.filterNot(_.abandoned).map(_.step) === Seq(1), s"got: $u")
    assert(u.count(_.abandoned) === 1,
      s"exactly one prompt abandonment expected: $u")
    assert(u.find(_.abandoned).get.step === 1)
  }
}
