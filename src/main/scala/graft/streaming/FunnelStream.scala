package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel progression — the online form of the q88 batch funnel
  * (ordered steps, each within a horizon of the previous one), emitting a
  * record the moment a user advances a step instead of recomputing the
  * funnel over the full history.
  *
  * Shape: events → watermark → `flatMapGroupsWithState` keyed on user_id.
  * Per user, state is three scalars (current step index, ts of the step
  * that got them there, funnel start ts) — NOT the event history, so state
  * size is O(active users inside the watermark horizon) regardless of
  * event volume, and `EventTimeTimeout` reclaims users whose funnel can no
  * longer advance (watermark past last step + horizon), emitting a final
  * `abandoned` record with the step they stalled at.
  *
  * Semantics vs q88 (batch): the batch form chains MIN(ts) per step over
  * the complete history; the streaming form is the greedy online
  * equivalent — it advances on the first qualifying event it processes.
  * With in-event-time-order arrival the two produce identical step
  * timestamps (FunnelStreamSpec pins a batch-vs-stream parity case);
  * under out-of-order arrival inside the watermark the greedy choice may
  * time-stamp a step later than the batch MIN — the documented, standard
  * trade of online funnel engines. Rows within a micro-batch group are
  * processed in (ts, event_type) order so results never depend on shuffle
  * arrival order.
  *
  * Repeat funnels: a completed (or abandoned) funnel's state is evicted at
  * the timeout horizon, after which the SAME user entering the first step
  * again starts a fresh funnel — each conversion cycle is reported
  * independently, the long-running-stream semantics product funnels use.
  * The q88 single-pass chaining is the within-one-horizon view
  * (FunnelPropertySpec pins that regime's exact parity).
  *
  * Reference: dust has no streaming surface (SURVEY.md §0); this extends
  * the mandated streaming operator family (SURVEY.md §2.2 B62-B67) with
  * the product-analytics sequence operator whose batch twin is q88.
  */
object FunnelStream {

  /** One row per step advance; `step` is 1-based. `abandoned` rows carry
    * the last step reached and sec_from_start of that step. */
  final case class FunnelEvent(user_id: Long, step: Int, step_name: String,
                               ts: java.sql.Timestamp, sec_from_start: Long,
                               abandoned: Boolean)

  /** (stepIdx 1-based, ts-of-that-step millis, funnel-start millis) */
  final case class FunnelState(step: Int, stepMs: Long, startMs: Long)

  /** events: streaming DataFrame with (user_id LONG, ts TIMESTAMP,
    * event_type STRING). `steps` is the ordered step list; each step must
    * occur strictly after the previous step's ts and within `horizonMs`
    * of it (the q88 contract, default 12 h).
    */
  def funnel(events: DataFrame, steps: Seq[String] = Seq("view", "click", "purchase"),
             horizonMs: Long = 12L * 3600 * 1000,
             delay: String = "10 minutes"): Dataset[FunnelEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    val horMs = horizonMs

    val typed = events
      .withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[(Long, java.sql.Timestamp, String)]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            // completed funnels were already reported step-by-step; only
            // a stalled (non-final-step) funnel emits the abandonment
            if (s.step < steps.length)
              Iterator.single(FunnelEvent(userId, s.step, steps(s.step - 1),
                new java.sql.Timestamp(s.stepMs),
                (s.stepMs - s.startMs) / 1000L, abandoned = true))
            else Iterator.empty
          } else {
            var cur = state.getOption.getOrElse(FunnelState(0, 0L, 0L))
            val out = Seq.newBuilder[FunnelEvent]
            // total order inside the batch: results are independent of
            // shuffle arrival order
            rows.toSeq.sortBy(r => (r._2.getTime, r._3)).foreach {
              case (_, ts, etype) =>
                val ms = ts.getTime
                val nextIdx = cur.step // 0-based index of the step we need
                if (nextIdx < steps.length && etype == steps(nextIdx) &&
                  (cur.step == 0 || (ms > cur.stepMs && ms <= cur.stepMs + horMs))) {
                  val startMs = if (cur.step == 0) ms else cur.startMs
                  cur = FunnelState(cur.step + 1, ms, startMs)
                  out += FunnelEvent(userId, cur.step, etype, ts,
                    (ms - startMs) / 1000L, abandoned = false)
                }
            }
            if (cur.step > 0) {
              // reclaim once the funnel can no longer advance; never set a
              // timeout behind the current watermark (the API rejects it).
              // If the horizon is ALREADY behind the watermark (a chatty
              // user emitting only non-advancing events would otherwise
              // re-arm to wm+60s forever), emit the abandonment inline and
              // drop state now — keeps the O(active users) bound honest.
              val wm = state.getCurrentWatermarkMs()
              if (cur.stepMs + horMs > wm) {
                state.update(cur)
                state.setTimeoutTimestamp(cur.stepMs + horMs)
              } else {
                state.remove()
                if (cur.step < steps.length)
                  out += FunnelEvent(userId, cur.step, steps(cur.step - 1),
                    new java.sql.Timestamp(cur.stepMs),
                    (cur.stepMs - cur.startMs) / 1000L, abandoned = true)
              }
            }
            out.result().iterator
          }
      }
  }
}
