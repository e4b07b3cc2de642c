package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table (SURVEY.md §2.2
  * B62-B67). The reference has no streaming layer — its closest concept is
  * the ordered Raft statement log (`DOC/DESIGN.md:49` in /root/reference);
  * these operators are the driver-mandated extension, kept behind
  * batch-checkable twins (q43/q44) so correctness stays oracle-checkable.
  *
  * Every transform takes the events DataFrame (streaming or batch — same
  * code path, which is what makes the batch twins valid oracles) and is
  * shuffle-keyed on the aggregation key, so state partitions horizontally
  * across executors at scale.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming source over a parquet events directory. */
  def readEventStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(path)

  /** B62: tumbling 1-hour windows per event type (batch twin: q43). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("v"))
      .select(col("w.start").as("h"), col("event_type"), col("n"), col("v"))

  /** B62+B65: same aggregation with a watermark — append-mode windows
    * finalize once the watermark passes; late events beyond the bound drop. */
  def tumblingCountsWatermarked(events: DataFrame,
                                delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("h"), col("event_type"), col("n"))

  /** B63: sliding windows (1 hour every 15 minutes). */
  def slidingAvg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(avg(col("value")).as("avg_v"), count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("avg_v"), col("n"))

  /** B64: session windows — events within `gap` of each other merge. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("ws"), col("w.end").as("we"),
        col("n"))

  /** B66: streaming dedup on event_id. NOTE the state caveat: with
    * `dropDuplicates(key)` a watermark only evicts state when the
    * event-time column is PART of the key — on a bare id key every seen id
    * is retained forever, which leaks at 100 TB. Kept as the exact-forever
    * semantics variant; [[dedupEventsBounded]] is the scale default. */
  def dedupEvents(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicates("event_id")

  /** B66 at scale: `dropDuplicatesWithinWatermark` — dedup on the bare id
    * key with state EVICTED once the id's first-seen event time ages past
    * the watermark. Semantics trade: an id recurring later than `delay`
    * after its first occurrence is emitted again (the standard
    * crawl/telemetry contract — duplicates arrive close together);
    * in exchange state is bounded by the watermark window, not the
    * key cardinality. */
  def dedupEventsBounded(events: DataFrame,
                         delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** B65 (stream-stream): watermarked interval join — each click joins the
    * views by the same user within the preceding hour. Both sides carry a
    * watermark and the join condition bounds the time range in BOTH
    * directions, so Spark can size each side's join state and evict rows
    * once the watermark passes (unbounded state otherwise — the
    * stream-stream analog of the no-unkeyed-window rule). Shuffle is keyed
    * on user_id; state partitions horizontally. Batch twin: the same
    * function over the static events frame (q57's as-of join is the
    * latest-only variant of this many-to-many form). */
  def clickViewJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "10 minutes")
    clicks.join(views,
      col("user_id") === col("v_user") &&
        col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("view_ts") <= col("click_ts"))
      .select(col("click_id"), col("user_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** B65 (stream-static): enrich the stream with a static dimension —
    * joins against a batch DataFrame need no watermark and no join state
    * (the static side broadcasts per micro-batch), the state-free fast
    * path to prefer whenever the right side isn't itself a stream. */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    eventKey: String, dimKey: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim),
      col(eventKey) === col(dimKey))

  final case class UserRunning(user_id: Long, events: Long, total: Double)

  /** B67: custom stateful aggregation — running per-user event count and
    * value sum via mapGroupsWithState (state lives in the state store,
    * partitioned by user_id; survives across triggers). */
  def runningUserStats(spark: SparkSession, events: DataFrame)
      : Dataset[UserRunning] = {
    import spark.implicits._
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserRunning, UserRunning](
        GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.events
          var total = prev.total
          rows.foreach { case (_, v) => n += 1; total += v }
          val next = UserRunning(uid, n, total)
          state.update(next)
          next
      }
  }
}
