package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed LEFT as-of join: for every left row, attach the single
  * latest right row whose `ts` <= the left row's `ts` within the same `key`
  * group (the classic event-stream "most recent state at event time" join
  * Spark has no built-in operator for).
  *
  * Formulation: tag both sides, union, ONE window pass per key ordered by
  * (ts, side, tie), take the running `last` non-null right payload, keep
  * left rows. Both inputs shuffle exactly once on the join key and sort
  * within partitions — no range join, no per-row probe, no BNLJ. That is
  * the 100 TB-safe shape: cost is one hash shuffle of each input plus a
  * partition-local sort; a time-range-bucketed variant only wins when the
  * right side is so much larger that sorting it is the bottleneck, and AQE
  * handles moderate key skew (salting slots in front of the union if one
  * key dominates).
  *
  * Determinism: right rows simultaneous at (key, ts) are ordered by
  * `tieBreak` ascending and the LAST one wins (i.e. the largest tie value)
  * — required for oracle hash-comparison and for reproducible pipelines.
  * The right payload travels as ONE struct so all its fields come from the
  * SAME matched row even if some payload fields are null.
  *
  * At equal timestamps the right row sorts BEFORE the left row (side 0 <
  * 1), so the match is inclusive (`<=`), matching SQL ASOF semantics.
  */
object AsOfJoin {

  /** @param key          equi-join key present in both inputs
    * @param ts           event-time column present in both inputs
    * @param rightPayload right columns carried onto left rows (must not
    *                     collide with left column names)
    * @param tieBreak     one of `rightPayload`; largest value wins among
    *                     right rows tied on (key, ts)
    * @param tolerance    optional max lookback as a SQL expression for the
    *                     ts delta (`"INTERVAL 1 HOUR"` for timestamps, a
    *                     number for numeric ts): a match older than
    *                     `left.ts - tolerance` null-extends instead.
    *                     Correct with the single running-last pass because
    *                     the match IS the newest right row ≤ ts — if it is
    *                     too old, every other candidate is older still. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightPayload: Seq[String], tieBreak: String,
           tolerance: Option[String] = None): DataFrame = {
    require(rightPayload.contains(tieBreak),
      s"tieBreak '$tieBreak' must be one of rightPayload")
    require(!rightPayload.exists(left.columns.contains),
      "rightPayload column names must not collide with left columns")
    val l = left.withColumn("__side", lit(1))
    // the right ts rides inside the payload struct so the tolerance check
    // reads the MATCHED row's ts, not the left row's
    val r = right.select(col(key), col(ts),
        struct(col(ts).as("__rts") +: rightPayload.map(col): _*).as("__p"))
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc,
        col("__p").getField(tieBreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("__p"), ignoreNulls = true).over(w)
    val gated = tolerance match {
      case Some(tol) => when(
        col("__m").getField("__rts") >= col(ts) - expr(tol), col("__m"))
      case None => col("__m")
    }
    u.withColumn("__m", matched)
      .filter(col("__side") === 1)
      .withColumn("__m", gated)
      .select(left.columns.map(col).toSeq ++
        rightPayload.map(c => col(s"__m.$c").as(c)): _*)
  }
}
