package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Scale-safe interval OVERLAP self-join.
  *
  * The declared shape — every pair of same-key rows whose `[ts, ts+D)`
  * windows overlap — is a theta join (`|t_a − t_b| < D`), which Spark
  * plans as a BroadcastNestedLoopJoin: the q12 problem with a time
  * predicate. The scale-safe plan is the q56 banding idea on the time
  * axis: bucket time into fixed windows of width D, replicate the
  * smaller-id side of each candidate pair to the three buckets any
  * overlap partner's START can occupy (`b−1, b, b+1` — t_b ∈
  * (t_a−D, t_a+D) ⟹ bucket(t_b) ∈ [b−1, b+1]), anchor the other side at
  * its own start bucket, and equi-join on (key, bucket). Each qualifying
  * pair meets in EXACTLY one bucket — the anchored row appears once, the
  * exploded side at most once per bucket — so there is no DISTINCT pass;
  * the exact `|Δt| < D` predicate then filters intra-bucket false
  * candidates.
  *
  * Cost: 3× replication of one side, one shuffle keyed on (key, bucket)
  * with AQE-splittable skew, work proportional to candidates ≈ output.
  * The output itself is inherently quadratic in per-key-per-window
  * density — no plan changes that.
  *
  * Reference: dust delegates joins to SQLite's nested loop verbatim
  * (`db/src/db.rs:413` prepares statements as-is); this operator exists
  * because that declared shape cannot survive a 100× scale-up — the same
  * argument as [[RangeJoin]].
  */
object IntervalJoin {

  /** Pairs (id_a < id_b) of `df` rows sharing `key` whose
    * `[ts, ts + durationSec)` intervals overlap. `ts` must be a
    * TimestampType column. Output: key, id_a, id_b. */
  def overlapSelfJoin(df: DataFrame, key: String, ts: String, id: String,
                      durationSec: Long): DataFrame = {
    require(durationSec > 0, "durationSec must be positive")
    val w = durationSec * 1000000L // bucket width in microseconds
    def us(c: Column): Column = unix_micros(c)
    val base = df.select(col(key).as("__k"), col(id).as("__id"),
      us(col(ts)).as("__us"))
    val left = base
      .withColumn("__b0", expr(s"__us div ${w}L"))
      .withColumn("__b", explode(expr("sequence(__b0 - 1, __b0 + 1)")))
      .select(col("__k").as("__ka"), col("__id").as("__ida"),
        col("__us").as("__usa"), col("__b"))
    val right = base
      .withColumn("__b", expr(s"__us div ${w}L"))
      .select(col("__k").as("__kb"), col("__id").as("__idb"),
        col("__us").as("__usb"), col("__b").as("__bb"))
    left.join(right,
        col("__ka") === col("__kb") && col("__b") === col("__bb") &&
          col("__ida") < col("__idb") &&
          abs(col("__usa") - col("__usb")) < lit(w))
      .select(col("__ka").as(key), col("__ida").as("id_a"),
        col("__idb").as("id_b"))
  }
}
