package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe inequality (theta/range) joins.
  *
  * Spark plans a bare `a JOIN b ON a.x < b.x` as a
  * BroadcastNestedLoopJoin: one whole side is broadcast to every executor
  * and the predicate evaluates O(n_a × n_b) times with no key parallelism —
  * the declared q12 plan, faithful to SQLite's own nested loop
  * (reference delegates the SQL surface to SQLite; `db/src/db.rs:413`
  * prepares statements verbatim) but the one declared shape that cannot
  * survive a 100× scale-up.
  *
  * [[lessThanJoin]] is the IEJoin-style band decomposition: bucket the key
  * into B quantile-free fixed-width ranges, replicate each left row to
  * every bucket its matches can live in (`explode(sequence(b_l, B-1))` —
  * ≤ B/2 copies on average), and equi-join on the bucket id. Cross-bucket
  * candidate pairs satisfy `x_l < x_r` by construction (fixed-width
  * bucketing is monotone, so bucket_l < bucket_r ⟹ x_l < x_r); only
  * intra-bucket pairs evaluate the exact predicate. The result is a
  * shuffle-keyed equi-join — partitioned by bucket across executors, AQE
  * can split skewed buckets, and neither side is broadcast whole.
  *
  * The OUTPUT of an unbounded `<` join is inherently Θ(n²) rows — no plan
  * changes that — but the candidate volume here is output + intra-bucket
  * pairs (≈ output × (1 + 2/B)), so the work is proportional to what the
  * query returns instead of to the broadcast-side cross product.
  */
object RangeJoin {

  /** Inner join of `left` and `right` on `left(lKey) < right(rKey)` as a
    * bucketed equi-join. Column names must be disjoint (pre-alias the
    * sides). NULL keys never match, as in the nested-loop plan. */
  def lessThanJoin(left: DataFrame, lKey: String,
                   right: DataFrame, rKey: String,
                   buckets: Int = 32): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // two scalars per side — the same driver-literal shape as the IVF
    // centroid fetch; never a table-sized collect
    def stats(df: DataFrame, k: String): (Option[Double], Option[Double]) = {
      val r = df.agg(min(col(k).cast("double")), max(col(k).cast("double")))
        .head()
      (Option(r.get(0)).map(_.asInstanceOf[Double]),
        Option(r.get(1)).map(_.asInstanceOf[Double]))
    }
    val (lmn, lmx) = stats(left, lKey)
    val (rmn, rmx) = stats(right, rKey)
    val mn = (lmn.toSeq ++ rmn).reduceOption(math.min(_: Double, _: Double))
      .getOrElse(0.0)
    val mx = (lmx.toSeq ++ rmx).reduceOption(math.max(_: Double, _: Double))
      .getOrElse(0.0)
    val w = math.max((mx - mn) / buckets, java.lang.Double.MIN_NORMAL)
    def bucketize(c: Column): Column =
      least(floor((c.cast("double") - lit(mn)) / lit(w)),
        lit(buckets - 1)).cast("int")
    val a = left
      .withColumn("__gb_l", bucketize(col(lKey)))
      .withColumn("__gb_k",
        explode(sequence(col("__gb_l"), lit(buckets - 1))))
    val b = right.withColumn("__gb_r", bucketize(col(rKey)))
    a.join(b, col("__gb_k") === col("__gb_r") &&
        (col("__gb_l") < col("__gb_r") || col(lKey) < col(rKey)))
      .drop("__gb_l", "__gb_k", "__gb_r")
  }
}
