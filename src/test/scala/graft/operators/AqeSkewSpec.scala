package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime complement to the manual
  * `SkewJoin.saltedJoin` rewrite: at cluster scale the recommended first
  * line of defense is Spark's own adaptive skew split (no query rewrite,
  * no salt column), with the manual salt kept for the cases AQE cannot
  * see (broadcast-ineligible aggregations, pre-shuffle skew). This spec
  * proves the engine's configuration surface actually engages it: a
  * hot-key join under forced thresholds must re-plan with skew-split
  * sort-merge partitions and stay value-identical to the plain join.
  */
class AqeSkewSpec extends SparkSpec {

  test("hot-key join re-plans with an AQE skew split, values unchanged") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of the fact rows share one key — the classic hot key
      val fact = spark.range(60000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id"))
          .as("k"), col("id").as("v"),
          // widen rows so the hot partition crosses the byte threshold
          concat_ws("", Seq.fill(8)(md5(col("id").cast("string"))): _*)
            .as("pad"))
      val dim = spark.range(60000).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      // no keyed aggregate downstream: OptimizeSkewedJoin declines when
      // the join's output partitioning is still required (splitting would
      // force an extra shuffle) — which is itself part of the contract
      // this spec documents
      val j = fact.join(dim, "k").agg(sum("w").as("sw"))
      // collect(), not head(): head() plans a separate limited
      // queryExecution, leaving THIS one un-executed (isFinalPlan=false)
      val n = j.collect().head.getLong(0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan"), plan.take(1000))
      assert(plan.contains("skew=true"),
        "AQE did not split the hot partition:\n" + plan.take(4000))
      // value parity with AQE off
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plainN = fact.join(dim, "k").agg(sum("w")).collect().head.getLong(0)
      assert(n == plainN)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
