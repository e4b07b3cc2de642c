package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** Runtime (bloom-filter) join pruning — Catalyst injects a bloom filter
  * built from the selective dimension side into the fact-side scan, so
  * fact rows that cannot match die before the shuffle. At 100 TB this is
  * the difference between shuffling the full fact table and shuffling the
  * matching fraction; here we force the thresholds down so the injection
  * is observable at test scale and pin both the plan and result parity.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim join injects a bloom filter on the fact side") {
    Tables.ensure(spark, sfDir)
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // broadcast would sidestep the shuffle we want to prune
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = spark.table("orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val fact = spark.table("lineitem").select("l_orderkey", "l_quantity")
      val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter injected:\n$optimized")
      // parity with the unfiltered plan
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        "false")
      val expected = fact
        .join(dim, col("l_orderkey") === col("o_orderkey")).count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        "true")
      assert(j.count() == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
