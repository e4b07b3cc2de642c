package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions.col

/** Bucketed co-located joins — the SURVEY §4 / 100 TB technique for
  * repeated joins on a stable key: both sides pre-hash-partitioned into
  * the same bucket count on the join key, so the sort-merge join reads
  * bucket i against bucket i with NO exchange on either side. At cluster
  * scale this is the difference between one shuffle per query and zero
  * for every query that joins on the bucketing key (the fact/dim pattern
  * of the orders/customer tables here).
  */
class BucketingSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    Tables.ensure(spark, sfDir)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    spark.table("orders").select("o_orderkey", "o_custkey", "o_totalprice")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.table("customer").select("c_custkey", "c_name")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")
  }

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    super.afterAll()
  }

  test("bucketed-bucketed equi-join plans with zero shuffle exchanges") {
    // disable broadcast so the join would otherwise need two exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name")).count()
      val exchanges = j.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the only permitted exchange is the final groupBy's — the JOIN
      // itself must consume the bucket layout directly
      assert(exchanges.size <= 1,
        s"bucketed join still shuffles:\n${j.queryExecution.executedPlan}")
      // and the result matches the unbucketed join
      val expected = spark.table("orders")
        .join(spark.table("customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name")).count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val got = j.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("single-side bucketed join shuffles only the unbucketed side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = spark.table("b_orders")
        .join(spark.table("customer").select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      val exchanges = j.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1,
        s"expected exactly one exchange (the unbucketed side):\n" +
          j.queryExecution.executedPlan)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
