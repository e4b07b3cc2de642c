package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves the scale-layout claims at the plan level: partition pruning
  * actually prunes, bucketed joins actually skip the big-side shuffle.
  */
class ManagedTablesSpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("managed").toString

  test("month-partitioned lineitem prunes partitions for date ranges") {
    ManagedTables.writeLineitemByMonth(spark, sfDir, s"$tmp/li")
    val df = ManagedTables.readLineitemByMonth(spark, s"$tmp/li")
    val months = df.select("ship_month").distinct()
      .orderBy("ship_month").collect().map(_.getString(0))
    assert(months.length > 1, "need multiple partitions for the pruning test")
    val m = months.head
    val q = df.filter(col("ship_month") === m).agg(sum("l_quantity"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains(s"ship_month"), plan)
    // correctness against the unpartitioned source
    val expect = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(date_format(col("l_shipdate"), "yyyy-MM") === m)
      .agg(sum("l_quantity")).head.getDouble(0)
    assert(q.head.getDouble(0) == expect)
  }

  test("bucketed orders join reads buckets and skips the big-side shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      ManagedTables.writeOrdersBucketed(spark, sfDir, "orders_bucketed")
      val o = spark.table("orders_bucketed")
      val c = spark.read.parquet(s"$sfDir/customer.parquet")
        .groupBy("c_custkey").agg(max("c_acctbal").as("bal"))
      val j = o.join(c, o("o_custkey") === c("c_custkey"))
        .agg(count(lit(1)))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan)
      // the bucketed scan branch must reach the join without an Exchange:
      // walk up from the bucketed FileScan line; the first structural
      // operator above it on that branch is Sort/Filter, never Exchange
      val lines = plan.linesIterator.toVector
      val scanIdx = lines.indexWhere(_.contains("orders_bucketed"))
      assert(scanIdx > 0, plan)
      val branchAbove = lines.slice(scanIdx - 3, scanIdx).mkString("\n")
      assert(!branchAbove.contains("Exchange"),
        s"bucketed side re-shuffled:\n$plan")
      assert(j.head.getLong(0) > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    }
  }

  test("compaction collapses write shrapnel to one file per partition") {
    val dir = s"$tmp/li_frag"
    // produce a fragmented layout: high write parallelism over a
    // partitioned table → many files per partition
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .repartition(16)
      .write.partitionBy("ship_month").parquet(dir)
    val pre = spark.read.parquet(dir)
    val preRows = pre.count()
    val preSum = pre.agg(sum("l_quantity")).head.getDouble(0)
    val nParts = pre.select("ship_month").distinct().count()
    val (before, after) =
      ManagedTables.compact(spark, dir, "ship_month")
    assert(before > nParts,
      s"fixture not fragmented: $before files over $nParts partitions")
    assert(after == nParts,
      s"expected exactly one file per partition, got $after for $nParts")
    // content identical through the swap
    val post = spark.read.parquet(dir)
    assert(post.count() == preRows)
    assert(post.agg(sum("l_quantity")).head.getDouble(0) == preSum)
    // pruning still works on the compacted layout
    val m = post.select("ship_month").distinct().orderBy("ship_month")
      .head.getString(0)
    val plan = post.filter(col("ship_month") === m)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }
}
