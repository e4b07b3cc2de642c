package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Managed-table layouts for the 100 TB posture (SURVEY.md §4 "partition
  * pruning" row): large facts are stored hive-partitioned so that
  * time/key-range predicates prune whole directories at planning time, and
  * optionally bucketed so that repeated equi-joins on the bucket key
  * shuffle neither side.
  *
  * The testdata itself is single-file parquet (read-only); these writers
  * materialize the scaled layout into a scratch dir, and the specs prove
  * the planner actually prunes (PartitionFilters) and skips the shuffle
  * (no Exchange on bucketed joins via SortMergeJoin on pre-sorted buckets).
  */
object ManagedTables {

  /** lineitem partitioned by ship month — the layout a 100 TB fact table
    * would use (one directory per month; a date-range query touches only
    * its months). */
  def writeLineitemByMonth(spark: SparkSession, sfDir: String,
                           outDir: String): Unit = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
    li.write.mode(SaveMode.Overwrite)
      .partitionBy("ship_month")
      .parquet(outDir)
  }

  def readLineitemByMonth(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)

  /** orders bucketed by o_custkey: co-locates the customer join key so
    * repeated customer⋈orders joins avoid shuffling orders. Bucketing
    * requires saveAsTable (bucket metadata lives in the catalog). */
  def writeOrdersBucketed(spark: SparkSession, sfDir: String,
                          table: String, buckets: Int = 8): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "o_custkey")
      .sortBy("o_custkey")
      .saveAsTable(table)
  }
}
