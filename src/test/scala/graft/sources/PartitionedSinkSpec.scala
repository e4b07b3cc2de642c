package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** Partitioned parquet sinks + partition pruning — how a training
  * pipeline materializes its outputs (shards keyed by split/lang) and why:
  * a reader filtering on the partition column must touch only that
  * partition's files (PartitionFilters in the scan, not a post-scan
  * filter), which at 100 TB is the difference between reading one shard
  * and the whole corpus.
  */
class PartitionedSinkSpec extends SparkSpec {

  private val out = new java.io.File("target/partitioned-sink-test")

  override def beforeAll(): Unit = {
    super.beforeAll()
    org.apache.commons.io.FileUtils.deleteQuietly(out)
    Tables.ensure(spark, sfDir)
    spark.table("documents")
      .select("doc_id", "lang", "text")
      .write.partitionBy("lang").mode("overwrite")
      .parquet(out.getPath)
  }

  override def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(out)
    super.afterAll()
  }

  test("partitionBy writes one directory per key with the column elided") {
    val dirs = out.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("lang=")), dirs.toSeq)
    // the partition column must not be duplicated inside the files
    val aFile = out.listFiles().filter(_.isDirectory).head.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val inner = spark.read.parquet(aFile.getPath).columns.toSet
    assert(!inner.contains("lang"), s"lang materialized in file: $inner")
  }

  test("a filter on the partition column prunes at planning time") {
    val df = spark.read.parquet(out.getPath).filter(col("lang") === "en")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"no partition pruning in plan:\n$scan")
    // and the data round-trips exactly
    val expected = spark.table("documents").filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("dynamic partition overwrite replaces only the touched partition") {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val before = spark.read.parquet(out.getPath).count()
      val enOnly = spark.table("documents")
        .filter(col("lang") === "en")
        .select("doc_id", "lang", "text")
        .withColumn("text", org.apache.spark.sql.functions.lit("replaced"))
      enOnly.write.partitionBy("lang").mode("overwrite").parquet(out.getPath)
      val after = spark.read.parquet(out.getPath)
      assert(after.count() == before,
        "dynamic overwrite must keep the untouched partitions")
      assert(after.filter(col("lang") === "en")
        .filter(col("text") =!= "replaced").count() == 0)
      assert(after.filter(col("lang") =!= "en")
        .filter(col("text") === "replaced").count() == 0)
    } finally {
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
