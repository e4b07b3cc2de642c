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

  /** Small-file compaction (the OPTIMIZE pass of every lakehouse): rewrite
    * a partitioned parquet directory so each hive partition carries
    * `filesPerPartition` files instead of the write-parallelism shrapnel
    * a streaming/micro-batch producer leaves behind. At 100 TB the
    * small-file problem is a planning-time cost (one parquet footer fetch
    * and one task per file — a million 1 MB files is a million tasks);
    * compaction restores `maxPartitionBytes`-sized splits.
    *
    * The rewrite stages into `<dir>.__compact` and swaps via two renames —
    * the crash window leaves either the old or the staged directory
    * intact, never a half state (same swap discipline as the engine's
    * manifest checkpoint, `engine/GraftDb` §7.4).
    *
    * Returns (filesBefore, filesAfter) for the caller's audit.
    */
  def compact(spark: SparkSession, dir: String, partitionCol: String,
              filesPerPartition: Int = 1): (Long, Long) = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    def countFiles(p: String): Long = {
      val root = Paths.get(p)
      if (!Files.exists(root)) 0L
      else {
        val s = Files.walk(root)
        try s.filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet")).count()
        finally s.close()
      }
    }
    val before = countFiles(dir)
    val staged = dir + ".__compact"
    val old = dir + ".__old"
    val df = spark.read.parquet(dir)
    // hash-repartition on (partition column [, salt]) so each hive
    // partition's rows land in exactly filesPerPartition tasks — without
    // this, every task holding rows of a partition writes its own file
    // there. The salt is a deterministic row hash, so the layout is
    // reproducible.
    val keys =
      if (filesPerPartition <= 1) Seq(col(partitionCol))
      else Seq(col(partitionCol),
        pmod(xxhash64(struct(df.columns.map(col): _*)),
          lit(filesPerPartition.toLong)))
    df.repartition(keys: _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(staged)
    Files.move(Paths.get(dir), Paths.get(old),
      StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(staged), Paths.get(dir),
      StandardCopyOption.ATOMIC_MOVE)
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmTree))
      f.delete(): Unit
    }
    rmTree(new java.io.File(old))
    (before, countFiles(dir))
  }
}
