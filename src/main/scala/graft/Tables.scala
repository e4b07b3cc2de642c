package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registers the driver testdata parquet tables as temp views.
  *
  * Mirrors the reference's catalog seam: dust opens one SQLite database and
  * every statement resolves tables in it (reference `db/src/db.rs:77-101`).
  * Here "the database" is a directory of parquet tables registered as views;
  * Catalyst resolves them, and the parquet source gives predicate pushdown +
  * column pruning for free (verified in QueriesSpec via explain()).
  *
  * At 100 TB these would be bucketed/partitioned managed tables; the view
  * registration is idempotent and cached per (session, dir) so per-query
  * overhead is one conf lookup.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val RegisteredKey = "graft.registered.dir"

  /** Register all testdata views for `dir` (idempotent).
    *
    * events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects by default; we read it as a long (nanosAsLong) and
    * rebuild a microsecond TimestampType column with integer division (a
    * double division would lose precision above 2^53 ns).
    */
  def ensure(spark: SparkSession, dir: String): Unit = synchronized {
    if (!spark.conf.getOption(RegisteredKey).contains(dir)) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      names.foreach { n =>
        val raw = spark.read.parquet(s"$dir/$n.parquet")
        val df =
          if (n == "events")
            raw.withColumn("ts",
              org.apache.spark.sql.functions.timestamp_micros(
                org.apache.spark.sql.functions.expr("ts div 1000")))
          else raw
        df.createOrReplaceTempView(n)
      }
      spark.conf.set(RegisteredKey, dir)
    }
  }

  /** Lift a SQL text into the driver's (session, sfDir) => DataFrame shape. */
  def sql(q: String): (SparkSession, String) => DataFrame =
    (spark, dir) => { ensure(spark, dir); spark.sql(q) }
}
