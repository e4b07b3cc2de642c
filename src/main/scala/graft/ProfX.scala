package graft
import org.apache.spark.sql.SparkSession
import graft.ext.Dedup

object ProfX {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensure(spark, sfDir)
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $tag ${(System.nanoTime()-t0)/1e9}%.2f s -> $r")
    }
    (1 to 3).foreach { i =>
      time(s"x54_run$i") {
        Dedup.ngramJaccard(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
