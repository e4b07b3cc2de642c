package graft
import org.apache.spark.sql.SparkSession

object ProfX {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensure(spark, sfDir)
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    Seq("q19_having", "q18_tpch_q1", "q01_scan", "q38_strings").foreach { q =>
      val times = (1 to 5).map(_ => run(q))
      println(f"PROF $q first ${times.head}%.2f warm-min ${times.tail.min}%.2f")
    }
    spark.stop()
  }
}
