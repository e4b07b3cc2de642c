package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timing probe (not part of the driver contract). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cols = Seq(
      ("l_quantity", true), ("l_extendedprice", true), ("l_discount", true),
      ("l_returnflag", false), ("l_linestatus", false))
    val rows = cols.map { case (c, num) =>
      val (mnN, mxN, mnS, mxS) =
        if (num) (s"CAST(MIN($c) AS DOUBLE)", s"CAST(MAX($c) AS DOUBLE)",
          "CAST(NULL AS STRING)", "CAST(NULL AS STRING)")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
          s"MIN($c)", s"MAX($c)")
      val approx =
        if (c == "l_quantity")
          s"""abs(CAST(approx_count_distinct($c, 0.02) AS DOUBLE)
             |      / COUNT(DISTINCT $c) - 1.0) <= 0.10""".stripMargin
        else "CAST(NULL AS BOOLEAN)"
      s"""SELECT '$c' AS col_name, COUNT(*) AS n,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  $mnN AS min_num, $mxN AS max_num, $mnS AS min_str, $mxS AS max_str,
         |  $approx AS approx_ok
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")
    val variant = s"$rows\nORDER BY col_name"

    val sql = if (args.nonEmpty && args(0) == "variant") variant
      else graft.ext.Extensions.all.find(_.name == "x103_profile").get.spark

    // mimic Bench: warm at sf0.01, then timed runs at sfDir
    Tables.ensure(spark, "/root/testdata/sf0.01")
    val t0 = System.nanoTime()
    Tables.sql(sql)(spark, "/root/testdata/sf0.01")
      .write.format("noop").mode("overwrite").save()
    println(f"[probe] warm sf0.01 ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    spark.catalog.clearCache()
    (1 to 3).foreach { i =>
      val t1 = System.nanoTime()
      Tables.sql(sql)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[probe] run$i sf0.1 ${(System.nanoTime() - t1) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
