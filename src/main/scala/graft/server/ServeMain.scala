package graft.server

import graft.engine.GraftDb
import org.apache.spark.sql.SparkSession

/** Standalone server entrypoint: `runMain graft.server.ServeMain [port]
  * [dbDir]` — dbDir omitted = in-memory (the reference's default mode). */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(4001)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val db = args.lift(1) match {
      case Some(dir) => GraftDb.open(spark, dir).fold(e => sys.error(e), identity)
      case None => GraftDb.openInMemory(spark)
    }
    val api = new HttpApi(db, port,
      cluster = Some(new graft.engine.SparkClusterControl(spark)))
    api.start()
    println(s"graft-serve listening on :${api.listeningPort}")
    Thread.currentThread().join()
  }
}
