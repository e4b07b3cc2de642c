package graft

import org.apache.spark.sql.SparkSession

import graft.command.{Request, Statement}
import graft.engine.GraftDb

/** Micro-benchmark for the engine envelope's single-row INSERT path — the
  * one throughput figure the reference publishes (10–200+ ops/sec with
  * statement replication over its consensus log; reference `README.md:27`).
  *
  * The comparable operation here is: one `execute` request = durable
  * journal append (the consensus-log analog, append-before-apply) +
  * in-memory apply, with a columnar snapshot checkpoint every 64 batches
  * rolled into the sustained rate. Also reports the batched path
  * (1000 rows/request) — the shape a Spark-native pipeline would actually
  * use for bulk loads.
  *
  * Prints ONE JSON line:
  * {"single_ops_sec":N,"batched_rows_sec":N,"n_single":N,"n_batched":N}
  */
object OltpBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nSingle = args.headOption.flatMap(_.toIntOption).getOrElse(1000)
    val nBatched = 10000

    val dir = java.nio.file.Files.createTempDirectory("graft-oltp").toString
    val db = GraftDb.open(spark, s"$dir/bench.db").fold(sys.error, identity)
    db.executeStringStmt(
      "CREATE TABLE kv (id INTEGER PRIMARY KEY, v TEXT)")

    // warm the path (JIT) outside the timed window
    (1 to 50).foreach { i =>
      db.execute(Request(transaction = false,
        Seq(Statement(s"INSERT INTO kv VALUES (${-i}, 'warm')"))))
    }

    val t0 = System.nanoTime()
    (1 to nSingle).foreach { i =>
      db.execute(Request(transaction = false,
        Seq(Statement(s"INSERT INTO kv VALUES ($i, 'row $i')")))) match {
        case Left(e) => sys.error(s"insert $i failed: $e")
        case Right(_) =>
      }
    }
    val singleSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    var next = nSingle + 1
    while (next <= nSingle + nBatched) {
      val stmts = (next until math.min(next + 1000, nSingle + nBatched + 1))
        .map(i => Statement(s"INSERT INTO kv VALUES ($i, 'row $i')"))
      db.execute(Request(transaction = true, stmts)) match {
        case Left(e) => sys.error(s"batch at $next failed: $e")
        case Right(_) =>
      }
      next += stmts.size
    }
    val batchedSec = (System.nanoTime() - t1) / 1e9

    db.close()
    println(
      s"""{"single_ops_sec":${(nSingle / singleSec).round},""" +
      s""""batched_rows_sec":${(nBatched / batchedSec).round},""" +
      s""""n_single":$nSingle,"n_batched":$nBatched}""")
    spark.stop()
  }
}
