package graft.streaming

import graft.SparkSpec
import graft.engine.GraftDb
import graft.command.Value
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming ingest → journal bridge (VERDICT r11 #6): micro-batches
  * land in the statement journal as stamped transactions, survive crash
  * replay, and stay exactly-once under Structured Streaming's
  * re-delivery. */
class JournalIngestSpec extends SparkSpec {

  private def ok(db: GraftDb, sql: String): Unit = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
  }

  private def longOf(db: GraftDb, sql: String): Long =
    db.queryStringStmt(sql).fold(e => fail(e), _.head.values)
      .head.head.asInstanceOf[Value.Integer].v

  private def openDisk(dir: java.nio.file.Path): GraftDb =
    GraftDb.open(spark, dir.resolve("db").toString, 500)
      .fold(e => fail(e), identity)

  test("streamed micro-batches land in the table via the journal") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ji-")
    val db = openDisk(dir)
    ok(db, "CREATE TABLE ev (k INTEGER, tag TEXT)")
    val mem = MemoryStream[(Long, String)]
    val q = JournalIngest.start(db, mem.toDF().toDF("k", "tag"), "ev",
      dir.resolve("ckpt").toString)
    mem.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
    mem.addData((3L, "c")); q.processAllAvailable()
    q.stop()
    assert(longOf(db, "SELECT COUNT(*) FROM ev") == 3L)
    assert(longOf(db, "SELECT SUM(k) FROM ev") == 6L)
    assert(db.streamBatchWatermark >= 1L)

    // crash WITHOUT a checkpoint: journal replay must reproduce the
    // streamed state AND the exactly-once watermark
    val wm = db.streamBatchWatermark
    db.close()
    val db2 = openDisk(dir)
    assert(longOf(db2, "SELECT COUNT(*) FROM ev") == 3L)
    assert(longOf(db2, "SELECT SUM(k) FROM ev") == 6L)
    assert(db2.streamBatchWatermark == wm,
      "journal replay must restore the stream watermark")
    // a re-delivered (already-stamped) batch is a no-op after recovery
    assert(db2.ingestBatch("ev", wm, Seq(Seq(99L, "dup"))) == Right(0L))
    assert(longOf(db2, "SELECT COUNT(*) FROM ev") == 3L)
    // and genuinely new batches keep flowing
    assert(db2.ingestBatch("ev", wm + 1, Seq(Seq(4L, "d"))) == Right(1L))
    assert(longOf(db2, "SELECT SUM(k) FROM ev") == 10L)
    db2.close()
  }

  test("exactly-once across a forced batch re-delivery") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ji-")
    val db = openDisk(dir)
    ok(db, "CREATE TABLE ev (k INTEGER, tag TEXT)")
    val batch = Seq((10L, "x"), (11L, "y")).toDF("k", "tag")
    JournalIngest.ingest(db, "ev", 0L, batch)
    // Structured Streaming re-runs the last foreachBatch after a restart
    // it cannot prove committed — the second delivery must be a no-op
    JournalIngest.ingest(db, "ev", 0L, batch)
    assert(longOf(db, "SELECT COUNT(*) FROM ev") == 2L)
    JournalIngest.ingest(db, "ev", 1L, Seq((12L, "z")).toDF("k", "tag"))
    assert(longOf(db, "SELECT COUNT(*) FROM ev") == 3L)
    db.close()
  }

  test("watermark survives the manifest checkpoint path (journal truncated)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ji-")
    val db = openDisk(dir)
    ok(db, "CREATE TABLE ev (k INTEGER, tag TEXT)")
    assert(db.ingestBatch("ev", 7L, Seq(Seq(1L, "a"))) == Right(1L))
    db.checkpoint().fold(e => fail(e), identity) // journal truncated
    db.close()
    val db2 = openDisk(dir)
    assert(db2.streamBatchWatermark == 7L,
      "manifest must carry the watermark once the journal is truncated")
    assert(db2.ingestBatch("ev", 7L, Seq(Seq(2L, "dup"))) == Right(0L))
    assert(db2.ingestBatch("ev", 8L, Seq(Seq(3L, "b"))) == Right(1L))
    assert(longOf(db2, "SELECT COUNT(*) FROM ev") == 2L)
    db2.close()
  }

  test("a failing batch does not advance the watermark (retry applies)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ji-")
    val db = openDisk(dir)
    ok(db, "CREATE TABLE ev (k INTEGER NOT NULL, tag TEXT)")
    assert(db.ingestBatch("ev", 0L, Seq(Seq(null, "bad"))).isLeft)
    assert(db.streamBatchWatermark == -1L)
    assert(longOf(db, "SELECT COUNT(*) FROM ev") == 0L)
    // the (corrected) retry of the same batch id applies
    assert(db.ingestBatch("ev", 0L, Seq(Seq(1L, "good"))) == Right(1L))
    assert(longOf(db, "SELECT COUNT(*) FROM ev") == 1L)
    db.close()
  }
}
