package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque media payloads as `binary` columns
  * with typed metadata (driver mandate; no media libraries ship in this
  * container, so the *decode* step is a clearly-marked deterministic stub,
  * while the Spark-side plumbing — schema, encoders, partition-wise batch
  * processing — is real and tested).
  *
  * The Scala-idiomatic analog of `mapInPandas` is `Dataset.mapPartitions`
  * with case-class Encoders: one JVM call per partition iterator, so a real
  * decoder (JNI/FFM image lib) would amortize per-batch setup exactly like
  * an Arrow batch UDF. At 100 TB the payload column stays columnar parquet
  * (binary), scanned once, never collected.
  */
object Multimodal {

  /** Fake "media" payload: magic ++ big-endian w/h ++ content bytes. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Typed decode output (what a real image decoder would yield). */
  final case class MediaMeta(doc_id: Long, format: String, width: Int,
                             height: Int, n_bytes: Long, checksum: Long)

  private val Magic = "IMG1".getBytes("UTF-8")

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Deterministic fake encoder: derives a payload per document (header +
    * text bytes). Stands in for reading real image bytes from storage. */
  def fakeEncode(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.ensure(spark, dir)
    spark.table("documents").select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val w = 64 + (id % 16).toInt * 32   // deterministic fake dimensions
        val h = 64 + (id % 9).toInt * 32
        MediaRow(id, Magic ++ be32(w) ++ be32(h) ++ text.getBytes("UTF-8"))
      }
  }

  /** Partition-wise "decode": parses the header and computes content stats.
    * STUB — a real implementation would hand `payload` to an image codec
    * here; everything around it (batching, schema, encoders) is the real
    * production shape. */
  def decodeMeta(ds: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition setup would init the codec once here
      it.map { r =>
        val ok = r.payload.length >= 12 &&
          r.payload.startsWith(Magic)
        val fmt = if (ok) "img1" else "unknown"
        val w = if (ok) readBe32(r.payload, 4) else 0
        val h = if (ok) readBe32(r.payload, 8) else 0
        // checksum stands in for decoded-pixel stats; deterministic. The
        // polynomial hash is MODULAR (1e9+7) so the value is reproducible
        // in engines with checked BIGINT arithmetic (DuckDB throws on
        // overflow where the JVM wraps) — which is what lets the x60
        // driver row carry a closed-form DuckDB oracle.
        val sum = r.payload.drop(12)
          .foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
        MediaMeta(r.doc_id, fmt, w, h, r.payload.length.toLong, sum)
      }
    }
  }

  /** Driver-facing query: encode → decode → typed metadata table. */
  def decodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(fakeEncode(spark, dir)).toDF().orderBy("doc_id")

  /** Frame-sampling plumbing: split a payload into fixed-size "frames" and
    * keep every `stride`-th — the batch shape of video frame extraction. */
  def sampleFrames(ds: Dataset[MediaRow], frameBytes: Int = 32,
                   stride: Int = 4): DataFrame = {
    val df = ds.toDF()
    df.select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, int(floor(octet_length(payload) / $frameBytes)) - 1),
             |  i -> substring(payload, i * $frameBytes + 1, $frameBytes))""".stripMargin)))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")
      .filter(pmod(col("frame_no"), lit(stride)) === 0)
  }

  /** x77 driver row: encode → frame-sample → per-frame byte stats. The
    * whole fake payload is a closed-form function of documents.text, so a
    * DuckDB twin rebuilds the byte list and re-derives every sampled
    * frame's sum — the oracle pins the frame boundaries, the stride
    * filter, AND the payload bytes end-to-end. The explode is map-side
    * (linear in payload bytes, full frames only — min corpus payload is
    * 56 bytes so every doc emits ≥1 frame); the per-frame reduction runs
    * in a typed mapPartitions, the same batch shape a real frame decoder
    * would use. */
  def frameQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sampleFrames(fakeEncode(spark, dir))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions(_.map { case (id, fno, frame) =>
        (id, fno, frame.length, frame.foldLeft(0L)((a, b) => a + (b & 0xff)))
      })
      .toDF("doc_id", "frame_no", "frame_len", "byte_sum")
      .select(col("doc_id"), col("frame_no"),
        col("frame_len").cast("int").as("frame_len"), col("byte_sum"))
      .orderBy("doc_id", "frame_no")
  }
}
