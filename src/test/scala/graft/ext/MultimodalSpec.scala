package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The multimodal plumbing is real even though the codec is a stub: schema,
  * encoders, partition-wise batches, deterministic output. */
class MultimodalSpec extends SparkSpec {

  test("decode recovers header fields deterministically") {
    val out = Multimodal.decodeQuery(spark, sfDir)
    val rows = out.limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("format") == "img1")
      assert(r.getAs[Int]("width") == 64 + (id % 16).toInt * 32)
      assert(r.getAs[Int]("height") == 64 + (id % 9).toInt * 32)
      assert(r.getAs[Long]("n_bytes") > 12L)
    }
  }

  test("decode output schema is the typed MediaMeta shape") {
    val out = Multimodal.decodeQuery(spark, sfDir)
    assert(out.columns.toSeq ==
      Seq("doc_id", "format", "width", "height", "n_bytes", "checksum"))
  }

  test("frame sampling keeps every stride-th fixed-size frame") {
    val ds = Multimodal.fakeEncode(spark, sfDir)
    val frames = Multimodal.sampleFrames(ds, frameBytes = 32, stride = 4)
    val r = frames.filter(col("doc_id") === 0).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Int]("frame_no") % 4 == 0)
      assert(row.getAs[Array[Byte]]("frame").length == 32)
    }
  }

  test("corrupt payload degrades to unknown format, not a crash") {
    import spark.implicits._
    val bad = Seq(Multimodal.MediaRow(99L, Array[Byte](1, 2, 3))).toDS()
    val out = Multimodal.decodeMeta(bad).collect()
    assert(out.head.format == "unknown")
    assert(out.head.width == 0)
  }
}
