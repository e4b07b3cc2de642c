package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class Doc(doc_id: Long, ts: Timestamp, text: String)

/** Streaming MinHash near-duplicate suppression (NearDupStream). */
class NearDupStreamSpec extends SparkSpec {

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while seven wizards brew strange potions in the tall dark tower"
  private val reordered = "dog lazy the over jumps fox brown quick the " +
    "tower dark tall the in potions strange brew wizards seven while"
  private val unrelated = "completely different subject matter entirely " +
    "about databases indexes transactions and query optimizers at scale"

  test("near-copy is suppressed, first occurrence and unrelated doc are not") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = NearDupStream.nearDupSuppress(mem.toDF())
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    // batch 1: the original + an unrelated doc
    mem.addData(Doc(1, t(0), base), Doc(2, t(1), unrelated))
    q.processAllAvailable()
    // batch 2 (state must persist across triggers): an exact word-set
    // copy (reordered words — est_j = 1.0 by construction) + a fresh doc
    mem.addData(Doc(3, t(2), reordered), Doc(4, t(3), unrelated + " extra"))
    q.processAllAvailable()
    val hits = spark.table("neardup").as[NearDupStream.NearDupHit]
      .collect().toSeq
    q.stop()
    val byDoc = hits.groupBy(_.doc_id)
    assert(!byDoc.contains(1L), "first occurrence must not be flagged")
    assert(!byDoc.contains(2L), "unrelated doc must not be flagged")
    assert(byDoc.contains(3L), "word-set copy must be flagged in >=1 band")
    assert(byDoc(3L).forall(h => h.dup_of == 1L && h.est_j == 1.0),
      s"doc 3 must collapse onto representative 1: ${byDoc(3L)}")
  }

  test("representatives only in state: a copy of a copy still maps to the original") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = NearDupStream.nearDupSuppress(mem.toDF())
      .writeStream.format("memory").queryName("neardup2")
      .outputMode("append").start()
    mem.addData(Doc(10, t(0), base))
    q.processAllAvailable()
    mem.addData(Doc(11, t(1), reordered))
    q.processAllAvailable()
    mem.addData(Doc(12, t(2), base)) // copy arriving after the copy
    q.processAllAvailable()
    val hits = spark.table("neardup2").as[NearDupStream.NearDupHit]
      .collect().toSeq
    q.stop()
    assert(hits.nonEmpty)
    assert(hits.forall(_.dup_of == 10L),
      s"every hit must name the stored representative (10): $hits")
    assert(hits.map(_.doc_id).toSet == Set(11L, 12L))
  }

  test("within one micro-batch, arrival order is (ts, doc_id) deterministic") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = NearDupStream.nearDupSuppress(mem.toDF())
      .writeStream.format("memory").queryName("neardup3")
      .outputMode("append").start()
    // both docs in the SAME batch: the earlier ts must win representative
    mem.addData(Doc(21, t(5), reordered), Doc(20, t(4), base))
    q.processAllAvailable()
    val hits = spark.table("neardup3").as[NearDupStream.NearDupHit]
      .collect().toSeq
    q.stop()
    assert(hits.nonEmpty && hits.forall(h => h.doc_id == 21L && h.dup_of == 20L),
      s"doc 20 (earlier ts) must be the representative: $hits")
  }
}
