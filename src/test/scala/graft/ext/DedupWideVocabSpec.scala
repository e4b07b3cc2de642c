package graft.ext

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Regression pin for the PPJoin bitset arithmetic at vocabularies wider
  * than one 64-bit mask word. The sf testdata corpus has ~31 distinct
  * words per lang, so every rank fits in mask word 0 and bit 63 is never
  * touched; an 8× vocabulary scale run surfaced two ANSI long overflows
  * in the prefix machinery (`shiftleft(1, 63) - 1` when a doc's prefix
  * boundary lands exactly on bit 63, and `-s` / `(s & -s) - 1` when a
  * shared prefix word is exactly Long.MinValue). This corpus is built so
  * a prefix boundary provably hits rank 63 and the vocabulary spans >2
  * mask words, and so exactly one qualifying pair exists.
  */
class DedupWideVocabSpec extends SparkSpec {

  test("PPJoin survives a >64-rank vocabulary with a bit-63 prefix boundary") {
    val dir = Files.createTempDirectory("graft-widevocab").toString
    val session = spark.newSession() // own temp views — suites run in parallel

    // Disjoint single-occurrence tokens: every token has df = 1, so
    // rank = position in the token sort order (ORDER BY COUNT(*), tok).
    // Exactly 62 tokens (tok001..tok062) sort before tok063, so
    // rank(tok063) = 63. The special doc holds {tok061, tok062, tok063,
    // tok071..tok078}: n = 11 distinct tokens, prefix length
    // L = n - ceil(0.8·n) + 1 = 3, prefix boundary pm = 3rd-smallest
    // rank = rank(tok063) = 63 — the overflowing corner (verified: the
    // spec fails with ARITHMETIC_OVERFLOW on the pre-fix arithmetic).
    val filler1 = (0 until 6).map { d => // tok001..tok060, 10 per doc
      val toks = (1 to 10).map(i => f"tok${d * 10 + i}%03d")
      (d.toLong, toks.mkString(" "), "en")
    }
    val special = {
      val toks = Seq("tok061", "tok062", "tok063") ++
        (71 to 78).map(i => f"tok$i%03d")
      (50L, toks.mkString(" "), "en")
    }
    val filler2 = (0 until 7).map { d => // tok080..tok149: vocab past 128
      val toks = (0 until 10).map(i => f"tok${80 + d * 10 + i}%03d")
      (60L + d, toks.mkString(" "), "en")
    }
    val disjointDocs = filler1 ++ Seq(special) ++ filler2
    // one planted duplicate pair with tokens AFTER the df=1 vocabulary in
    // rank order (df = 2 sorts later): word-set-equal ⇒ must be the only
    // pair out, j1 = 1.0, and its ranks land in mask words ≥ 2
    val dupToks = (1 to 22).map(i => f"zz$i%03d").mkString(" ")
    val docs = disjointDocs ++ Seq((100L, dupToks, "en"), (101L, dupToks, "en"))

    import session.implicits._
    docs.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.names.filterNot(_ == "documents").foreach { n =>
      session.range(1).select(col("id"))
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }

    val out = Dedup.ngramJaccard(session, dir) // throws on the old arithmetic
      .select("doc_a", "doc_b", "j1").collect()
    assert(out.length === 1, out.mkString(", "))
    assert(out.head.getLong(0) === 100L && out.head.getLong(1) === 101L)
    assert(out.head.getDouble(2) === 1.0)
  }
}
