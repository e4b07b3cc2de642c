package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared corpus-graph stages behind x104 (overlap matrix), x105 (host
  * PageRank) and x109 (triangle count) — the three rows that each derive
  * the same word-set-fingerprint frame and (for x105/x109) the same
  * mirror-edge set from it.
  *
  * Both stages go through [[Stages.shared]], so a session running several
  * of these operators over one corpus pays the corpus-scale derivation
  * once; each row's VALUE is unchanged (its DuckDB twin still re-derives
  * everything from raw text — the hash compare pins the equivalence).
  *
  * Scale shape (unchanged from the inlined forms): the fingerprint frame
  * is one map-only pass over `documents`; the mirror-pair stage is one
  * fp-keyed equi-join whose expansion is bounded by duplicate-group
  * sizes, collapsing to the ≤|sources|² distinct pair set. Everything
  * downstream (PageRank iterations, two-path triangle join, per-lang
  * aggregate) runs on |hosts|- or |langs|-sized data.
  *
  * Reference: dust has no graph/analytics surface of its own (SURVEY.md
  * §0; SQL is delegated, `/root/reference/db/src/db.rs:77-101`); these
  * extend the LLM-pipeline layer (SURVEY.md §2.2 B71–B73 cluster).
  */
object CorpusGraph {

  /** The x52 word-set fingerprint per document: (doc_id, lang, source,
    * fp) — fp = md5 of the sorted distinct word set, the blocking key the
    * whole x104/x105/x109 family and x52/x84 agree on. */
  def docFp(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensure(spark, dir)
    Stages.shared(spark, "docFp") {
      Stages.materialize(spark.sql(
        """SELECT doc_id, lang, source,
          |  md5(CAST(array_join(array_sort(array_distinct(
          |    array_remove(split(LOWER(text), ' '), ''))), ' ')
          |    AS BINARY)) AS fp
          |FROM documents""".stripMargin))
    }
  }

  /** Undirected distinct mirror edges between sources: (s1, s2), s1 < s2,
    * present iff the two sources serve at least one word-set-identical
    * document pair. Equal by construction to both prior inline forms —
    * x105's (doc_id-ordered join, LEAST/GREATEST, DISTINCT) and x109's
    * (source-ordered join, DISTINCT): each emits exactly the distinct
    * cross-source fp-collision pairs. */
  def mirrorPairs(spark: SparkSession, dir: String): DataFrame = {
    val fp = docFp(spark, dir)
    Stages.shared(spark, "mirrorPairs") {
      fp.createOrReplaceTempView("__graft_fp_mp")
      val out = Stages.materialize(spark.sql(
        """SELECT DISTINCT LEAST(a.source, b.source) AS s1,
          |       GREATEST(a.source, b.source) AS s2
          |FROM __graft_fp_mp a JOIN __graft_fp_mp b
          |  ON a.fp = b.fp AND a.doc_id < b.doc_id
          | AND a.source <> b.source""".stripMargin))
      spark.catalog.dropTempView("__graft_fp_mp")
      out
    }
  }

  /** x104: per-(lang, lang) duplicate pairs and distinct duplicate groups
    * — the cross-source contamination report, now reading the shared
    * fingerprint stage. */
  def overlapMatrixQuery(spark: SparkSession, dir: String): DataFrame = {
    docFp(spark, dir).createOrReplaceTempView("__graft_fp")
    spark.sql(
      """WITH p AS (SELECT LEAST(a.lang, b.lang) AS lang_a,
        |        GREATEST(a.lang, b.lang) AS lang_b, a.fp
        |      FROM __graft_fp a JOIN __graft_fp b
        |        ON a.fp = b.fp AND a.doc_id < b.doc_id)
        |SELECT lang_a, lang_b, CAST(COUNT(*) AS BIGINT) AS dup_pairs,
        |       CAST(COUNT(DISTINCT fp) AS BIGINT) AS dup_groups
        |FROM p GROUP BY lang_a, lang_b ORDER BY lang_a, lang_b""".stripMargin)
  }

  /** x109: oriented two-paths (a<b<c) over the shared mirror-edge set,
    * closed with a semi-probe back onto the edges. */
  def trianglesQuery(spark: SparkSession, dir: String): DataFrame = {
    mirrorPairs(spark, dir).createOrReplaceTempView("__graft_mirror_e")
    spark.sql(
      """WITH e AS (SELECT s1 AS u, s2 AS v FROM __graft_mirror_e),
        |t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |      FROM e e1 JOIN e e2 ON e1.v = e2.u
        |                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT a, b, c FROM t ORDER BY a, b, c""".stripMargin)
  }
}
