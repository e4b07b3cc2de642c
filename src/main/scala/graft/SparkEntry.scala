package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Queries
import graft.ext.{Dedup, Extensions, Multimodal, Similarity}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2
  * (q01–q48 declared relational set + x49+ LLM-pipeline extensions);
  * `oracleSql` the DuckDB twin for every SQL-expressible one. The
  * hash-dependent sketch ops (MinHash-LSH, SimHash, LSH-ANN) and the
  * multimodal decode plumbing have no DuckDB twin — they get the driver's
  * rows-only check plus property tests in src/test.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1-style aggregation) on sf=0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables.ensure(spark, dir)
    spark.sql(Queries.all.find(_.name == "q18_tpch_q1").get.spark)
  }

  private val sqlBacked = Queries.all ++ Extensions.all

  /** x61: same ANN contract as x55 but scored by the native codegen'd
    * CosineSim expression instead of higher-order functions — so it shares
    * x55's DuckDB oracle. */
  private val annExprSql =
    """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
      |s AS (SELECT q.vec_id AS qid, n.vec_id AS nid,
      |        cosine_sim(q.embedding, n.embedding) AS cosim
      |      FROM embeddings n JOIN q ON q.vec_id <> n.vec_id)
      |SELECT qid, nid, CAST(CAST(ROUND(cosim, 4) AS DECIMAL(18,4)) AS DOUBLE) AS cosim, rn FROM (
      |  SELECT qid, nid, cosim,
      |         ROW_NUMBER() OVER (PARTITION BY qid
      |                            ORDER BY ROUND(cosim, 6) DESC, nid) AS rn
      |  FROM s) t
      |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sqlBacked.map(q => q.name -> Tables.sql(q.spark)).toMap ++ Map(
      // overrides the SQL-text variant in Extensions: same oracle, but the
      // unigram side runs on dictionary-encoded bitset masks (see Scaladoc)
      "x54_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.ngramJaccard(s, d)),
      "x57_minhash_lsh" -> (Dedup.minhashPairs _),
      "x58_simhash"     -> ((s: SparkSession, d: String) => Dedup.simhashPairs(s, d)),
      "x59_ann_lsh"     -> ((s: SparkSession, d: String) => Similarity.lshTopK(s, d)),
      "x60_mm_decode"   -> (Multimodal.decodeQuery _),
      "x62_ann_ivf"     -> ((s: SparkSession, d: String) => Similarity.ivfTopK(s, d)),
      "x61_ann_expr"    -> ((s: SparkSession, d: String) => {
        graft.functions.GraftFunctions.register(s)
        Tables.ensure(s, d)
        s.sql(annExprSql)
      }),
      // embedding-cosine near-dup pairs: LSH-bucketed candidates + exact
      // codegen'd verify; oracle is the brute-force threshold twin
      "x63_embed_dup" -> ((s: SparkSession, d: String) =>
        Similarity.cosineDupPairs(s, d))
    )

  private val embedDupDuck =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  CAST(CAST(ROUND(list_cosine_similarity(a.embedding, b.embedding), 4)
      |       AS DECIMAL(18,4)) AS DOUBLE) AS cosim
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
      |ORDER BY id_a, id_b""".stripMargin

  def oracleSql: Map[String, String] =
    sqlBacked.map(q => q.name -> q.duck).toMap +
      ("x61_ann_expr" ->
        Extensions.all.find(_.name == "x55_ann_topk").get.duck) +
      ("x63_embed_dup" -> embedDupDuck)
}
