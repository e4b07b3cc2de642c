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

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sqlBacked.map(q => q.name -> Tables.sql(q.spark)).toMap ++ Map(
      "x57_minhash_lsh" -> (Dedup.minhashPairs _),
      "x58_simhash"     -> ((s: SparkSession, d: String) => Dedup.simhashPairs(s, d)),
      "x59_ann_lsh"     -> ((s: SparkSession, d: String) => Similarity.lshTopK(s, d)),
      "x60_mm_decode"   -> (Multimodal.decodeQuery _)
    )

  def oracleSql: Map[String, String] =
    sqlBacked.map(q => q.name -> q.duck).toMap
}
