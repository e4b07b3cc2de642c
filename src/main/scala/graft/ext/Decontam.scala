package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Bloom-prefiltered benchmark decontamination (x95).
  *
  * Same contract as the x76 exact 3-gram decontamination join — flag every
  * training doc that shares a word 3-gram with the held-out benchmark slice
  * (doc_id % 97 = 0) and report how many distinct grams leak — but with the
  * scale-critical physical difference: the training-side gram stream is
  * pruned MAP-SIDE by a Bloom sketch of the benchmark grams before any
  * shuffle happens.
  *
  * This is Spark's own runtime-join-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the expressions
  * `InjectRuntimeFilter` plans for shuffle-join pruning) driven explicitly:
  *
  *  1. benchmark grams → `bloom_filter_agg(xxhash64(gram))` — one sketch,
  *     computed in a single pass and carried as an uncorrelated scalar
  *     subquery (Spark broadcasts the bytes to every task);
  *  2. training grams → `WHERE might_contain(sketch, xxhash64(gram))` —
  *     a codegen'd map-side filter. No false negatives by construction, so
  *     no leaked gram is ever dropped; false positives merely survive to
  *     step 3;
  *  3. surviving candidates → the exact equi-join + per-doc aggregate of
  *     x76, which removes Bloom false positives. The final answer is
  *     therefore EXACTLY the x76 result — deterministic despite the
  *     hash-based sketch — and the row shares x76's DuckDB twin.
  *
  * 100 TB posture: the benchmark side is tiny and fixed (a sketch of it is
  * a few MB regardless of corpus size); the training corpus dominates. The
  * sketch cuts the shuffled gram volume from "every distinct gram in the
  * corpus" to "grams that (probably) leak", typically orders of magnitude,
  * before the join's exchange — the same reason Spark injects these
  * filters into shuffle joins at all. The explode itself stays map-local.
  *
  * Reference: dust has no analytics surface (SURVEY.md §0); this extends
  * the engine's LLM-pipeline layer (SURVEY.md §2.2 B71-B73 cluster).
  */
object Decontam {

  /** Spark side of x95 (duck twin = x76's — the result is value-identical
    * by the no-false-negatives argument above). est_items 1<<17 covers the
    * benchmark gram cardinality at every test SF with a single-digit-MB
    * sketch; at production scale it is sized from the benchmark set, which
    * does not grow with the corpus.
    */
  def bloomDecontamQuery(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.ensure(spark, dir)
    spark.sql(
      """WITH toks AS (SELECT doc_id, array_remove(split(LOWER(text), ' '), '') AS tk
        |              FROM documents),
        |g AS (SELECT doc_id, gram FROM (
        |        SELECT doc_id, explode(array_distinct(word_ngrams(tk, 3))) AS gram
        |        FROM toks WHERE size(tk) >= 3)),
        |bg AS (SELECT gram, doc_id AS bench_id FROM g WHERE doc_id % 97 = 0),
        |bf AS (SELECT bloom_filter_agg(xxhash64(gram), CAST(131072 AS BIGINT)) AS f
        |       FROM (SELECT DISTINCT gram FROM bg)),
        |cand AS (SELECT doc_id, gram FROM g
        |         WHERE doc_id % 97 <> 0
        |           AND might_contain((SELECT f FROM bf), xxhash64(gram)))
        |SELECT cand.doc_id,
        |  CAST(COUNT(DISTINCT cand.gram) AS BIGINT) AS n_shared,
        |  CAST(MIN(bg.bench_id) AS BIGINT) AS first_bench
        |FROM cand JOIN bg ON cand.gram = bg.gram
        |GROUP BY cand.doc_id ORDER BY cand.doc_id""".stripMargin)
  }
}
