package graft.ext

import graft.SparkSpec

/** x95 Bloom-prefiltered decontamination (ext/Decontam). */
class DecontamSpec extends SparkSpec {

  test("x95 equals the exact x76 decontamination join (FP-free after verify)") {
    val bloom = Decontam.bloomDecontamQuery(spark, sfDir).collect().toSeq
    val exact = graft.Tables
      .sql(Extensions.all.find(_.name == "x76_decontam").get.spark)(spark, sfDir)
      .collect().toSeq
    assert(bloom == exact)
    assert(bloom.nonEmpty, "decontam fixture must flag at least one doc")
  }

  test("x95 plan probes the Bloom sketch before the exact join") {
    val plan = Decontam.bloomDecontamQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "training grams must be pruned map-side by BloomFilterMightContain")
  }

  test("bloom prefilter admits every benchmark gram (no false negatives)") {
    graft.functions.GraftFunctions.register(spark)
    graft.Tables.ensure(spark, sfDir)
    // every bench gram probed against the sketch built from bench grams
    // must hit — the Bloom contract the exactness argument rests on
    val misses = spark.sql(
      """WITH toks AS (SELECT doc_id, filter(split(LOWER(text), ' '), t -> t <> '') AS tk
        |              FROM documents WHERE doc_id % 97 = 0),
        |g AS (SELECT DISTINCT explode(array_distinct(transform(
        |        sequence(1, size(tk) - 2),
        |        i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1),
        |                       element_at(tk, i + 2))))) AS gram
        |      FROM toks WHERE size(tk) >= 3),
        |bf AS (SELECT bloom_filter_agg(xxhash64(gram), CAST(131072 AS BIGINT)) AS f FROM g)
        |SELECT COUNT(*) AS n FROM g
        |WHERE NOT might_contain((SELECT f FROM bf), xxhash64(gram))""".stripMargin)
      .collect().head.getLong(0)
    assert(misses == 0L)
  }
}
