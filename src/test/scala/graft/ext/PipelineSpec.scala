package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed curation pipeline: stage counts monotone, every stage's
  * contract visible in the output, deterministic across parallelism. */
class PipelineSpec extends SparkSpec {

  private lazy val (curated, stats) =
    Pipeline.curate(spark, sfDir, sampleTarget = 100, tokenBudget = 128)

  test("stage counts are monotone non-increasing and non-degenerate") {
    assert(stats.input > 0)
    assert(stats.afterRules <= stats.input)
    assert(stats.afterQuality <= stats.afterRules)
    assert(stats.afterExactDedup <= stats.afterQuality)
    assert(stats.afterNearDedup <= stats.afterExactDedup)
    assert(stats.afterSampling <= stats.afterNearDedup)
    // the rule battery and the quantile cut must both actually cut
    assert(stats.afterRules < stats.input, stats.toString)
    assert(stats.afterQuality < stats.afterRules, stats.toString)
    assert(curated.count() == stats.afterSampling)
    assert(stats.packs > 0 && stats.packs <= stats.afterSampling)
  }

  test("survivors pass the hard rules and quality matches the x50 SQL formula") {
    val bad = curated.filter(col("ntoks") < 10).count()
    assert(bad == 0, s"$bad under-length docs survived the rule stage")
    // cross-formulation check: the pipeline computes quality with the
    // Column DSL; recompute it from raw text with the x50/x96 SQL text and
    // the two must agree doc-for-doc
    graft.Tables.ensure(spark, sfDir)
    val sqlQ = spark.sql(
      """SELECT doc_id, CAST(CAST(FLOOR((
        |    0.4*(CAST(size(filter(split(LOWER(text),' '), x -> x <> '')) -
        |           size(filter(filter(split(LOWER(text),' '), x -> x <> ''),
        |             x -> NOT x IN ('the','and','of','to','in','is','it','that','a','for'))) AS DOUBLE)
        |         / CAST(GREATEST(size(filter(split(LOWER(text),' '), x -> x <> '')),1) AS DOUBLE))
        |  + 0.3*LEAST(CAST(size(filter(split(LOWER(text),' '), x -> x <> '')) AS DOUBLE)/50.0, 1.0)
        |  + 0.3*(1.0 - CAST(LENGTH(regexp_replace(text,'[a-zA-Z0-9 ]','')) AS DOUBLE)
        |         / CAST(GREATEST(LENGTH(text),1) AS DOUBLE))) * 10000.0 + 0.5) / 10000.0
        |  AS DECIMAL(18,4)) AS DOUBLE) AS q_sql
        |FROM documents""".stripMargin)
    val diff = curated.join(sqlQ, "doc_id")
      .filter(col("quality") =!= col("q_sql")).count()
    assert(diff == 0, s"$diff docs where DSL quality != SQL-text quality")
  }

  test("no two survivors share a word-set fingerprint (near-dedup held)") {
    graft.Tables.ensure(spark, sfDir)
    val withFp = curated.join(spark.table("documents"), "doc_id")
      .withColumn("fp", md5(concat_ws(" ", sort_array(array_distinct(
        filter(split(lower(col("text")), " "), t => t =!= ""))))
        .cast("binary")))
    val dup = withFp.groupBy("fp").count().filter(col("count") > 1).count()
    assert(dup == 0, s"$dup duplicated word-set fingerprints in the output")
  }

  test("per-lang doc counts respect the temperature quotas") {
    val perLang = curated.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // quotas sum to ≤ sampleTarget (integer division floors each share)
    assert(perLang.values.sum <= 100,
      s"sampled ${perLang.values.sum} docs > target 100: $perLang")
    assert(perLang.size >= 2, s"sampling collapsed to one lang: $perLang")
  }

  test("packs respect the token budget unless a single doc overflows it") {
    val over = curated.groupBy("lang", "pack_id")
      .agg(sum("ntoks").as("tok"), count(lit(1)).as("n"))
      .filter(col("tok") > 128 && col("n") > 1)
      .count()
    assert(over == 0, s"$over multi-doc packs exceed the budget")
  }

  test("curation is deterministic across shuffle parallelism") {
    val p = spark.conf.get("spark.sql.shuffle.partitions")
    val a = curated.orderBy("doc_id").collect().toSeq
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val (c2, s2) = Pipeline.curate(spark, sfDir, 100, 128)
      assert(s2 == stats, s"stats diverge: $s2 vs $stats")
      val b = c2.orderBy("doc_id").collect().toSeq
      assert(a == b, "curated set depends on parallelism")
    } finally spark.conf.set("spark.sql.shuffle.partitions", p)
  }

  test("boilerplate pre-stage strips frequent grams, stays deterministic") {
    graft.Tables.ensure(spark, sfDir)
    val raw = spark.table("documents")
    val cleaned = Extensions.stripBoilerplate(raw, minDf = 2)
    // content actually shrinks (the synthetic corpus repeats grams within
    // sources), and no doc GROWS
    val joined = raw.select(col("doc_id"), length(col("text")).as("a"))
      .join(cleaned.select(col("doc_id"), length(col("text")).as("b")), "doc_id")
    assert(joined.filter(col("b") > col("a")).count() === 0)
    assert(joined.filter(col("b") < col("a")).count() > 0,
      "expected at least one doc to lose boilerplate")
    // (the exact surviving-token set is the x114 oracle row's job — its
    // position-tagged fingerprint pins token identity AND order)
    val (c1, s1) = Pipeline.curate(spark, sfDir, 100, 128,
      stripBoilerplate = true, boilerplateMinDf = 2)
    val (c2, s2) = Pipeline.curate(spark, sfDir, 100, 128,
      stripBoilerplate = true, boilerplateMinDf = 2)
    assert(s1 == s2, s"boilerplate curation stats diverge: $s1 vs $s2")
    assert(c1.orderBy("doc_id").collect().toSeq ===
      c2.orderBy("doc_id").collect().toSeq)
    // the strip changes the curated outcome vs the default path
    assert(s1 != stats, "pre-stage had no effect on the pipeline")
  }
}
