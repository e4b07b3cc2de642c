package graft.ext

import Stages.StageOps
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed one-call pipeline a training
  * run starts from, chaining the individually-oracle-checked stages —
  *
  *   [opt-in boilerplate strip (x114)] → rule filter (x97) → per-lang
  *   quality quantile (x96) → exact dedup (q46/x53) → word-set near-dup
  *   keep-first (x52) → temperature sampling (x94) → greedy sequence
  *   packing (x72)
  *
  * Every stage is a distributed Spark job; driver state is the seven
  * stage-count scalars in [[Pipeline.CurationStats]] and nothing else.
  * Window stages are keyed (lang / fingerprint) — no global windows; the
  * stage boundaries that feed a window are localCheckpoint'd so each
  * count action re-reads a materialized frame instead of replaying the
  * chain. Determinism: every tiebreak is (…, doc_id), every ratio is
  * floor-rounded before comparison — two runs at any parallelism produce
  * the identical curated set (pinned by PipelineSpec).
  */
object Pipeline {

  /** Docs surviving each stage (monotone non-increasing), then pack count. */
  final case class CurationStats(input: Long, afterRules: Long,
      afterQuality: Long, afterExactDedup: Long, afterNearDedup: Long,
      afterSampling: Long, packs: Long)

  private val Stops =
    Seq("the", "and", "of", "to", "in", "is", "it", "that", "a", "for")

  /** Curate the `documents` table under `dir`.
    *
    * @param sampleTarget total docs the temperature sampler aims for
    *                     (per-lang quotas ∝ √tokenMass, integer-split)
    * @param tokenBudget  greedy packing bin capacity (tokens)
    * @return (curated frame: doc_id, lang, ntoks, quality, pack_id; stats)
    */
  def curate(spark: SparkSession, dir: String, sampleTarget: Int = 200,
             tokenBudget: Int = 256,
             stripBoilerplate: Boolean = false,
             boilerplateMinDf: Long = 10): (DataFrame, CurationStats) = {
    Tables.ensure(spark, dir)
    val stopsArr = array(Stops.map(lit): _*)

    // optional pre-stage: per-source frequent-5-gram boilerplate strip
    // (the x114 operator in DataFrame form) — rewrites `text` BEFORE any
    // feature derivation so every downstream rule/score/dedup stage sees
    // the cleaned content; checkpointed because two stages scan it
    val source =
      if (stripBoilerplate)
        Extensions.stripBoilerplate(spark.table("documents"),
            boilerplateMinDf)
          .stageMaterialize
      else spark.table("documents")

    // one scan computes every per-doc feature the stages need
    val base = source
      .withColumn("toks",
        array_remove(split(lower(col("text")), " "), ""))
      .withColumn("ntoks", size(col("toks")))
      .withColumn("nchars", length(col("text")))
      .withColumn("stop_hits",
        size(filter(col("toks"), t => array_contains(stopsArr, t))))
      .withColumn("punct",
        length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")))
      .withColumn("wchars", aggregate(col("toks"), lit(0L), (a, w) =>
        a + length(w)))
      .withColumn("alpha_words",
        size(filter(col("toks"), w => w.rlike("[a-z]"))))

    val input = base.count()

    // x97: hard rules, floor-rounded ratios (map-only)
    def fr(c: org.apache.spark.sql.Column, scale: Double) =
      floor(c * scale + 0.5) / scale
    val nw = greatest(col("ntoks"), lit(1)).cast("double")
    val rules = base.filter(
      col("ntoks").between(10, 100000) &&
        fr(col("wchars").cast("double") / nw, 100.0).between(2.0, 10.0) &&
        fr(col("alpha_words").cast("double") / nw, 10000.0) >= 0.8 &&
        fr(col("punct").cast("double") /
          greatest(col("nchars"), lit(1)).cast("double"), 10000.0) <= 0.1 &&
        col("stop_hits") >= 2)
      .stageMaterialize
    val afterRules = rules.count()

    // x96: x50's quality score, floor-rounded BEFORE ranking; keep the
    // per-lang top 75% by (q DESC, doc_id) — integer quantile cut
    val scored = rules.withColumn("quality", fr(
      lit(0.4) * (col("stop_hits").cast("double") / nw) +
        lit(0.3) * least(col("ntoks").cast("double") / 50.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - col("punct").cast("double") /
          greatest(col("nchars"), lit(1)).cast("double")), 10000.0)
      .cast("decimal(18,4)").cast("double"))
    val wLang = Window.partitionBy("lang")
    val quality = scored
      .withColumn("rn", row_number().over(
        wLang.orderBy(col("quality").desc, col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(wLang))
      .filter(col("rn") * 4 <= col("cnt") * 3)
      .drop("rn", "cnt")
      .stageMaterialize
    val afterQuality = quality.count()

    // q46/x53: exact dedup on whitespace-normalized text, keep-first
    val exactW = Window.partitionBy("exact_fp").orderBy("doc_id")
    val exact = quality
      .withColumn("exact_fp",
        md5(regexp_replace(trim(lower(col("text"))), " +", " ")
          .cast("binary")))
      .withColumn("rn", row_number().over(exactW))
      .filter(col("rn") === 1).drop("rn")
    val afterExact = exact.count()

    // x52: word-set fingerprint near-dup, keep-first (catches word-order
    // shuffles that exact dedup misses)
    val setW = Window.partitionBy("set_fp").orderBy("doc_id")
    val near = exact
      .withColumn("set_fp",
        md5(concat_ws(" ", sort_array(array_distinct(col("toks"))))
          .cast("binary")))
      .withColumn("rn", row_number().over(setW))
      .filter(col("rn") === 1).drop("rn")
      .stageMaterialize
    val afterNear = near.count()

    // x94: temperature sampling — per-lang quota ∝ ⌊√tokenMass·1000⌋,
    // integer division against the BIGINT weight total, md5-ordered fill
    val weights = near.groupBy("lang")
      .agg(floor(sqrt(sum("ntoks").cast("double")) * 1000.0)
        .cast("long").as("w"))
    val totRow = weights.agg(sum("w")).head
    require(!totRow.isNullAt(0) && totRow.getLong(0) > 0,
      "curate: no documents survived filtering/dedup — cannot derive " +
        "sampling quotas (ANSI division by a zero weight total)")
    val totW = totRow.getLong(0)
    val quotas = weights.withColumn("quota",
      (lit(sampleTarget.toLong) * col("w")).divide(lit(totW)).cast("long"))
      .select("lang", "quota")
    val sampled = near
      .join(broadcast(quotas), "lang")
      .withColumn("rn", row_number().over(wLang.orderBy(
        md5(concat(col("lang"), lit("|"), col("doc_id").cast("string"))),
        col("doc_id"))))
      .filter(col("rn") <= col("quota"))
      .drop("rn", "quota")
      .stageMaterialize
    val afterSampling = sampled.count()

    // x72: greedy per-lang sequence packing in doc_id order (greedyPack
    // outputs only its own columns — quality joins back on doc_id)
    val packed = Packing.greedyPack(
      sampled.select("doc_id", "lang", "ntoks"),
      "lang", "doc_id", "ntoks", tokenBudget)
      .join(sampled.select("doc_id", "quality"), "doc_id")
      .select(col("doc_id"), col("lang"), col("ntoks").cast("int"),
        col("quality"), col("pack_id").cast("long"))
    val packs = packed.select("lang", "pack_id").distinct().count()

    (packed, CurationStats(input, afterRules, afterQuality, afterExact,
      afterNear, afterSampling, packs))
  }
}
