package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at scale: MinHash-LSH and SimHash.
  *
  * The reference has no dedup surface (SURVEY.md §0); these are the
  * driver-mandated LLM-pipeline operators (SURVEY.md §2.2 B69/B71). The
  * exact twins checked against the DuckDB oracle are q46_exact_dup,
  * x52_fingerprint, x53_dedup_stats and x54_ngram_jaccard; the sketch-based
  * ops here are hash-dependent (murmur3/xxhash64) and therefore
  * property-tested in DedupSpec instead (candidates ⊇ exact duplicates;
  * estimate within ε of exact Jaccard).
  *
  * Scale design: signatures are built in one scan with builtin higher-order
  * functions (whole-stage codegen, no UDFs); the only shuffle is the
  * band-bucket self-join, whose key (band_id, band_hash) spreads uniformly,
  * so the pair space is bounded by bucket occupancy — the standard
  * MinHash-LSH contract at 100 TB. No collect(), no cross join.
  */
object Dedup {
  val NumPerms = 64
  // 4 bands × 16 rows: this corpus has a 31-word vocabulary, so *random*
  // pairs sit near Jaccard 0.55 — short bands would admit nearly every
  // pair (0.55^4 ≈ 9% per band), while 16-row bands keep the candidate
  // rate at 0.55^16 ≈ 7e-5 per band yet still catch j≈1 duplicates with
  // probability ~1 (0.9-similar pairs drop to ~56% recall — acceptable
  // here because the true duplicates are word-order shuffles with j=1).
  // At 100 TB the band shape is the knob that trades shuffle volume vs
  // recall; it must be chosen against the similarity distribution, not
  // defaulted.
  val Bands = 4
  val RowsPerBand: Int = NumPerms / Bands

  /** doc_id + distinct lowercase word set (the shingle universe). */
  private[graft] def docWords(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensure(spark, dir)
    spark.table("documents").select(col("doc_id"),
      array_distinct(filter(split(lower(col("text")), " "), t => t =!= ""))
        .as("words"))
  }

  /** 64-perm MinHash signature: perm i = murmur3 of (word, i) — the hash
    * family comes from hashing the permutation index alongside the word.
    *
    * Computed as explode → groupBy(doc) with 64 `min(hash(tok, i))` agg
    * columns: all whole-stage-codegen'd, one hash shuffle on doc_id. (The
    * lambda formulation — transform/array_min over the word array — is
    * ~10× slower because higher-order functions evaluate interpreted.) */
  private[graft] def signatures(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(col("words")).as("tok"))
    val aggs = (0 until NumPerms).map(i => min(hash(col("tok"), lit(i))).as(s"m$i"))
    toks.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until NumPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash-LSH candidate pairs (8 bands × 8 rows) with the MinHash
    * Jaccard estimate and the exact word-set Jaccard for verification.
    * The word arrays are only joined back for the few pairs that survive
    * the sketch filter — the band shuffle carries (doc_id, sig) alone. */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    // Both intermediates are tiny (one row per doc) but feed three joins
    // each — caching stops the 64-column signature aggregation from being
    // recomputed per join branch. At cluster scale these would be
    // checkpointed/bucketed instead.
    val words = docWords(spark, dir).cache()
    val sigs = signatures(words).cache()
    // The band join shuffles ONLY (doc_id, band_id, bh) — 20 bytes/row.
    // Signatures and word arrays rejoin after the candidate set is small.
    val bands = sigs.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(Bands - 1)),
          b => struct(b.as("band_id"),
            hash(slice(col("sig"), b * lit(RowsPerBand) + lit(1),
              lit(RowsPerBand))).as("bh")))).as("band"))
      .select(col("doc_id"),
        col("band.band_id").as("band_id"), col("band.bh").as("bh"))
    // Candidate = pairs sharing ≥2 of 4 bands. This corpus sits near
    // Jaccard 0.8 for RANDOM pairs (31-word vocabulary), so single-band
    // matches still admit ~10% of all pairs (measured: 1.47M candidates at
    // sf0.1); requiring a second independent band match cuts that ~20×
    // while keeping j≈1 duplicates at probability ~1.
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_bands"))
      .filter(col("shared_bands") >= 2)
    // est_j as 64 codegen'd element comparisons — the zip_with lambda
    // formulation evaluates interpreted and dominated the runtime.
    val estCol = (0 until NumPerms).map(i =>
      when(element_at(col("sa"), i + 1) === element_at(col("sb"), i + 1), 1)
        .otherwise(0)).reduce(_ + _).cast("double") / lit(NumPerms.toDouble)
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sa")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sb")), "doc_b")
      .withColumn("est_j", estCol)
      .filter(col("est_j") >= 0.9)  // filter on the sketch BEFORE exact work
      .join(words.select(col("doc_id").as("doc_a"), col("words").as("wa")), "doc_a")
      .join(words.select(col("doc_id").as("doc_b"), col("words").as("wb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("est_j"),
        (size(array_intersect(col("wa"), col("wb"))).cast("double") /
          size(array_union(col("wa"), col("wb"))).cast("double")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash over the word bag: bit b is the sign of the sum of
    * (±1 by bit b of xxhash64(word)).
    *
    * Computed as explode → one xxhash64 per token → groupBy(doc) with 64
    * codegen'd conditional-sum agg columns, then a bitwise-OR fold into one
    * BIGINT. Same rationale as [[signatures]]: aggregation columns codegen,
    * array lambdas don't. */
  private[ext] def simhashes(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(col("words")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val aggs = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b"))
    toks.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup pairs: block on the four 16-bit chunks (a pair within
    * Hamming distance 3 must agree on at least one chunk), then verify with
    * bit_count(xor) ≤ maxHamming. */
  def simhashPairs(spark: SparkSession, dir: String,
                   maxHamming: Int = 3): DataFrame = {
    // Dedup identical signatures FIRST: exact duplicates (the dominant
    // case) collapse to one representative per distinct simhash, so the
    // pairwise chunk join runs over representatives — the giant
    // identical-signature buckets that would otherwise go quadratic
    // through the shuffle never reach it. Hamming-0 pairs are generated
    // combinatorially from the group membership lists instead.
    val sigs = simhashes(docWords(spark, dir))
    val groups = sigs.groupBy("simhash")
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .cache()
    val zero = groups
      .select(col("docs"), explode(col("docs")).as("doc_a"))
      .select(col("doc_a"), explode(col("docs")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", lit(0))
    val pairs =
      if (maxHamming == 0) zero
      else {
        val chunks = groups.select(col("simhash"), col("docs"),
            explode(expr(
              """transform(sequence(0, 3), j ->
                |  struct(j AS chunk_id,
                |         (shiftright(simhash, j * 16) & 65535) AS cv))""".stripMargin))
              .as("c"))
          .select(col("simhash"), col("docs"),
            col("c.chunk_id").as("chunk_id"), col("c.cv").as("cv"))
        // Hamming bound INSIDE the join condition so candidates die during
        // the join, not in a post-join shuffle; simhash < simhash dedups
        // the 4 chunk matches down to unordered group pairs.
        val repPairs = chunks.as("a").join(chunks.as("b"),
            col("a.chunk_id") === col("b.chunk_id") &&
              col("a.cv") === col("b.cv") &&
              col("a.simhash") < col("b.simhash") &&
              expr("bit_count(a.simhash ^ b.simhash)") <= maxHamming)
          .select(col("a.docs").as("da"), col("b.docs").as("db"),
            expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
          .dropDuplicates("da", "db", "hamming")
        val cross = repPairs
          .select(col("db"), col("hamming"), explode(col("da")).as("x"))
          .select(col("x"), col("hamming"), explode(col("db")).as("y"))
          .select(least(col("x"), col("y")).as("doc_a"),
            greatest(col("x"), col("y")).as("doc_b"), col("hamming"))
        zero.unionByName(cross)
      }
    pairs.orderBy("doc_a", "doc_b")
  }
}
