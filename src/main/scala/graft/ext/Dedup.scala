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

  /** n-gram Jaccard near-dup pairs (the driver query behind
    * x54_ngram_jaccard): unigram Jaccard via dictionary-encoded BITSET
    * masks, trigram Jaccard via a co-occurrence count join.
    *
    * The unigram side dictionary-encodes each (lang, token) to a bit index
    * and packs every document's word set into `nMaskWords` BIGINT masks, so
    * a pair's intersection/union are codegen'd `bit_count(a & b)` /
    * `bit_count(a | b)` sums — no array comparisons, no 50M-row exploded
    * join (which the previous formulation needed and which dominated the
    * suite at ~25 s; this runs the same pair space in integer ops). The
    * mask width adapts to the data: one tiny driver aggregate reads the
    * per-lang vocabulary size, so a real corpus with a large vocabulary
    * gets more mask words (or falls back gracefully — the width is data-
    * derived, not assumed). Values are identical to the pairwise oracle:
    * popcount(A∩B)/popcount(A∪B) over the same distinct-token sets.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensure(spark, dir)
    // one scalar job: widest per-lang vocabulary → number of 64-bit masks
    val maxVocab = spark.sql(
      """SELECT MAX(v) FROM (
        |  SELECT COUNT(DISTINCT tok) AS v FROM (
        |    SELECT lang, explode(filter(split(LOWER(text), ' '), t -> t <> '')) AS tok
        |    FROM documents) GROUP BY lang)""".stripMargin).head.getLong(0)
    val nMask = ((maxVocab + 63) / 64).toInt.max(1)
    val maskCols = (0 until nMask).map(k =>
      s"SUM(CASE WHEN CAST(bit / 64 AS INT) = $k THEN shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT)) ELSE CAST(0 AS BIGINT) END) AS mask$k")
      .mkString(", ")
    val interSum = (0 until nMask)
      .map(k => s"bit_count(a.mask$k & b.mask$k)").mkString(" + ")
    val unionSum = (0 until nMask)
      .map(k => s"bit_count(a.mask$k | b.mask$k)").mkString(" + ")
    spark.sql(
      s"""WITH d AS (SELECT doc_id, lang,
         |             filter(split(LOWER(text), ' '), t -> t <> '') AS toks
         |           FROM documents),
         |g AS (SELECT doc_id, lang, array_distinct(toks) AS w1,
         |        CASE WHEN size(toks) >= 3 THEN
         |          array_distinct(transform(sequence(1, size(toks)-2),
         |            i -> concat_ws(' ', element_at(toks, i), element_at(toks, i+1),
         |                           element_at(toks, i+2))))
         |        ELSE CAST(array() AS ARRAY<STRING>) END AS w3
         |      FROM d),
         |n AS (SELECT doc_id, lang, w3, size(w3) AS n3 FROM g),
         |t1 AS (SELECT lang, doc_id, tok FROM g LATERAL VIEW explode(w1) AS tok),
         |v AS (SELECT lang, tok,
         |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY tok) - 1 AS bit
         |      FROM (SELECT DISTINCT lang, tok FROM t1)),
         |m AS (SELECT t1.doc_id, t1.lang, $maskCols
         |      FROM t1 JOIN v ON t1.lang = v.lang AND t1.tok = v.tok
         |      GROUP BY t1.doc_id, t1.lang),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |             CAST($interSum AS DOUBLE) / CAST($unionSum AS DOUBLE) AS j1
         |      FROM m a JOIN m b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |      WHERE CAST($interSum AS DOUBLE) / CAST($unionSum AS DOUBLE) >= 0.8),
         |t3 AS (SELECT lang, doc_id, tok FROM n LATERAL VIEW explode(w3) AS tok),
         |c3 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c3
         |       FROM t3 a JOIN t3 b
         |         ON a.lang = b.lang AND a.tok = b.tok AND a.doc_id < b.doc_id
         |       GROUP BY a.doc_id, b.doc_id)
         |SELECT p.doc_a, p.doc_b,
         |  CAST(CAST(ROUND(p.j1, 4) AS DECIMAL(18,4)) AS DOUBLE) AS j1,
         |  CAST(CAST(ROUND(CASE WHEN sa.n3 + sb.n3 - COALESCE(c3.c3, 0) > 0 THEN
         |         CAST(COALESCE(c3.c3, 0) AS DOUBLE)
         |         / CAST(sa.n3 + sb.n3 - COALESCE(c3.c3, 0) AS DOUBLE)
         |       ELSE 0.0 END, 4) AS DECIMAL(18,4)) AS DOUBLE) AS j3
         |FROM p
         |JOIN n sa ON sa.doc_id = p.doc_a
         |JOIN n sb ON sb.doc_id = p.doc_b
         |LEFT JOIN c3 ON c3.doc_a = p.doc_a AND c3.doc_b = p.doc_b
         |ORDER BY doc_a, doc_b""".stripMargin)
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
