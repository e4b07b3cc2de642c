package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native functions.
  *
  * Two paths, same registry entries:
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.
  *    GraftExtensions` (cluster-wide install),
  *  - [[GraftFunctions.register]] for runtime registration into an
  *    existing session (the driver harness builds its own SparkSession,
  *    so the queries() entries use this).
  */
object GraftFunctions {

  private def cosineBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "cosine_sim takes exactly 2 arguments")
    CosineSim(args.head, args(1))
  }

  private val cosineInfo = new ExpressionInfo(
    classOf[CosineSim].getName, null, "cosine_sim",
    "cosine_sim(a, b) - cosine similarity of two float arrays", "")

  private def intersectBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "sorted_intersect_count takes exactly 2 arguments")
    SortedIntersectCount(args.head, args(1))
  }

  private val intersectInfo = new ExpressionInfo(
    classOf[SortedIntersectCount].getName, null, "sorted_intersect_count",
    "sorted_intersect_count(a, b) - |A intersect B| of two sorted int arrays", "")

  private def lshBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "lsh_buckets takes exactly 1 argument")
    LshBuckets(args.head)
  }

  private val lshInfo = new ExpressionInfo(
    classOf[LshBuckets].getName, null, "lsh_buckets",
    "lsh_buckets(v) - multi-table hyperplane LSH bucket ids for a float array",
    "")

  private def stringArrayLiteral(name: String, e: Expression): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(elems, _)
        if elems.forall(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.Literal]) =>
      elems.map { el =>
        val v = el.asInstanceOf[
          org.apache.spark.sql.catalyst.expressions.Literal].value
        // reject nulls with the same descriptive error as non-literals
        // (ADVICE r15: .toString on a null literal NPE'd at analysis time)
        if (v == null) throw new IllegalArgumentException(
          s"$name expects a literal string array without nulls, got $e")
        v.toString
      }
    case other => throw new IllegalArgumentException(
      s"$name expects a literal string array, got $other")
  }

  private def countInBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "count_in takes exactly 2 arguments")
    CountIn(args.head, stringArrayLiteral("count_in", args(1)))
  }

  private val countInInfo = new ExpressionInfo(
    classOf[CountIn].getName, null, "count_in",
    "count_in(tokens, array(...)) - tokens equal to any of a literal set", "")

  private def countRlikeBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "count_rlike takes exactly 2 arguments")
    val re = args(1) match {
      case l: org.apache.spark.sql.catalyst.expressions.Literal
          if l.dataType == org.apache.spark.sql.types.StringType =>
        l.value.toString
      case other => throw new IllegalArgumentException(
        s"count_rlike expects a literal regex, got $other")
    }
    CountRlike(args.head, re)
  }

  private val countRlikeInfo = new ExpressionInfo(
    classOf[CountRlike].getName, null, "count_rlike",
    "count_rlike(tokens, regex) - tokens the regex finds a match in", "")

  private def maxFreqBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "max_freq takes exactly 1 argument")
    MaxFreq(args.head)
  }

  private val maxFreqInfo = new ExpressionInfo(
    classOf[MaxFreq].getName, null, "max_freq",
    "max_freq(tokens) - max multiplicity of any token", "")

  private def sumLengthsBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "sum_lengths takes exactly 1 argument")
    SumLengths(args.head)
  }

  private val sumLengthsInfo = new ExpressionInfo(
    classOf[SumLengths].getName, null, "sum_lengths",
    "sum_lengths(tokens) - total code-point length of the tokens", "")

  private def winnowBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "winnow_fp takes exactly 1 argument")
    WinnowFp(args.head)
  }

  private val winnowInfo = new ExpressionInfo(
    classOf[WinnowFp].getName, null, "winnow_fp",
    "winnow_fp(tokens) - struct(n_fp, min_fp, fp_modsum) winnowing fingerprint summary",
    "")

  private def lshM3Builder(args: Seq[Expression]): Expression = {
    require(args.length == 3, "lsh_buckets_m3 takes exactly 3 arguments")
    LshBucketsM3(args.head, literalN("lsh_buckets_m3", args(1)),
      literalN("lsh_buckets_m3", args(2)))
  }

  private val lshM3Info = new ExpressionInfo(
    classOf[LshBucketsM3].getName, null, "lsh_buckets_m3",
    "lsh_buckets_m3(v, tables, planes) - murmur3-sign LSH bucket ids", "")

  private def jaccardBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "jaccard_sim takes exactly 2 arguments")
    JaccardSim(args.head, args(1))
  }

  private val jaccardInfo = new ExpressionInfo(
    classOf[JaccardSim].getName, null, "jaccard_sim",
    "jaccard_sim(a, b) - exact word-set Jaccard similarity of two strings",
    "")

  private def bandKeysBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "minhash_band_keys takes exactly 1 argument")
    MinHashBandKeys(args.head)
  }

  private val bandKeysInfo = new ExpressionInfo(
    classOf[MinHashBandKeys].getName, null, "minhash_band_keys",
    "minhash_band_keys(s) - MinHash LSH band keys for a text column", "")

  private def sigBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "minhash_signature takes exactly 1 argument")
    MinHashSignature(args.head)
  }

  private val sigInfo = new ExpressionInfo(
    classOf[MinHashSignature].getName, null, "minhash_signature",
    "minhash_signature(words) - 64-perm MinHash signature of a word array", "")

  private def simhashBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "simhash64 takes exactly 1 argument")
    SimHash64(args.head)
  }

  private val simhashInfo = new ExpressionInfo(
    classOf[SimHash64].getName, null, "simhash64",
    "simhash64(words) - 64-bit SimHash of a word array", "")

  private def zorderBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "zorder2 takes exactly 2 arguments")
    ZOrder2(args.head, args(1))
  }

  private val zorderInfo = new ExpressionInfo(
    classOf[ZOrder2].getName, null, "zorder2",
    "zorder2(x, y) - 42-bit Morton (Z-order) interleave of two ints", "")

  private def xxSortedBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "xxhash64_sorted takes exactly 1 argument")
    XxHash64Sorted(args.head)
  }

  private val xxSortedInfo = new ExpressionInfo(
    classOf[XxHash64Sorted].getName, null, "xxhash64_sorted",
    "xxhash64_sorted(words) - sorted xxhash64 array of a word array", "")

  private def literalN(name: String, e: Expression): Int = e match {
    case lit: org.apache.spark.sql.catalyst.expressions.Literal
        if lit.dataType == org.apache.spark.sql.types.IntegerType =>
      lit.value.asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int n, got $other")
  }

  private[functions] def wordNgramsBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "word_ngrams takes exactly 2 arguments")
    WordNgrams(args.head, literalN("word_ngrams", args(1)))
  }

  private val wordNgramsInfo = new ExpressionInfo(
    classOf[WordNgrams].getName, null, "word_ngrams",
    "word_ngrams(words, n) - consecutive space-joined word n-grams", "")

  private[functions] def ngramHashesBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "ngram_hashes_sorted takes exactly 2 arguments")
    NgramHashesSorted(args.head, literalN("ngram_hashes_sorted", args(1)))
  }

  private val ngramHashesInfo = new ExpressionInfo(
    classOf[NgramHashesSorted].getName, null, "ngram_hashes_sorted",
    "ngram_hashes_sorted(words, n) - sorted xxhash64 of distinct word n-grams",
    "")

  private def boilerplateStripBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "boilerplate_strip takes exactly 2 arguments")
    BoilerplateStrip(args.head, args(1))
  }

  private val boilerplateStripInfo = new ExpressionInfo(
    classOf[BoilerplateStrip].getName, null, "boilerplate_strip",
    "boilerplate_strip(tokens, matched) - struct(kept_toks, clean_fp) after 5-gram cover removal",
    "")

  private[functions] def levenshteinFastBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "graft_levenshtein takes exactly 2 arguments")
    LevenshteinFast(args.head, args(1))
  }

  private val levenshteinFastInfo = new ExpressionInfo(
    classOf[LevenshteinFast].getName, null, "graft_levenshtein",
    "graft_levenshtein(a, b) - exact Levenshtein distance, bit-parallel", "")

  // Spark's own runtime-join-filter Bloom machinery (BloomFilterAggregate /
  // BloomFilterMightContain, spark-catalyst), surfaced as SQL functions so
  // the decontamination pipeline can build one sketch per benchmark set and
  // probe it as a broadcast scalar — the exact pattern InjectRuntimeFilter
  // plans for shuffle-join pruning. Builders return the raw AggregateFunction
  // (the analyzer wraps it in AggregateExpression, as with builtin aggs).
  private def bloomAggBuilder(args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    args match {
      case Seq(c)       => new BloomFilterAggregate(c)
      case Seq(c, n)    => new BloomFilterAggregate(c, n)
      case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
      case _ => throw new IllegalArgumentException(
        "bloom_filter_agg takes 1-3 arguments")
    }
  }

  private val bloomAggInfo = new ExpressionInfo(
    "org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate",
    null, "bloom_filter_agg",
    "bloom_filter_agg(xxhash64(x)[, est_items[, num_bits]]) - Bloom filter sketch bytes",
    "")

  private def mightContainBuilder(args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    require(args.length == 2, "might_contain takes exactly 2 arguments")
    BloomFilterMightContain(args.head, args(1))
  }

  private val mightContainInfo = new ExpressionInfo(
    "org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain",
    null, "might_contain",
    "might_contain(bloom, xxhash64(x)) - Bloom membership probe (no false negatives)",
    "")

  def register(spark: SparkSession): Unit = {
    // idempotent per session: operators call this defensively before use,
    // so skip (and silence the registry's "replaced a previously
    // registered function" warnings) once the suite is already installed
    if (spark.sessionState.functionRegistry
          .functionExists(FunctionIdentifier("minhash_sig"))) return
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_sim"), cosineInfo, cosineBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sorted_intersect_count"), intersectInfo,
      intersectBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("lsh_buckets"), lshInfo, lshBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("lsh_buckets_m3"), lshM3Info, lshM3Builder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("winnow_fp"), winnowInfo, winnowBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("count_in"), countInInfo, countInBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("count_rlike"), countRlikeInfo, countRlikeBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sum_lengths"), sumLengthsInfo, sumLengthsBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("max_freq"), maxFreqInfo, maxFreqBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("jaccard_sim"), jaccardInfo, jaccardBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_band_keys"), bandKeysInfo,
      bandKeysBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_signature"), sigInfo, sigBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash64"), simhashInfo, simhashBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("xxhash64_sorted"), xxSortedInfo, xxSortedBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("zorder2"), zorderInfo, zorderBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("word_ngrams"), wordNgramsInfo, wordNgramsBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("ngram_hashes_sorted"), ngramHashesInfo,
      ngramHashesBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_levenshtein"), levenshteinFastInfo,
      levenshteinFastBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("boilerplate_strip"), boilerplateStripInfo,
      boilerplateStripBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_filter_agg"), bloomAggInfo, bloomAggBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("might_contain"), mightContainInfo,
      mightContainBuilder _)
    spark.udf.register("minhash_sig",
      org.apache.spark.sql.functions.udaf(MinHashAgg))
  }
}

/** `SparkSessionExtensions` hook — inject with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, null, "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float arrays", ""),
      (args: Seq[Expression]) => CosineSim(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, null,
        "sorted_intersect_count",
        "sorted_intersect_count(a, b) - |A intersect B| of two sorted int arrays",
        ""),
      (args: Seq[Expression]) => SortedIntersectCount(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSim].getName, null, "jaccard_sim",
        "jaccard_sim(a, b) - exact word-set Jaccard similarity of two strings",
        ""),
      (args: Seq[Expression]) => JaccardSim(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, null,
        "minhash_signature",
        "minhash_signature(words) - 64-perm MinHash signature of a word array",
        ""),
      (args: Seq[Expression]) => MinHashSignature(args.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, null, "simhash64",
        "simhash64(words) - 64-bit SimHash of a word array", ""),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((
      FunctionIdentifier("xxhash64_sorted"),
      new ExpressionInfo(classOf[XxHash64Sorted].getName, null,
        "xxhash64_sorted",
        "xxhash64_sorted(words) - sorted xxhash64 array of a word array", ""),
      (args: Seq[Expression]) => XxHash64Sorted(args.head)))
    ext.injectFunction((
      FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[ZOrder2].getName, null, "zorder2",
        "zorder2(x, y) - 42-bit Morton (Z-order) interleave of two ints", ""),
      (args: Seq[Expression]) => ZOrder2(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, null, "word_ngrams",
        "word_ngrams(words, n) - consecutive space-joined word n-grams", ""),
      GraftFunctions.wordNgramsBuilder _))
    ext.injectFunction((
      FunctionIdentifier("ngram_hashes_sorted"),
      new ExpressionInfo(classOf[NgramHashesSorted].getName, null,
        "ngram_hashes_sorted",
        "ngram_hashes_sorted(words, n) - sorted xxhash64 of distinct word n-grams",
        ""),
      GraftFunctions.ngramHashesBuilder _))
    ext.injectFunction((
      FunctionIdentifier("graft_levenshtein"),
      new ExpressionInfo(classOf[LevenshteinFast].getName, null,
        "graft_levenshtein",
        "graft_levenshtein(a, b) - exact Levenshtein distance, bit-parallel",
        ""),
      GraftFunctions.levenshteinFastBuilder _))
    // opt-in similarity-join rewrites (spark.graft.cosineJoinRewrite.enabled
    // / spark.graft.jaccardJoinRewrite.enabled)
    ext.injectOptimizerRule(_ => graft.plans.CosineJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.JaccardJoinRewrite)
  }
}
