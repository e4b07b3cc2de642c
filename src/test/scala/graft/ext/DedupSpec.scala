package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property tests for the hash-based dedup sketches (no DuckDB twin exists
  * for murmur3/xxhash64, so correctness is pinned by invariants against the
  * exact computations on the same data).
  */
class DedupSpec extends SparkSpec {

  /** Ground truth: pairs of docs with IDENTICAL distinct-word bags. */
  private lazy val bagDupPairs: Set[(Long, Long)] = {
    val w = Dedup.docWords(spark, sfDir)
      .select(col("doc_id"), array_join(array_sort(col("words")), " ").as("bag"))
    w.as("a").join(w.as("b"),
        col("a.bag") === col("b.bag") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("testdata actually contains word-bag duplicates (fixture sanity)") {
    assert(bagDupPairs.nonEmpty)
  }

  test("PPJoin ngramJaccard matches the co-occurrence-join formulation") {
    // two structurally independent exact algorithms over the same data:
    // prefix-filter + bitset verify vs token co-occurrence counting
    graft.Tables.ensure(spark, sfDir)
    val ref = spark.sql(Extensions.all
        .find(_.name == "x54_ngram_jaccard").get.spark)
      .collect().map(_.toString).sorted.toSeq
    val got = Dedup.ngramJaccard(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(got == ref,
      s"PPJoin=${got.length} rows, co-occurrence=${ref.length} rows")
  }

  test("ngramJaccard is invariant to shuffle parallelism (cluster-reconfig safety)") {
    val conf = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "4")
      val a = Dedup.ngramJaccard(spark, sfDir).collect().map(_.toString).toSeq
      spark.conf.set(conf, "13")
      val b = Dedup.ngramJaccard(spark, sfDir).collect().map(_.toString).toSeq
      assert(a == b)
    } finally spark.conf.set(conf, orig)
  }

  test("ngramJaccard plan has no unblocked all-pairs stage") {
    val plan = Dedup.ngramJaccard(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("minhash candidates include every identical-bag pair (j=1 recall)") {
    val found = Dedup.minhashPairs(spark, sfDir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = bagDupPairs -- found
    assert(missed.isEmpty, s"minhash missed exact-bag dups: $missed")
  }

  test("minhash estimate tracks exact jaccard within 0.2 on candidates") {
    val rows = Dedup.minhashPairs(spark, sfDir)
      .select("est_j", "jaccard").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.2,
        s"est=${r.getDouble(0)} exact=${r.getDouble(1)}")
    }
  }

  test("identical-bag pairs have simhash hamming distance 0") {
    val sig = Dedup.simhashPairs(spark, sfDir, maxHamming = 0)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = bagDupPairs -- sig
    assert(missed.isEmpty, s"simhash separated exact-bag dups: $missed")
  }

  test("simhash pairs report symmetric-difference-sensitive hamming") {
    val rows = Dedup.simhashPairs(spark, sfDir, maxHamming = 3).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("hamming") <= 3))
  }

  test("signatures are deterministic across runs") {
    val a = Dedup.signatures(Dedup.docWords(spark, sfDir))
      .orderBy("doc_id").limit(5).collect().map(_.toString).toSeq
    val b = Dedup.signatures(Dedup.docWords(spark, sfDir))
      .orderBy("doc_id").limit(5).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
