package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The opt-in text near-dup join rewrite: a naive O(n²) jaccard-threshold
  * join becomes a MinHash band-bucketed equi-join with exact verify. */
class JaccardJoinRewriteSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    graft.functions.GraftFunctions.register(spark)
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ JaccardJoinRewrite
    spark.conf.set(JaccardJoinRewrite.EnabledKey, "true")
    try f finally {
      spark.conf.set(JaccardJoinRewrite.EnabledKey, "false")
      spark.experimental.extraOptimizations = before
    }
  }

  /** 40 docs of 20 distinct words each over disjoint vocab slices, plus 8
    * exact duplicates (ids 100+i) and 6 near-duplicates (ids 200+i: one
    * word of 20 replaced → jaccard 19/21 ≈ 0.905). */
  private def corpus() = {
    def doc(i: Int): String =
      (0 until 20).map(k => s"w${i}_$k").mkString(" ")
    val base = (0 until 40).map(i => i.toLong -> doc(i))
    val dups = (0 until 8).map(i => (100L + i) -> doc(i))
    val nears = (0 until 6).map { i =>
      val ws = doc(i).split(" ").toVector.updated(7, s"swapped_$i")
      (200L + i) -> ws.mkString(" ")
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    spark.createDataFrame(
      java.util.Arrays.asList((base ++ dups ++ nears).map { case (id, t) =>
        Row(id, t) }: _*), schema)
  }

  private val naiveSql =
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |FROM docs a JOIN docs b
      |  ON a.doc_id < b.doc_id
      | AND jaccard_sim(a.text, b.text) >= 0.9
      |ORDER BY id_a, id_b""".stripMargin

  test("rewrite turns the nested-loop jaccard join into a banded equi-join") {
    corpus().createOrReplaceTempView("docs")
    graft.functions.GraftFunctions.register(spark)
    val naive = spark.sql(naiveSql).queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin") ||
      naive.contains("CartesianProduct"), naive.take(800))
    withRule {
      val plan = spark.sql(naiveSql).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(1500))
      assert(plan.contains("minhash_band_keys") || plan.contains("explode"),
        plan.take(1500))
    }
  }

  test("rewrite keeps precision 1 and finds planted dup + near-dup pairs") {
    corpus().createOrReplaceTempView("docs")
    graft.functions.GraftFunctions.register(spark)
    val exact = spark.sql(naiveSql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = withRule {
      spark.sql(naiveSql).collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    // no duplicates (lowest-shared-key emission) and no false positives
    // (the original jaccard conjunct is kept as the exact verify)
    assert(approx.length == approx.toSet.size, "pair emitted more than once")
    assert(approx.toSet.subsetOf(exact),
      s"false positives: ${approx.toSet -- exact}")
    // identical docs share every band → all 8 exact-dup pairs found
    (0 until 8).foreach { i =>
      assert(approx.contains((i.toLong, 100L + i)),
        s"exact-dup pair ($i, ${100 + i}) missed")
    }
    // near-dups at j ≈ 0.905: recall 1 − (1 − j⁴)¹⁶ ≈ 1 − 3·10⁻⁸, and the
    // fixed hash family makes the outcome deterministic
    (0 until 6).foreach { i =>
      assert(approx.contains((i.toLong, 200L + i)),
        s"near-dup pair ($i, ${200 + i}) missed")
    }
  }

  test("rule is inert when disabled and for non-jaccard joins") {
    corpus().createOrReplaceTempView("docs")
    graft.functions.GraftFunctions.register(spark)
    // flag off (default): plan unchanged even with the rule registered
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ JaccardJoinRewrite
    try {
      val plan = spark.sql(naiveSql).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct"))
    } finally spark.experimental.extraOptimizations = before
    // enabled, but an ordinary equi-join must pass through untouched
    withRule {
      val df = spark.sql(
        "SELECT a.doc_id FROM docs a JOIN docs b ON a.doc_id = b.doc_id")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("minhash_band_keys"), plan.take(800))
      assert(df.count() == 54)
    }
  }

  test("x65 driver row executes the banded plan and recall holds on testdata") {
    val df = graft.ext.Dedup.jaccardRewriteRecallCheck(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the naive join must actually have been rewritten: banded equi-join,
    // no quadratic fallback anywhere in the driver row's plan
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1500))
    assert(plan.contains("minhash_band_keys"), plan.take(1500))
    val rows = df.collect()
    assert(rows.nonEmpty, "no set-equal pairs in testdata — fixture sanity")
    rows.foreach(r => assert(r.getAs[Boolean]("found"), r.toString))
  }

  test("jaccard_sim semantics: word sets, empties, and symmetry") {
    graft.functions.GraftFunctions.register(spark)
    def j(a: String, b: String): Double =
      spark.sql(s"SELECT jaccard_sim('$a', '$b')").head.getDouble(0)
    assert(j("a b c", "a b c") == 1.0)
    assert(j("a b c d", "a b c x") == 0.6) // 3 / 5
    assert(j("a a b b", "b a") == 1.0)     // distinct word SETS
    assert(j("", "") == 1.0)               // both empty: identical docs
    assert(j("a", "") == 0.0)
    assert(j("A b C", "a B c") == 1.0)     // lowercase fold
    // empty docs still pair up through the banded path (sentinel key)
    spark.createDataFrame(java.util.Arrays.asList(
        Row(1L, ""), Row(2L, ""), Row(3L, "x y z")),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .createOrReplaceTempView("docs")
    val pairs = withRule {
      spark.sql(naiveSql).collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(pairs.toSeq == Seq((1L, 2L)))
  }
}
