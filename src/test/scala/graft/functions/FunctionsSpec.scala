package graft.functions

import graft.{SparkSpec, Tables}
import graft.ext.Dedup
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  test("cosine_sim matches the higher-order-function formulation exactly") {
    GraftFunctions.register(spark)
    Tables.ensure(spark, sfDir)
    val diff = spark.sql(
      """SELECT MAX(ABS(
        |  cosine_sim(a.embedding, b.embedding) -
        |  AGGREGATE(ZIP_WITH(a.embedding, b.embedding,
        |      (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |    CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
        |  / (SQRT(AGGREGATE(a.embedding, CAST(0.0 AS DOUBLE),
        |      (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
        |   * SQRT(AGGREGATE(b.embedding, CAST(0.0 AS DOUBLE),
        |      (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |)) AS d
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id""".stripMargin)
      .head.getDouble(0)
    assert(diff == 0.0, s"max divergence $diff")
  }

  test("cosine_sim stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    Tables.ensure(spark, sfDir)
    val plan = spark.sql(
      "SELECT cosine_sim(embedding, embedding) FROM embeddings")
      .queryExecution.executedPlan.toString
    // codegen'd stages print as "*(n) Operator" in the executed plan
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"), plan)
  }

  test("cosine_sim null and degenerate inputs") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS a,
        |       cosine_sim(array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS b,
        |       cosine_sim(array(CAST(3.0 AS FLOAT)), array(CAST(4.0 AS FLOAT))) AS c""".stripMargin)
      .head
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 0.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }


  test("sorted_intersect_count matches size(array_intersect) on random sorted sets") {
    GraftFunctions.register(spark)
    // ScalaCheck-style sweep without the boilerplate: 200 deterministic
    // random sorted distinct int-array pairs, empty arrays included
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { _ =>
      def arr() = {
        val n = rnd.nextInt(60)
        (0 until n).map(_ => rnd.nextInt(80)).distinct.sorted
      }
      (arr(), arr())
    }
    import spark.implicits._
    val df = rows.toDF("a", "b").selectExpr(
      "sorted_intersect_count(a, b) AS fast",
      "size(array_intersect(a, b)) AS ref")
    val bad = df.filter(col("fast") =!= col("ref")).count()
    assert(bad == 0, s"$bad mismatching pairs")
  }

  test("sorted_jaccard_ge early-exit bounds agree with the exact merge, incl. boundary t") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(13)
    def naiveJac(a: Array[Long], b: Array[Long]): Double = {
      if (a.isEmpty && b.isEmpty) return 1.0
      if (a.isEmpty || b.isEmpty) return 0.0
      val c = a.toSet.intersect(b.toSet).size
      c.toDouble / (a.length + b.length - c).toDouble
    }
    (0 until 500).foreach { _ =>
      def arr() = {
        val n = rnd.nextInt(40)
        (0 until n).map(_ => rnd.nextInt(50).toLong).distinct.sorted.toArray
      }
      val (a, b) = (arr(), arr())
      val (ad, bd) = (new GenericArrayData(a), new GenericArrayData(b))
      val jac = naiveJac(a, b)
      // sweep generic thresholds plus the pair's own exact jaccard — the
      // adversarial case for the size/merge early-exits: ge must hold AT
      // the boundary, strict must not
      Seq(0.0, 0.1, 0.5, 0.8, 0.9, 1.0, jac).foreach { t =>
        assert(TextSketch.sortedJaccardGe(ad, bd, t, false) == (jac >= t),
          s"ge: jac=$jac t=$t na=${a.length} nb=${b.length}")
        assert(TextSketch.sortedJaccardGe(ad, bd, t, true) == (jac > t),
          s"gt: jac=$jac t=$t na=${a.length} nb=${b.length}")
      }
    }
  }

  test("sorted_intersect_count stays inside whole-stage codegen and handles nulls") {
    GraftFunctions.register(spark)
    val plan = spark.sql(
      "SELECT sorted_intersect_count(array(1,2,3), array(2,3,4))")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"), plan)
    val r = spark.sql(
      """SELECT sorted_intersect_count(CAST(NULL AS ARRAY<INT>), array(1)) AS a,
        |       sorted_intersect_count(CAST(array() AS ARRAY<INT>), array(1, 2)) AS b,
        |       sorted_intersect_count(array(1, 2, 3), array(2, 3, 4)) AS c""".stripMargin)
      .head
    assert(r.isNullAt(0))
    assert(r.getInt(1) == 0)
    assert(r.getInt(2) == 2)
  }

  test("xxhash64_sorted matches the sorted-transform-lambda formulation exactly") {
    GraftFunctions.register(spark)
    val bad = Dedup.docWords(spark, sfDir).selectExpr(
        "xxhash64_sorted(words) AS fast",
        "array_sort(transform(words, w -> xxhash64(w))) AS ref")
      .filter(expr("fast <> ref")).count()
    assert(bad == 0, s"$bad mismatching docs")
  }

  test("simhash64 matches the explode/aggregate formulation exactly") {
    GraftFunctions.register(spark)
    // reference: the 64-conditional-sum aggregation the expression replaced
    val toks = Dedup.docWords(spark, sfDir)
      .filter(size(col("words")) > 0)
      .select(col("doc_id"), explode(col("words")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val aggs = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b"))
    val ref = toks.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("ref"))
    val bad = Dedup.docWords(spark, sfDir)
      .selectExpr("doc_id", "simhash64(words) AS fast")
      .join(ref, "doc_id")
      .filter(col("fast") =!= col("ref")).count()
    assert(bad == 0, s"$bad mismatching docs")
  }

  test("minhash_signature is map-only and stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = Dedup.docWords(spark, sfDir)
      .selectExpr("doc_id", "minhash_signature(words) AS sig")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"), plan)
    assert(!plan.contains("Exchange"), plan) // zero shuffle: per-row sketch
    // each signature element is the min over words of murmur3(bytes, seed=i)
    val r = spark.sql(
      "SELECT minhash_signature(array('alpha', 'beta')) AS sig").head
    val expected = (0 until 64).map(i =>
      math.min(MinHashAgg.hashTok("alpha", i), MinHashAgg.hashTok("beta", i)))
    assert(r.getSeq[Int](0) == expected)
  }

  test("minhash_sig UDAF produces the same signatures as the agg-column path") {
    GraftFunctions.register(spark)
    val words = Dedup.docWords(spark, sfDir)
    val viaAgg = Dedup.signatures(words)
      .selectExpr("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val viaUdaf = words.select(col("doc_id"), explode(col("words")).as("tok"))
      .groupBy("doc_id").agg(expr("minhash_sig(tok)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(viaAgg.keySet == viaUdaf.keySet)
    viaAgg.foreach { case (id, sig) =>
      assert(sig.toSeq == viaUdaf(id), s"signature mismatch for doc $id")
    }
  }

  test("minhash_sig partial aggregation runs map-side") {
    GraftFunctions.register(spark)
    val words = Dedup.docWords(spark, sfDir)
    val plan = words.select(col("doc_id"), explode(col("words")).as("tok"))
      .groupBy("doc_id").agg(expr("minhash_sig(tok)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_minhashagg") ||
      plan.toLowerCase.contains("partial"), plan)
  }
}
