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
