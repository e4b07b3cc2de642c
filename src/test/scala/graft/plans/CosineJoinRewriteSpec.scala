package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The opt-in similarity-join rewrite: a naive O(n²) cosine-threshold join
  * becomes an LSH-bucketed equi-join with exact verify. */
class CosineJoinRewriteSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    graft.functions.GraftFunctions.register(spark)
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ CosineJoinRewrite
    spark.conf.set(CosineJoinRewrite.EnabledKey, "true")
    try f finally {
      spark.conf.set(CosineJoinRewrite.EnabledKey, "false")
      spark.experimental.extraOptimizations = before
    }
  }

  /** 60 pseudo-random 16-dim vectors + 12 exact duplicates (ids 100+i). */
  private def corpus() = {
    val rnd = new scala.util.Random(13)
    val base = (0L until 60L).map(i =>
      i -> IndexedSeq.fill(16)(rnd.nextFloat() * 2 - 1))
    val dups = (0L until 12L).map(i => (100L + i) -> base(i.toInt)._2)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(
      java.util.Arrays.asList((base ++ dups).map { case (id, v) =>
        Row(id, v) }: _*), schema)
  }

  private val naiveSql =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |FROM vecs a JOIN vecs b
      |  ON a.vec_id < b.vec_id
      | AND cosine_sim(a.embedding, b.embedding) >= 0.999
      |ORDER BY id_a, id_b""".stripMargin

  test("rewrite turns the nested-loop cosine join into a bucketed equi-join") {
    corpus().createOrReplaceTempView("vecs")
    graft.functions.GraftFunctions.register(spark)
    val naive = spark.sql(naiveSql).queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin") ||
      naive.contains("CartesianProduct"), naive.take(800))
    withRule {
      val plan = spark.sql(naiveSql).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(1500))
      assert(plan.contains("lsh_buckets") || plan.contains("explode"),
        plan.take(1500))
    }
  }

  test("rewrite keeps precision 1 and finds every exact duplicate exactly once") {
    corpus().createOrReplaceTempView("vecs")
    graft.functions.GraftFunctions.register(spark)
    val exact = spark.sql(naiveSql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = withRule {
      spark.sql(naiveSql).collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    // no duplicates (lowest-shared-bucket emission) and no false positives
    // (the original cosine conjunct is kept as the exact verify)
    assert(approx.length == approx.toSet.size, "pair emitted more than once")
    assert(approx.toSet.subsetOf(exact), s"false positives: ${approx.toSet -- exact}")
    // identical vectors share every bucket -> all 12 planted pairs found
    (0L until 12L).foreach { i =>
      assert(approx.contains((i, 100L + i)), s"exact-dup pair ($i, ${100 + i}) missed")
    }
  }

  test("rule is inert when disabled and for non-cosine joins") {
    corpus().createOrReplaceTempView("vecs")
    graft.functions.GraftFunctions.register(spark)
    // flag off (default): plan unchanged even with the rule registered
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ CosineJoinRewrite
    try {
      val plan = spark.sql(naiveSql).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct"))
    } finally spark.experimental.extraOptimizations = before
    // enabled, but an ordinary equi-join must pass through untouched
    withRule {
      val df = spark.sql(
        "SELECT a.vec_id FROM vecs a JOIN vecs b ON a.vec_id = b.vec_id")
      assert(df.count() == 72)
      assert(!df.queryExecution.executedPlan.toString.contains("lsh_buckets"))
    }
  }

  test("optimizer rewrite of the naive x63 SQL agrees with the hand-built pipeline") {
    // end-to-end proof the rule is a drop-in for ext.Dedup-style hand
    // plumbing: the natural O(n²) SQL a user would write over the SAME
    // planted corpus as the x63 driver row, run through the enabled rule,
    // must emit byte-identical rows to Similarity.cosineDupPairsPlanted
    // (both paths: LSH candidates + exact cosine verify at 0.9)
    graft.functions.GraftFunctions.register(spark)
    graft.ext.Similarity.plantedVecs(spark, sfDir)
      .createOrReplaceTempView("pv_planted")
    val naive =
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       CAST(CAST(ROUND(cosine_sim(a.embedding, b.embedding), 4)
        |            AS DECIMAL(18,4)) AS DOUBLE) AS cosim
        |FROM pv_planted a JOIN pv_planted b
        |  ON a.vec_id < b.vec_id
        | AND cosine_sim(a.embedding, b.embedding) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin
    val (viaRule, plan) = withRule {
      val df = spark.sql(naive)
      (df.collect().map(_.toString).toSeq,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1500))
    val hand = graft.ext.Similarity.cosineDupPairsPlanted(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(viaRule == hand,
      s"rule=${viaRule.mkString(";")} hand=${hand.mkString(";")}")
    assert(viaRule.size == 6, "expected the 6 planted pairs")
  }

  test("lsh_buckets expression: deterministic, codegen, identical vectors collide") {
    graft.functions.GraftFunctions.register(spark)
    corpus().createOrReplaceTempView("vecs")
    import org.apache.spark.sql.functions.{col, expr}
    val sel = corpus().select(col("vec_id"),
      expr("lsh_buckets(embedding)").as("b"))
    val rows = sel.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // one strictly-increasing bucket id per table, distinct across tables
    rows.values.foreach { b =>
      assert(b.length == graft.functions.LshBuckets.DefaultTables)
      assert(b == b.sorted && b.distinct.length == b.length)
    }
    // planted duplicates collide on every table
    (0L until 12L).foreach(i => assert(rows(i) == rows(100L + i)))
    // interpreted eval path agrees with codegen
    val dup = sel.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(dup == rows)
  }
}
