package graft.ext

import graft.{SparkSpec, Tables}

/** LSH-ANN vs the exact brute-force baseline (x55's SQL). */
class SimilaritySpec extends SparkSpec {

  private def bruteTop5: Map[Long, Set[Long]] = {
    Tables.ensure(spark, sfDir)
    val q = graft.ext.Extensions.all.find(_.name == "x55_ann_topk").get.spark
    spark.sql(q).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
  }

  test("cosine near-dup pairs: exact dups always found, verified exact, empty on corpus") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    graft.functions.GraftFunctions.register(spark)
    // synthetic corpus: 40 base vectors + 10 exact duplicates (ids 100+i of i)
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map(i =>
      i -> IndexedSeq.fill(16)(rnd.nextFloat() * 2 - 1))
    val dups = (0L until 10L).map(i => (100L + i) -> base(i.toInt)._2)
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding",
        ArrayType(FloatType))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList((base ++ dups).map { case (id, v) =>
        Row(id, v) }: _*), schema)
    val pairs = Similarity.cosineDupPairsOf(df, threshold = 0.999).collect()
    // identical vectors share every LSH bucket -> recall 1 by construction
    (0L until 10L).foreach { i =>
      assert(pairs.exists(r => r.getLong(0) == i && r.getLong(1) == 100L + i),
        s"exact duplicate pair ($i, ${100 + i}) missed")
    }
    // every reported pair really is above threshold (exact verify ran)
    pairs.foreach(r => assert(r.getDouble(2) >= 0.999))
    // and the driver-facing corpus query is legitimately empty (max cos ~0.45)
    assert(Similarity.cosineDupPairs(spark, sfDir).count() == 0)
  }

  test("cosine near-dup plan has no unblocked all-pairs stage") {
    val plan = Similarity.cosineDupPairs(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("lsh topk returns at most k rows per query, deterministically") {
    val a = Similarity.lshTopK(spark, sfDir).collect()
    val b = Similarity.lshTopK(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    a.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 5)
    }
  }

  test("ivf probe achieves nontrivial recall vs brute force top-5") {
    val ivf = Similarity.ivfTopK(spark, sfDir).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val brute = bruteTop5
    val recalls = brute.toSeq.map { case (q, truth) =>
      ivf.get(q).map(c => (c & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.25, s"mean ivf recall $mean too low: $recalls")
  }

  test("ivf with iters=0 is deterministic across runs") {
    val a = Similarity.ivfTopK(spark, sfDir).collect().map(_.toString).toSeq
    val b = Similarity.ivfTopK(spark, sfDir).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("lsh candidates achieve nontrivial recall vs brute force top-5") {
    val lsh = Similarity.lshTopK(spark, sfDir).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val brute = bruteTop5
    val recalls = brute.toSeq.map { case (q, truth) =>
      lsh.get(q).map(c => (c & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // Random-hyperplane LSH on near-orthogonal vectors: recall is the
    // tables×planes tradeoff, not 1.0. Bound it away from "broken".
    assert(mean >= 0.25, s"mean recall $mean too low: $recalls")
  }

  test("planted near-dup view emits exactly the 6 planted pairs through LSH + exact verify") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Similarity.cosineDupPairsPlanted(spark, sfDir).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L to 2L).map(i => (i, 1000000L + i)).toSet ++
      (3L to 5L).map(i => (i, 2000000L + i)).toSet
    // ε-perturbed pairs (cosine ≈0.987) surviving the 8-table bucketing is
    // an empirical property of this corpus + hash family — this spec is
    // the canary ADVICE asked for before trusting the driver oracle row
    assert(got == expected, s"got $got")
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= 0.98 && c <= 1.0, s"cosim $c outside planted range")
    }
  }

  test("near-dup verify join carries no broadcast hint (corpus-sized build side)") {
    // r2 verdict: forcing a broadcast of the full embeddings table OOMs at
    // scale; the id equi-join must be left to Catalyst/AQE. Pin the
    // absence of any hint in the analyzed plan for both entry points.
    Seq(Similarity.cosineDupPairs(spark, sfDir),
        Similarity.cosineDupPairsPlanted(spark, sfDir)).foreach { df =>
      val plan = df.queryExecution.analyzed.toString
      assert(!plan.contains("ResolvedHint"), plan.take(1500))
    }
  }

  test("lsh recall check asserts per-query recall over the exact floor") {
    val rows = Similarity.lshRecallCheck(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getBoolean(1),
      s"x59 recall below 4/5 for qid ${r.getLong(0)}"))
  }

  test("ivf recall check asserts corpus-level recall over the exact floor") {
    val rows = Similarity.ivfRecallCheck(spark, sfDir).collect()
    assert(rows.length == 10)
    // corpus-level boolean: identical on every row by construction
    assert(rows.map(_.getBoolean(1)).toSet == Set(true))
    // floor_cos is the exact 5th-best cosine per query — positive and <= 1
    rows.foreach(r => assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1.0))
  }

  test("lsh_buckets_m3 kernel reproduces the aggregation formulation's " +
       "buckets bit-identically") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    Tables.ensure(spark, sfDir)
    val vecs = spark.table("embeddings")
      .select(col("vec_id"), col("embedding"))
    for ((nt, pp) <- Seq((8, 4), (16, 4), (8, 6))) {
      // the pre-r15 formulation: posexplode -> one SUM column per
      // (table, plane) with murmur3-parity signs -> bucket bits
      val pos = vecs.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      val aggs = for { t <- 0 until nt; j <- 0 until pp } yield
        sum(col("x").cast("double") *
          when(pmod(hash(lit(t), lit(j), col("i") + 1), lit(2)) === 0, 1.0)
            .otherwise(-1.0)).as(s"p_${t}_$j")
      val projs = pos.groupBy("vec_id").agg(aggs.head, aggs.tail: _*)
      val bvCols = (0 until nt).map { t =>
        (0 until pp).map(j =>
          when(col(s"p_${t}_$j") > 0, lit(1 << j)).otherwise(lit(0)))
          .reduce(_ + _).as(s"bv_$t")
      }
      val oldB = projs.select(col("vec_id") +: bvCols: _*)
        .select(col("vec_id"), explode(array((0 until nt).map(t =>
          struct(lit(t).as("tbl"), col(s"bv_$t").as("bv"))): _*)).as("b"))
        .select(col("vec_id"), col("b.tbl").as("tbl"), col("b.bv").as("bv"))
      val newB = Similarity.withBuckets(vecs, nt, pp)
        .select("vec_id", "tbl", "bv")
      assert(newB.exceptAll(oldB).isEmpty && oldB.exceptAll(newB).isEmpty,
        s"bucket mismatch at tables=$nt planes=$pp")
    }
  }
}
