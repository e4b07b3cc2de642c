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
}
