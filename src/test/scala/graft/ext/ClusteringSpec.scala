package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  test("x90 assignment matches a driver-side brute-force argmax exactly") {
    val out = Clustering.assignQuery(spark, sfDir).collect()
    Tables.ensure(spark, sfDir)
    val vecs = spark.table("embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val centroids = (0 until 8).map(c => c -> vecs(c.toLong))
    assert(out.length == vecs.size)
    out.foreach { r =>
      val (vid, cid) = (r.getLong(0), r.getInt(1))
      val best = centroids
        .map { case (c, v) =>
          (math.floor(cos(vecs(vid), v) * 1e6 + 0.5) / 1e6, c)
        }
        .maxBy { case (s, c) => (s, -c) }._2
      assert(cid == best, s"vec $vid assigned $cid, brute force says $best")
    }
  }

  test("assignment scores the corpus against a broadcast centroid side") {
    val plan = Clustering.assignQuery(spark, sfDir).queryExecution
      .executedPlan.toString
    assert(plan.contains("Broadcast"), s"no broadcast in plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "centroid join must not shuffle the corpus")
  }

  test("Lloyd iterations never decrease the mean-cosine objective") {
    val obj0 = Clustering.objective(Clustering.kmeans(spark, sfDir, k = 8, iters = 0))
    val obj2 = Clustering.objective(Clustering.kmeans(spark, sfDir, k = 8, iters = 2))
    val obj4 = Clustering.objective(Clustering.kmeans(spark, sfDir, k = 8, iters = 4))
    // tiny tolerance: the rounded-6 assignment can flip a boundary vector
    assert(obj2 >= obj0 - 1e-6, s"iter 2 objective $obj2 < init $obj0")
    assert(obj4 >= obj2 - 1e-6, s"iter 4 objective $obj4 < iter 2 $obj2")
  }

  test("x91 semdedup drops the planted copies, keeps their originals") {
    val rows = Clustering.semDedupQuery(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // exact copies (vec_id+2000000 of 3..5) share their original's cluster
    // and sit at cosine 1.0 — keep-first must drop the copy, not the
    // original (the original's id is smaller)
    (3L to 5L).foreach { id =>
      assert(rows(id + 2000000) == false, s"planted copy of $id not dropped")
      assert(rows(id) == true, s"original $id wrongly dropped")
    }
  }

  test("x91 similarity join is keyed on the cluster id, not all-pairs") {
    val plan = Clustering.semDedupQuery(spark, sfDir).queryExecution
      .executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"all-pairs similarity join:\n$plan")
    // the assignment is checkpointed before the self-join, so the final
    // plan must contain NO nested-loop join at all — the within-cluster
    // pair join is an equi-join on cid over the materialized assignment
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"pair join not keyed on cid:\n$plan")
  }

  test("kmeans is deterministic across runs and covers every vector") {
    val a = Clustering.kmeans(spark, sfDir, k = 8, iters = 2)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    val b = Clustering.kmeans(spark, sfDir, k = 8, iters = 2)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a.sameElements(b), "two identical runs diverged")
    Tables.ensure(spark, sfDir)
    assert(a.length == spark.table("embeddings").count())
    assert(a.map(_._2).distinct.length > 1, "all vectors in one cluster")
  }
}
