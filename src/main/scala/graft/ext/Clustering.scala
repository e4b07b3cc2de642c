package graft.ext

import Stages.StageOps
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding clustering — the SemDeDup building block: assign every vector
  * to its nearest centroid, so near-duplicate pruning / diversity sampling
  * can run per cluster instead of across the whole corpus.
  *
  * The reference has no clustering operator (its engine is an OLTP
  * prototype, `db/src/db.rs`); this extends the similarity-search family
  * (SURVEY.md §2 B72, x55/x59/x62) with the partition-then-prune shape a
  * training-data pipeline needs at crawl scale.
  *
  * Scale shape: centroids are tiny (k × dim doubles) and are BROADCAST;
  * scoring is a map-side cross join (N × k rows, no shuffle of the big
  * side), the per-vector argmax is a partial aggregate (map-side combine,
  * one shuffle keyed on vec_id), and the Lloyd update is one aggregation
  * keyed on cluster id. Nothing global ever shuffles the corpus; the
  * driver holds only the k×dim centroid matrix between iterations.
  */
object Clustering {

  /** x90 driver query — one deterministic assignment pass: centroids are
    * the embeddings of `vec_id < k` (reproducible init, no RNG), each
    * vector goes to the centroid with the highest cosine (ties at 6
    * decimals break to the lowest centroid id — same rule as x55's
    * ROW_NUMBER ordering, so a DuckDB twin can replay the argmax exactly).
    * Output doubles are rounded/DECIMAL-pinned like every other row. */
  def assignQuery(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.ensure(spark, dir)
    val e = spark.table("embeddings")
    val c = e.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cemb"))
    // FLOOR(x·10^n + 0.5)/10^n, never ROUND: Spark rounds the shortest
    // decimal rendering half-up while DuckDB rounds the binary value, and
    // they diverge on exact-looking halves (0.08045 → .0805 vs .0804);
    // the floor form is the same IEEE ops on the same bits in both engines
    val scored = e.crossJoin(broadcast(c))
      .select(col("vec_id"),
        col("cid"),
        expr("FLOOR(cosine_sim(embedding, cemb) * 1e6 + 0.5) / 1e6").as("cos"))
    // argmax as a partial aggregate, not a window: max(struct) picks the
    // highest cos, then the highest -cid = LOWEST cid on a rounded tie
    scored.groupBy("vec_id")
      .agg(max(struct(col("cos"), (-col("cid")).as("ncid"))).as("b"))
      .select(col("vec_id"),
        (-col("b.ncid")).cast("int").as("cid"),
        expr("CAST(CAST(FLOOR(b.cos * 1e4 + 0.5) / 1e4 AS DECIMAL(18,4)) AS DOUBLE)")
          .as("cos"))
      .orderBy("vec_id")
  }

  /** Spherical k-means (Lloyd): `iters` rounds of assign → mean update.
    * Deterministic: init = embeddings of `vec_id < k`; the update sums in
    * a fixed element-wise aggregate (FP association differs from a serial
    * sum, but identically across runs of the same data/partitioning —
    * pinned by the determinism spec). Cosine is scale-invariant so the
    * mean needs no normalization. Returns (vec_id, cid, cos) at the final
    * assignment. Empty clusters keep their previous centroid. */
  def kmeans(spark: SparkSession, dir: String, k: Int = 8,
             iters: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.ensure(spark, dir)
    val e = spark.table("embeddings").select("vec_id", "embedding")
      .stageMaterialize // iterated over; cut lineage once
    val dim = e.select(size(col("embedding"))).head.getInt(0)

    var centroids: Array[(Int, Array[Double])] =
      e.filter(col("vec_id") < k).orderBy("vec_id").collect()
        .zipWithIndex.map { case (r, i) =>
          i -> r.getSeq[Float](1).map(_.toDouble).toArray
        }

    def assigned: DataFrame = {
      val c = spark.createDataFrame(centroids.toSeq.map { case (cid, v) =>
        (cid, v.map(_.toFloat))
      }).toDF("cid", "cemb")
      e.crossJoin(broadcast(c))
        .select(col("vec_id"), col("cid"),
          expr("FLOOR(cosine_sim(embedding, cemb) * 1e6 + 0.5) / 1e6").as("cos"))
        .groupBy("vec_id")
        .agg(max(struct(col("cos"), (-col("cid")).as("ncid"))).as("b"))
        .select(col("vec_id"), (-col("b.ncid")).cast("int").as("cid"),
          col("b.cos"))
    }

    (0 until iters).foreach { _ =>
      // Lloyd update: element-wise mean per cluster — one aggregation
      // keyed on cid; the unpivot is posexplode so the sum is per (cid,
      // dimension) and recombines with array_agg sorted by position
      val byId = assigned
        .join(e, "vec_id")
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cid", "pos").agg(avg(col("v")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          val v = new Array[Double](dim)
          rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
          cid -> v
        }
      centroids = centroids.map { case (cid, old) =>
        cid -> byId.getOrElse(cid, old)
      }
    }
    assigned
  }

  /** Mean best-cosine of an assignment — the (maximization) objective the
    * Lloyd iterations must not decrease. */
  def objective(assignment: DataFrame): Double =
    assignment.agg(avg(col("cos"))).head.getDouble(0)

  /** x91 driver query — SemDeDup end-to-end: cluster the corpus
    * ([[assignQuery]]'s broadcast argmax, here over the x63 planted-dup
    * view so the pruning is non-vacuous), then WITHIN each cluster drop
    * every vector that has a smaller-id neighbor at cosine ≥ `threshold`
    * (keep-first, the same deterministic policy as x89's paragraph dedup —
    * no sequential greedy-MIS dependency, so the drop set is one
    * aggregation).
    *
    * Scale shape — the whole point of SemDeDup: the quadratic similarity
    * join runs per cluster, never across the corpus, so its cost is
    * Σ|cluster|² with |cluster| ≈ N/k controlled by k; the join shuffles on
    * cid, the drop set is a DISTINCT on vec_id, and nothing collects.
    * Every cosine is floor-rounded at 6 decimals (the cross-engine-safe
    * form) so the DuckDB twin replays assignment AND pruning exactly. */
  def semDedupQuery(spark: SparkSession, dir: String, k: Int = 8,
                    threshold: Double = 0.9): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.ensure(spark, dir)
    val v = Similarity.plantedVecs(spark, dir)
    val c = spark.table("embeddings").filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cemb"))
    val assigned = v.crossJoin(broadcast(c))
      .select(col("vec_id"), col("embedding"), col("cid"),
        expr("FLOOR(cosine_sim(embedding, cemb) * 1e6 + 0.5) / 1e6").as("cos"))
      .groupBy("vec_id")
      .agg(max(struct(col("cos"), (-col("cid")).as("ncid"))).as("b"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), (-col("b.ncid")).cast("int").as("cid"),
        col("embedding"))
      // reused by both sides of the pair join AND the final projection —
      // materialize once instead of re-scanning and re-assigning 3×
      .stageMaterialize
    val dropped = assigned.alias("a").join(assigned.alias("b"),
        col("a.cid") === col("b.cid") &&
          col("a.vec_id") < col("b.vec_id") &&
          expr("FLOOR(cosine_sim(a.embedding, b.embedding) * 1e6 + 0.5) / 1e6")
            >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
      .withColumn("dr", lit(true))
    assigned.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("dr").isNull.as("kept"))
      .orderBy("vec_id")
  }
}
