package graft.ext

import Stages.StageOps
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.{coalesce, col, least, lit, min}

/** Distributed connected components over a near-duplicate pair graph.
  *
  * The dedup pipelines (x54/x57/x63) emit PAIRS; turning pairs into
  * dedup GROUPS (keep one representative per component) needs the
  * transitive closure, which no single join can express. This operator
  * computes it with iterated min-label propagation:
  *
  *   label(v) <- min(label(v), min over neighbours u of label(u))
  *
  * run until a fixpoint. Every iteration is one shuffle join + one
  * partial-aggregated groupBy — fully distributed, no driver-side graph.
  * The only driver traffic per iteration is a changed-row COUNT (one
  * scalar) for the convergence test, and `localCheckpoint()` truncates
  * the lineage so the plan does not grow with the iteration count.
  *
  * Convergence: the iteration count is bounded by the eccentricity of the
  * min-id vertex within each component. Near-duplicate graphs are unions
  * of dense LSH/threshold clusters (diameter 1-3 in practice), so the
  * loop terminates in a handful of rounds; `maxIters` is a loud upper
  * bound (IllegalStateException, never a silently-wrong result). For
  * adversarial path-shaped graphs at planetary scale the classic
  * log-diameter alternating small-star/large-star contraction would
  * replace the body; the driver-facing corpus graphs never need it.
  *
  * Reference context: hqt/dust has no graph surface at all (SURVEY.md §0;
  * its SQL layer delegates to SQLite) — this is part of the
  * training-data-pipeline mandate, not a port.
  */
object Components {

  /** @param nodes one column `id` (every vertex, including singletons)
    * @param edges two columns (undirected pairs; symmetrized internally)
    * @return `id, label` where label = min id reachable (component id)
    */
  def minLabelPropagation(nodes: DataFrame, edges: DataFrame,
                          srcCol: String, dstCol: String,
                          maxIters: Int = 50): DataFrame = {
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("t"))
    // Symmetrize once: propagation must flow both directions.
    val sym = e.union(e.select(col("t").as("s"), col("s").as("t")))
      .stageMaterialize

    var labels = nodes.select(col("id"), col("id").as("label"))
      .stageMaterialize
    var iter = 0
    var changed = 1L
    while (changed > 0) {
      if (iter >= maxIters)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIters iterations")
      // Each vertex pulls the smallest label in its neighbourhood. The
      // groupBy(min) runs with a map-side partial aggregate, so the
      // shuffle carries one candidate row per (vertex, map partition).
      val pulled = sym.join(labels, sym("t") === labels("id"))
        .groupBy(sym("s").as("nid"))
        .agg(min("label").as("nlab"))
      // Carry the previous label through the checkpoint: the convergence
      // test is then a cheap scan over the materialized blocks — ONE
      // distributed job per iteration, not a second join against the old
      // labels.
      val next = labels.join(pulled, labels("id") === pulled("nid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlab"), col("label")))
            .as("label"),
          col("label").as("prev"))
        .stageMaterialize
      changed = next.filter(col("label") < col("prev")).count()
      labels.unpersist()
      labels = next.drop("prev")
      iter += 1
    }
    labels
  }

  /** Component summary used by dedup reporting: one row per component with
    * its size and representative (= the component id, the minimum doc id —
    * the standard "keep first" retention rule). */
  def componentSizes(labels: DataFrame): DataFrame =
    labels.groupBy(col("label").as("comp"))
      .agg(F.count(lit(1)).as("csize"))
}
