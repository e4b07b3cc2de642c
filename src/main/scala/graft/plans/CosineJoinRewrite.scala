package graft.plans

import graft.functions.{CosineSim, LshBuckets}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Optimizer rule: rewrite a naive cosine-threshold similarity join into
  * the LSH-bucketed candidate join + exact verify (SURVEY.md §7's "custom
  * `Rule`/strategy — similarity top-k" row).
  *
  * A user writing the natural query
  * {{{
  *   SELECT ... FROM e a JOIN e b
  *   ON a.id < b.id AND cosine_sim(a.emb, b.emb) >= 0.9
  * }}}
  * gets a BroadcastNestedLoopJoin — O(n²) cosine evaluations, the plan that
  * cannot survive 100 TB. This rule plants [[LshBuckets]] on both sides,
  * explodes the per-table bucket ids, and turns the join into an EQUI-join
  * on bucket id (shuffle keyed by bucket — the scale-safe shape), keeping
  * the ORIGINAL condition as the exact verify so precision stays 1. A pair
  * sharing several buckets is emitted exactly once: only the lowest shared
  * bucket id survives (`bucket = array_min(array_intersect(lb, rb))`), so
  * no post-join dedup shuffle is needed.
  *
  * OPT-IN, off by default: LSH candidate generation is approximate —
  * identical vectors always collide (recall 1 for exact duplicates), but a
  * near-threshold pair can miss all tables (the standard LSH recall curve,
  * tunable via table/plane counts). An optimizer must not silently change
  * results, so the rewrite only fires under
  * `spark.graft.cosineJoinRewrite.enabled=true` — the switch a user flips
  * when the corpus is too large for the exact plan.
  */
object CosineJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.cosineJoinRewrite.enabled"
  private val Marker = "__graft_lsh"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "false").toBoolean) plan
    else plan.transform {
      case j @ Join(left, right, Inner | Cross, Some(cond), hint)
          if j.resolved && !cond.references.exists(_.name.startsWith(Marker)) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val cosine = conjuncts.collectFirst {
          case p @ GreaterThanOrEqual(CosineSim(a, b), Literal(t: Double, DoubleType))
              if t > 0 => (p, a, b)
          case p @ GreaterThan(CosineSim(a, b), Literal(t: Double, DoubleType))
              if t > 0 => (p, a, b)
        }
        cosine match {
          case Some((_, a, b))
              if (a.references.subsetOf(left.outputSet) &&
                b.references.subsetOf(right.outputSet)) ||
                (a.references.subsetOf(right.outputSet) &&
                  b.references.subsetOf(left.outputSet)) =>
            val (lVec, rVec) =
              if (a.references.subsetOf(left.outputSet)) (a, b) else (b, a)
            val lbArr = Alias(LshBuckets(lVec), s"${Marker}_la")()
            val rbArr = Alias(LshBuckets(rVec), s"${Marker}_ra")()
            val lProj = Project(left.output :+ lbArr, left)
            val rProj = Project(right.output :+ rbArr, right)
            val lEl = AttributeReference(s"${Marker}_bl", IntegerType,
              nullable = false)()
            val rEl = AttributeReference(s"${Marker}_br", IntegerType,
              nullable = false)()
            val lGen = Generate(Explode(lbArr.toAttribute), Nil,
              outer = false, None, Seq(lEl), lProj)
            val rGen = Generate(Explode(rbArr.toAttribute), Nil,
              outer = false, None, Seq(rEl), rProj)
            // one emission per pair: keep only the lowest shared bucket
            val firstShared = EqualTo(lEl,
              ArrayMin(ArrayIntersect(lbArr.toAttribute, rbArr.toAttribute)))
            val newCond = (Seq[Expression](EqualTo(lEl, rEl), firstShared) ++
              conjuncts).reduce(And)
            Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint))
          case _ => j
        }
    }
}
