package graft.plans

import graft.functions.{JaccardSim, MinHashBandKeys}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a naive Jaccard-threshold text join into the
  * MinHash band-bucketed equi-join + exact verify — the text-side twin of
  * [[CosineJoinRewrite]], turning the `ext/Dedup.scala` banding pipeline
  * into a capability plain SQL reaches (SURVEY.md §4's custom-Rule row).
  *
  * A user writing the natural near-duplicate query
  * {{{
  *   SELECT ... FROM docs a JOIN docs b
  *   ON a.doc_id < b.doc_id AND jaccard_sim(a.text, b.text) >= 0.9
  * }}}
  * gets a BroadcastNestedLoopJoin — O(n²) tokenizations, the plan that
  * cannot survive a crawl-scale corpus. This rule plants
  * [[MinHashBandKeys]] on both sides, explodes the per-doc band keys, and
  * turns the join into an EQUI-join on band key (shuffle keyed by band —
  * the scale-safe shape), keeping the ORIGINAL condition as the exact
  * verify so precision stays 1. A pair sharing several bands is emitted
  * exactly once: only the lowest shared key survives
  * (`key = array_min(array_intersect(lk, rk))`), so no post-join dedup
  * shuffle is needed.
  *
  * OPT-IN, off by default, same contract as [[CosineJoinRewrite]]: band
  * recall is ≈ 1 − (1 − j⁴)¹⁶ (≥ 0.9998 at j = 0.8) but not exactly 1, and
  * an optimizer must not silently change results — the rewrite fires only
  * under `spark.graft.jaccardJoinRewrite.enabled=true`. */
object JaccardJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.jaccardJoinRewrite.enabled"
  private val Marker = "__graft_mhb"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "false").toBoolean) plan
    else plan.transform {
      case j @ Join(left, right, Inner | Cross, Some(cond), hint)
          if j.resolved && !cond.references.exists(_.name.startsWith(Marker)) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val jac = conjuncts.collectFirst {
          case p @ GreaterThanOrEqual(JaccardSim(a, b), Literal(t: Double, DoubleType))
              if t > 0 => (p, a, b)
          case p @ GreaterThan(JaccardSim(a, b), Literal(t: Double, DoubleType))
              if t > 0 => (p, a, b)
        }
        jac match {
          case Some((_, a, b))
              if (a.references.subsetOf(left.outputSet) &&
                b.references.subsetOf(right.outputSet)) ||
                (a.references.subsetOf(right.outputSet) &&
                  b.references.subsetOf(left.outputSet)) =>
            val (lTxt, rTxt) =
              if (a.references.subsetOf(left.outputSet)) (a, b) else (b, a)
            val lkArr = Alias(MinHashBandKeys(lTxt), s"${Marker}_la")()
            val rkArr = Alias(MinHashBandKeys(rTxt), s"${Marker}_ra")()
            val lProj = Project(left.output :+ lkArr, left)
            val rProj = Project(right.output :+ rkArr, right)
            val lEl = AttributeReference(s"${Marker}_kl", LongType,
              nullable = false)()
            val rEl = AttributeReference(s"${Marker}_kr", LongType,
              nullable = false)()
            val lGen = Generate(Explode(lkArr.toAttribute), Nil,
              outer = false, None, Seq(lEl), lProj)
            val rGen = Generate(Explode(rkArr.toAttribute), Nil,
              outer = false, None, Seq(rEl), rProj)
            // one emission per pair: keep only the lowest shared band key
            val firstShared = EqualTo(lEl,
              ArrayMin(ArrayIntersect(lkArr.toAttribute, rkArr.toAttribute)))
            val newCond = (Seq[Expression](EqualTo(lEl, rEl), firstShared) ++
              conjuncts).reduce(And)
            Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint))
          case _ => j
        }
    }
}
