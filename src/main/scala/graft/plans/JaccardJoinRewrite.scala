package graft.plans

import graft.functions.{JaccardSim, MinHashBandKeys, SortedFirstCommon, SortedJaccardGe, WordSetHashes}
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
  * the scale-safe shape). The jaccard conjunct is verified exactly per
  * candidate pair, but over per-doc precomputed sorted word-hash arrays
  * ([[WordSetHashes]] + [[SortedJaccardGe]]) rather than by re-tokenizing
  * both texts — on a degenerate corpus where most pairs collide in some
  * band, per-pair verify cost is the whole query. A pair sharing several
  * bands is emitted exactly once: only the lowest shared key survives
  * (`key = sorted_first_common(lk, rk)`), so no post-join dedup shuffle is
  * needed.
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
              if t > 0 => (p, a, b, t, false)
          case p @ GreaterThan(JaccardSim(a, b), Literal(t: Double, DoubleType))
              if t > 0 => (p, a, b, t, true)
        }
        jac match {
          case Some((p, a, b, t, strict))
              if (a.references.subsetOf(left.outputSet) &&
                b.references.subsetOf(right.outputSet)) ||
                (a.references.subsetOf(right.outputSet) &&
                  b.references.subsetOf(left.outputSet)) =>
            val (lTxt, rTxt) =
              if (a.references.subsetOf(left.outputSet)) (a, b) else (b, a)
            val lkArr = Alias(MinHashBandKeys(lTxt), s"${Marker}_la")()
            val rkArr = Alias(MinHashBandKeys(rTxt), s"${Marker}_ra")()
            // per-doc sorted word-hash arrays: the verify below prices a
            // two-pointer merge per candidate pair instead of re-tokenizing
            // both texts (measured 175 s → ~5 s on the sf0.1 degenerate
            // corpus, where 75% of all pairs collide in ≥1 band)
            val lwh = Alias(WordSetHashes(lTxt), s"${Marker}_wa")()
            val rwh = Alias(WordSetHashes(rTxt), s"${Marker}_wb")()
            val lProj = Project(left.output :+ lkArr :+ lwh, left)
            val rProj = Project(right.output :+ rkArr :+ rwh, right)
            val lEl = AttributeReference(s"${Marker}_kl", LongType,
              nullable = false)()
            val rEl = AttributeReference(s"${Marker}_kr", LongType,
              nullable = false)()
            val lGen = Generate(Explode(lkArr.toAttribute), Nil,
              outer = false, None, Seq(lEl), lProj)
            val rGen = Generate(Explode(rkArr.toAttribute), Nil,
              outer = false, None, Seq(rEl), rProj)
            // one emission per pair: keep only the lowest shared band key
            // (band keys are sorted — band id occupies the top byte)
            val firstShared = EqualTo(lEl,
              SortedFirstCommon(lkArr.toAttribute, rkArr.toAttribute))
            // exact verify on the precomputed hash arrays; equivalent to the
            // original jaccard_sim conjunct up to 64-bit word-hash collisions
            // (~|union|²/2⁶⁵ per pair — far below the banding miss rate this
            // opt-in rule already documents)
            val verify = SortedJaccardGe(lwh.toAttribute, rwh.toAttribute,
              t, strict)
            // PPJoin length filter: jaccard >= t implies the set sizes are
            // within a factor t of each other — two integer comparisons
            // that prune mismatched-length candidates before the O(n)
            // merges (never changes the result, only skips doomed pairs)
            val (lSz, rSz) = (Size(lwh.toAttribute), Size(rwh.toAttribute))
            val lenFilter = And(
              GreaterThanOrEqual(Cast(lSz, DoubleType),
                Multiply(Literal(t), Cast(rSz, DoubleType))),
              GreaterThanOrEqual(Cast(rSz, DoubleType),
                Multiply(Literal(t), Cast(lSz, DoubleType))))
            // user's residual conjuncts (e.g. doc_id < doc_id) run before the
            // merge-based predicates: And short-circuits in codegen, so cheap
            // comparisons prune half the candidate rows for free
            val others = conjuncts.filterNot(_ eq p)
            val newCond = (Seq[Expression](EqualTo(lEl, rEl)) ++ others ++
              Seq(lenFilter, firstShared, verify)).reduce(And)
            Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint))
          case _ => j
        }
    }
}
