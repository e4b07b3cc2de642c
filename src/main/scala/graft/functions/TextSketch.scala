package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared text-sketch kernels for [[JaccardSim]] / [[MinHashBandKeys]] and
  * the [[graft.plans.JaccardJoinRewrite]] optimizer rule.
  *
  * Tokenization matches the Dedup pipelines (`ext/Dedup.scala`): lowercase,
  * split on single spaces, drop empties, distinct — so a user moving
  * between the SQL function and the DataFrame pipelines sees one word-set
  * definition.
  *
  * Top-level object: Scala emits a static-forwarder mirror class, so the
  * generated Java of the two expressions calls
  * `graft.functions.TextSketch.jaccard(...)` directly and both expressions
  * stay inside whole-stage codegen (no interpreted fallback, no boxing).
  */
object TextSketch {
  /** 64 permutations as 16 bands × 4 rows: recall ≈ 1 − (1 − j⁴)¹⁶ —
    * ≥ 0.9998 at j = 0.8, ≈ 1 − 3·10⁻⁸ at j = 0.9 — tuned for the
    * high-threshold near-dup joins the rewrite targets. */
  val NumPerms = 64
  val Bands = 16
  val RowsPerBand = 4

  /** Sentinel band key for an empty word set: empty docs bucket together,
    * so `jaccard = 1` empty–empty pairs survive the candidate stage and the
    * exact verify (parity with the nested-loop plan they replace). */
  val EmptyKey: Long = java.lang.Long.MIN_VALUE

  private def words(s: UTF8String): Array[String] = {
    val parts = s.toString.toLowerCase.split(" ")
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) seen.add(parts(i))
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** Exact word-set Jaccard. Both sides empty → 1.0 (identical documents);
    * one side empty → 0.0. */
  def jaccard(a: UTF8String, b: UTF8String): Double = {
    val wa = words(a)
    val wb = words(b)
    if (wa.isEmpty && wb.isEmpty) return 1.0
    if (wa.isEmpty || wb.isEmpty) return 0.0
    val sa = new java.util.HashSet[String](wa.length * 2)
    wa.foreach(sa.add)
    var inter = 0
    wb.foreach(w => if (sa.contains(w)) inter += 1)
    inter.toDouble / (wa.length + wb.length - inter).toDouble
  }

  /** [[Bands]] MinHash band keys: perm i = murmur3 of (word, seed i), band
    * hash = 31-polynomial over its [[RowsPerBand]] minima, band id in the
    * top byte so keys never collide across bands. */
  def bandKeys(s: UTF8String): GenericArrayData = {
    val ws = words(s)
    if (ws.isEmpty) return new GenericArrayData(Array(EmptyKey))
    val mins = Array.fill(NumPerms)(Int.MaxValue)
    var wi = 0
    while (wi < ws.length) {
      val w = ws(wi)
      var i = 0
      while (i < NumPerms) {
        val h = scala.util.hashing.MurmurHash3.stringHash(w, i)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      wi += 1
    }
    val keys = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      var bh = 1125899906842597L
      var r = 0
      while (r < RowsPerBand) {
        bh = bh * 31L + mins(b * RowsPerBand + r).toLong
        r += 1
      }
      keys(b) = (b.toLong << 56) | (bh & 0x00FFFFFFFFFFFFFFL)
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Returned by [[firstCommon]] when the arrays share no element. Real
    * band keys are either non-negative (band id in the top byte) or the
    * [[EmptyKey]] sentinel (Long.MinValue), so MinValue+1 can never equal a
    * key — an EqualTo against it is simply false, no null channel needed. */
  val NoCommon: Long = java.lang.Long.MIN_VALUE + 1

  /** Sorted distinct 64-bit hashes of the word set — the per-document
    * precomputation that replaces per-pair re-tokenization in the
    * jaccard-join verify. Two 32-bit murmur seeds concatenated: the
    * per-pair false-equality probability is ~|union|²/2⁶⁵, negligible even
    * against the ~10⁷ candidate pairs a degenerate corpus can produce. */
  def wordHashes(s: UTF8String): GenericArrayData = {
    val ws = words(s)
    val hs = new Array[Long](ws.length)
    var i = 0
    while (i < ws.length) {
      val w = ws(i)
      hs(i) = (scala.util.hashing.MurmurHash3.stringHash(w, 0x9E3779B9).toLong << 32) |
        (scala.util.hashing.MurmurHash3.stringHash(w, 0x85EBCA6B).toLong & 0xFFFFFFFFL)
      i += 1
    }
    java.util.Arrays.sort(hs)
    new GenericArrayData(hs)
  }

  /** jaccard(A, B) ≥ t (or > t when strict) over two sorted distinct
    * long arrays, allocation-free. Matches [[jaccard]]'s edge cases: both
    * empty → 1.0, one empty → 0.0. */
  def sortedJaccardGe(a: ArrayData, b: ArrayData, t: Double,
      strict: Boolean): Boolean = {
    val na = a.numElements(); val nb = b.numElements()
    // size bound: jac ≤ min/max, so a pair whose sizes are out of ratio
    // can never reach t — rejected before touching either array's data.
    // Exact (a necessary condition of jac ≥ t, and of jac > t a fortiori);
    // on a banded candidate join most pairs fail the threshold, so the
    // bounds, not the merge, price the typical pair.
    if (na == 0 && nb == 0) return if (strict) 1.0 > t else 1.0 >= t
    if (na == 0 || nb == 0) return if (strict) 0.0 > t else 0.0 >= t
    // both bounds carry 1e-9 slack so their own FP rounding can never
    // out-vote the exact final comparison on a 1-ulp boundary pair
    if (math.min(na, nb) + 1e-9 < t * math.max(na, nb)) return false
    // jac ≥ t ⟺ |A∩B| ≥ t·(na+nb)/(1+t); once even matching every
    // remaining element cannot reach that floor, stop the merge early
    val cMin = t * (na + nb) / (1.0 + t) - 1e-9
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else {
        if (x < y) i += 1 else j += 1
        if (c + math.min(na - i, nb - j) < cMin) return false
      }
    }
    val jac = c.toDouble / (na + nb - c).toDouble
    if (strict) jac > t else jac >= t
  }

  /** First (= lowest) common element of two sorted long arrays, or
    * [[NoCommon]] — the single-emission pick for a pair sharing several
    * band keys, without `array_intersect`'s per-row hash set. */
  def firstCommon(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) return x
      else if (x < y) i += 1
      else j += 1
    }
    NoCommon
  }
}

/** Native expression: exact word-set Jaccard similarity of two strings
  * (SURVEY.md §2.2 B68/B71) — the scalar a user writes in a naive near-dup
  * join, and the exact verify the [[graft.plans.JaccardJoinRewrite]] rule
  * keeps after banding. */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim expects two string arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextSketch.jaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextSketch.jaccard($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

/** Native expression: the [[TextSketch.Bands]] MinHash band keys of a text
  * column — the candidate-generation side of the jaccard-join rewrite.
  * Deterministic, zero shipped state (hash seeds are the permutation
  * indices), one pass over the word set per row. */
case class MinHashBandKeys(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_band_keys expects a string argument, got " +
        s"${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  override def nullSafeEval(a: Any): Any =
    TextSketch.bandKeys(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextSketch.bandKeys($a);")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBandKeys = copy(child = newChild)
}

/** Native expression: [[TextSketch.wordHashes]] of a text column — planted
  * by [[graft.plans.JaccardJoinRewrite]] on both join sides so the verify
  * prices a sorted merge over per-doc precomputed hashes instead of
  * re-tokenizing both texts for every candidate pair. */
case class WordSetHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_set_hashes expects a string argument, got " +
        s"${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_set_hashes"

  override def nullSafeEval(a: Any): Any =
    TextSketch.wordHashes(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextSketch.wordHashes($a);")

  override protected def withNewChildInternal(
      newChild: Expression): WordSetHashes = copy(child = newChild)
}

/** Native expression: jaccard(A, B) ≥ t (> t when strict) over two sorted
  * distinct long arrays — the banded join's exact verify, evaluated once
  * per candidate pair inside whole-stage codegen with no allocation. */
case class SortedJaccardGe(left: Expression, right: Expression,
    threshold: Double, strict: Boolean) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_jaccard_ge expects two array<bigint> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "sorted_jaccard_ge"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextSketch.sortedJaccardGe(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], threshold, strict)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextSketch.sortedJaccardGe(" +
        s"$a, $b, $threshold, $strict);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccardGe =
    copy(left = newLeft, right = newRight)
}

/** Native expression: lowest common element of two sorted long arrays
  * ([[TextSketch.NoCommon]] when disjoint) — the single-emission predicate
  * `lEl = sorted_first_common(lk, rk)` without `array_intersect`'s per-row
  * hash set and materialized array. */
case class SortedFirstCommon(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_first_common expects two array<bigint> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_first_common"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextSketch.firstCommon(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextSketch.firstCommon($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedFirstCommon =
    copy(left = newLeft, right = newRight)
}
