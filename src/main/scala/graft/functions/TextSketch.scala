package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
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
