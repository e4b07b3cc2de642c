package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bit-parallel Levenshtein distance (Myers 1999, blocked form) — a
  * drop-in, value-identical replacement for the `levenshtein(a, b)`
  * builtin on the x84 verify path.
  *
  * Why: the builtin's DP walks every (i, j) cell decoding UTF-8 as it
  * goes — measured ~15 ns/cell, and x84's pair set at sf0.1 prices
  * 8.2e9 cells (~4 s of the query's ~5 s). Myers' algorithm computes the
  * SAME unit-cost Levenshtein metric with one 64-bit word of bit ops per
  * 64 DP cells: the column update is O(⌈m/64⌉) word operations instead
  * of m cell visits, a ~50× reduction in work for the same exact result
  * (guide §1.2 step 2 / §4: make the per-task kernel fast once the job
  * shape is right).
  *
  * Scope: the bit-parallel path runs when BOTH inputs are pure ASCII
  * (byte == code point, so byte-level Myers equals the builtin's
  * code-point DP); anything else falls back to the builtin's own
  * `UTF8String.levenshteinDistance`. Equality with the builtin across
  * ASCII/Unicode/boundary lengths is pinned by EditDistanceSpec.
  */
object EditDistance {

  /** Exact Levenshtein distance, value-identical to
    * `UTF8String.levenshteinDistance` (the `levenshtein` builtin). */
  def levenshtein(a: UTF8String, b: UTF8String): Int = {
    if (!a.isFullAscii || !b.isFullAscii) return a.levenshteinDistance(b)
    // pattern = shorter side: cost is ceil(m/64) words per text column
    val (p, t) = if (a.numBytes <= b.numBytes) (a, b) else (b, a)
    val m = p.numBytes
    val n = t.numBytes
    if (m == 0) return n
    val pat = p.getBytes
    val txt = t.getBytes
    // trim common prefix/suffix — costs O(min) and often removes most of
    // the DP for near-duplicate pairs (the only caller's workload)
    var lo = 0
    while (lo < m && pat(lo) == txt(lo)) lo += 1
    var hiP = m
    var hiT = n
    while (hiP > lo && pat(hiP - 1) == txt(hiT - 1)) { hiP -= 1; hiT -= 1 }
    val pm = hiP - lo
    val tn = hiT - lo
    if (pm == 0) return tn
    if (pm <= 64) myers1(pat, lo, pm, txt, lo, tn)
    else myersBlocked(pat, lo, pm, txt, lo, tn)
  }

  /** Single-word Myers (pattern length ≤ 64). */
  private def myers1(pat: Array[Byte], pOff: Int, m: Int,
                     txt: Array[Byte], tOff: Int, n: Int): Int = {
    val peq = new Array[Long](128)
    var i = 0
    while (i < m) {
      peq(pat(pOff + i) & 0x7f) |= 1L << i
      i += 1
    }
    var pv = -1L
    var mv = 0L
    var score = m
    val last = 1L << (m - 1)
    var j = 0
    while (j < n) {
      val eq = peq(txt(tOff + j) & 0x7f)
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      var mh = pv & xh
      if ((ph & last) != 0L) score += 1
      else if ((mh & last) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      pv = mh | ~(xv | ph)
      mv = ph & xv
      j += 1
    }
    score
  }

  /** Blocked Myers for pattern length > 64: per text column, blocks of 64
    * pattern rows chain through the horizontal delta at each block
    * boundary (the edlib/Hyyrö formulation). */
  private def myersBlocked(pat: Array[Byte], pOff: Int, m: Int,
                           txt: Array[Byte], tOff: Int, n: Int): Int = {
    val w = (m + 63) >>> 6
    // peq laid out [char][block]
    val peq = new Array[Long](128 * w)
    var i = 0
    while (i < m) {
      peq(((pat(pOff + i) & 0x7f) * w) + (i >>> 6)) |= 1L << (i & 63)
      i += 1
    }
    val pv = new Array[Long](w)
    val mv = new Array[Long](w)
    java.util.Arrays.fill(pv, -1L)
    var score = m
    val lastBlk = w - 1
    val lastBit = 1L << ((m - 1) & 63)
    var j = 0
    while (j < n) {
      val base = (txt(tOff + j) & 0x7f) * w
      var hin = 1 // D(0, j) - D(0, j-1) = +1
      var b = 0
      while (b < w) {
        var eq = peq(base + b)
        val pvb = pv(b)
        val mvb = mv(b)
        val xv = eq | mvb
        if (hin < 0) eq |= 1L
        val xh = (((eq & pvb) + pvb) ^ pvb) | eq
        var ph = mvb | ~(xh | pvb)
        var mh = pvb & xh
        if (b == lastBlk) {
          if ((ph & lastBit) != 0L) score += 1
          else if ((mh & lastBit) != 0L) score -= 1
        }
        val hout =
          if ((ph & 0x8000000000000000L) != 0L) 1
          else if ((mh & 0x8000000000000000L) != 0L) -1
          else 0
        ph = ph << 1
        mh = mh << 1
        if (hin > 0) ph |= 1L
        else if (hin < 0) mh |= 1L
        pv(b) = mh | ~(xv | ph)
        mv(b) = ph & xv
        hin = hout
        b += 1
      }
      j += 1
    }
    score
  }
}

/** Native expression: `graft_levenshtein(a, b)` — exact Levenshtein
  * distance, value-identical to the `levenshtein` builtin, computed
  * bit-parallel (see [[EditDistance]]). */
case class LevenshteinFast(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_levenshtein expects two string arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistance.levenshtein(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.EditDistance.levenshtein($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevenshteinFast =
    copy(left = newLeft, right = newRight)
}
