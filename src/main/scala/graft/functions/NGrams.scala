package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Map-only word n-gram kernels (r15 optimization round).
  *
  * The trigram/bigram stages of x54/x82/x106/x111 derived their n-grams
  * either through a posexplode → window-lead → re-aggregate detour (one
  * exchange + one per-doc sort just to pair adjacent tokens that already
  * sit adjacent in the token ARRAY the doc carries) or through an
  * interpreted `transform(sequence(...))` lambda (higher-order functions
  * evaluate per element outside whole-stage codegen). Both reduce to one
  * tight loop over the token array inside codegen — zero shuffle, zero
  * lambda dispatch (guide §2.4: remove shuffles outright; §4: prefer
  * codegen expressions).
  *
  * Value parity contracts (pinned in NGramsSpec):
  *  - [[wordNgrams]] == `transform(sequence(1, size(tk)-n+1), i ->
  *    concat_ws(' ', tk[i], ..., tk[i+n-1]))` (and the window-lead
  *    formulation) for arrays with ≥ n elements; fewer → empty array.
  *  - [[ngramHashesSorted]] == `sort_array(collect_list(xxhash64(tok)))`
  *    over the DISTINCT n-gram strings: dedup happens on the STRING (two
  *    distinct grams colliding in 64 bits would keep both hash copies,
  *    exactly like the aggregation it replaces), hash is XXH64 seed 42 =
  *    the `xxhash64()` builtin.
  */
object NGrams {

  private val Space = UTF8String.fromString(" ")

  private def gram(arr: ArrayData, start: Int, n: Int): UTF8String = {
    val parts = new Array[UTF8String](n)
    var k = 0
    while (k < n) {
      parts(k) = if (arr.isNullAt(start + k)) null
                 else arr.getUTF8String(start + k)
      k += 1
    }
    UTF8String.concatWs(Space, parts: _*)
  }

  /** All consecutive word n-grams, space-joined, in document order. */
  def wordNgrams(arr: ArrayData, n: Int): GenericArrayData = {
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](sz - n + 1)
    var i = 0
    while (i <= sz - n) {
      out(i) = gram(arr, i, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted xxhash64 (seed 42) array of the DISTINCT word n-grams. */
  def ngramHashesSorted(arr: ArrayData, n: Int): GenericArrayData = {
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(new Array[Long](0))
    val seen = new java.util.HashSet[UTF8String](((sz - n + 1) * 2).max(8))
    val hs = new Array[Long](sz - n + 1)
    var m = 0
    var i = 0
    while (i <= sz - n) {
      val g = gram(arr, i, n)
      if (seen.add(g)) {
        hs(m) = XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset,
          g.numBytes, 42L)
        m += 1
      }
      i += 1
    }
    val dense = if (m == hs.length) hs else java.util.Arrays.copyOf(hs, m)
    java.util.Arrays.sort(dense)
    new GenericArrayData(dense)
  }
}

sealed trait NGramExpression extends UnaryExpression {
  def n: Int
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
}

/** Native expression: `word_ngrams(tokens, n)` — consecutive space-joined
  * word n-grams of a token array, in order. */
case class WordNgrams(child: Expression, n: Int) extends NGramExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(a: Any): Any =
    NGrams.wordNgrams(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NGrams.wordNgrams($a, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): WordNgrams = copy(child = newChild)
}

/** Native expression: `ngram_hashes_sorted(tokens, n)` — sorted xxhash64
  * (seed 42) array of the distinct word n-grams of a token array. */
case class NgramHashesSorted(child: Expression, n: Int) extends NGramExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes_sorted"

  override def nullSafeEval(a: Any): Any =
    NGrams.ngramHashesSorted(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NGrams.ngramHashesSorted($a, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): NgramHashesSorted = copy(child = newChild)
}
