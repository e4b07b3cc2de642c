package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-array statistics kernels (r15): the quality/lang-id family
  * counted stopword hits with `size(filter(toks, x -> x IN (...)))`,
  * alphabetic words with `size(filter(toks, w -> w RLIKE '...'))` and
  * word characters with `AGGREGATE(toks, 0, (acc, w) -> acc + length(w))`
  * — higher-order functions whose lambdas evaluate interpreted per
  * TOKEN (guide §4: prefer codegen expressions). Each reduces to one
  * loop over the array:
  *
  *  - count_in(toks, array(...)): tokens equal to any of a literal set
  *    (exact string equality — the IN semantics);
  *  - count_rlike(toks, 'regex'): tokens the java regex FINDS a match in
  *    (the RLIKE partial-match semantics), pattern compiled once;
  *  - sum_lengths(toks): Σ length(tok) in CODE POINTS (the `length()`
  *    builtin's unit).
  *
  * Value parity with the HOF formulations is pinned in TokenStatsSpec.
  */
object TokenStats {

  def countIn(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  def countRlike(arr: ArrayData, p: java.util.regex.Pattern): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
          p.matcher(arr.getUTF8String(i).toString).find(0)) c += 1
      i += 1
    }
    c
  }

  /** Max multiplicity of any element — equals the longest equal run of
    * the sorted array (the x68 aggregate()-scan value) without sorting. */
  def maxFreq(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val k = arr.getUTF8String(i)
        val c = counts.merge(k, 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }

  def sumLengths(arr: ArrayData): Long = {
    val n = arr.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) s += arr.getUTF8String(i).numChars()
      i += 1
    }
    s
  }
}

sealed trait TokenArrayExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
}

/** `count_in(tokens, array('a', ...))` — tokens equal to a literal set. */
case class CountIn(child: Expression, values: Seq[String])
    extends TokenArrayExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in"

  @transient private lazy val set = {
    val s = new java.util.HashSet[UTF8String](values.length * 2)
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override def nullSafeEval(a: Any): Any =
    TokenStats.countIn(a.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("countInSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenStats.countIn($a, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountIn =
    copy(child = newChild)
}

/** `count_rlike(tokens, 'regex')` — tokens the regex finds a match in. */
case class CountRlike(child: Expression, regex: String)
    extends TokenArrayExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_rlike"

  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

  override def nullSafeEval(a: Any): Any =
    TokenStats.countRlike(a.asInstanceOf[ArrayData], pattern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("countRlikePattern", pattern,
      classOf[java.util.regex.Pattern].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenStats.countRlike($a, $pRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountRlike =
    copy(child = newChild)
}

/** `max_freq(tokens)` — max multiplicity of any token. */
case class MaxFreq(child: Expression) extends TokenArrayExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "max_freq"

  override def nullSafeEval(a: Any): Any =
    TokenStats.maxFreq(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenStats.maxFreq($a);")

  override protected def withNewChildInternal(newChild: Expression): MaxFreq =
    copy(child = newChild)
}

/** `sum_lengths(tokens)` — Σ length(tok) in code points. */
case class SumLengths(child: Expression) extends TokenArrayExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sum_lengths"

  override def nullSafeEval(a: Any): Any =
    TokenStats.sumLengths(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenStats.sumLengths($a);")

  override protected def withNewChildInternal(newChild: Expression): SumLengths =
    copy(child = newChild)
}
