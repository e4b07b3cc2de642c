package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint kernel (r15) — the x64 pipeline's per-doc math in
  * one codegen loop over the token array.
  *
  * Replaces, value-identically (pinned in WinnowSpec):
  *  1. per-token polynomial char hash `aggregate(transform(sequence(1,
  *     length(tok)), i -> ascii(substring(tok, i, 1))), 0, (a, c) ->
  *     (a*31 + c) % 1000000007)` — an interpreted lambda per CHARACTER;
  *  2. the k-gram rolling hash over two `LEAD` windows (one exchange + a
  *     per-doc sort just to pair adjacent token hashes);
  *  3. the window-4 sliding `MIN` + full-window filter;
  *  4. the DISTINCT + per-doc count/min/modular-sum aggregate.
  *
  * Every stage is a pure function of the doc's own token array, so the
  * whole derivation is map work — the previous formulation paid two
  * token-stream exchanges (the windows and the distinct+group) for it.
  * Returns NULL when the doc has no full window (< 6 tokens), matching
  * the old GROUP-BY-over-zero-rows absence.
  */
object Winnow {
  private val P = 1000000007L

  /** ascii() semantics of Spark's `Ascii` expression: the first CODE
    * POINT's value (0 for empty). */
  private def charHash(tok: UTF8String): Long = {
    val s = tok.toString
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def fingerprint(arr: ArrayData): GenericInternalRow = {
    val n = arr.numElements()
    if (n < 6) return null // < 4 full k-gram windows of 3-grams
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = if (arr.isNullAt(i)) 0L else charHash(arr.getUTF8String(i))
      i += 1
    }
    val nk = n - 2
    val khs = new Array[Long](nk)
    i = 0
    while (i < nk) {
      khs(i) = ((hs(i) * 1000003L + hs(i + 1)) % P * 1000003L + hs(i + 2)) % P
      i += 1
    }
    val nw = nk - 3
    if (nw <= 0) return null
    val seen = new java.util.HashSet[java.lang.Long](nw * 2)
    var cnt = 0L
    var min = Long.MaxValue
    var modsum = 0L
    i = 0
    while (i < nw) {
      var m = khs(i)
      var j = i + 1
      while (j <= i + 3) {
        if (khs(j) < m) m = khs(j)
        j += 1
      }
      if (seen.add(m)) {
        cnt += 1
        if (m < min) min = m
        modsum = (modsum + m) % P
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](cnt, min, modsum))
  }
}

/** Native expression: `winnow_fp(tokens)` — struct(n_fp, min_fp,
  * fp_modsum) of the winnowing fingerprint set, NULL when the doc is too
  * short to carry a full window.
  *
  * Contract (ADVICE r15): a null array ELEMENT is treated as an empty
  * token (char hash 0) — the graft tokenizers (`array_remove(split(…),
  * '')`) never produce nulls, so this is only observable when the
  * registered SQL function is applied to hand-built arrays. */
case class WinnowFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_fp", LongType, nullable = false),
    StructField("min_fp", LongType, nullable = false),
    StructField("fp_modsum", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fp"

  override def nullSafeEval(a: Any): Any =
    Winnow.fingerprint(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val out = ctx.freshName("winnowRow")
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = true;
         |$javaType ${ev.value} = null;
         |if (!${childGen.isNull}) {
         |  $javaType $out = graft.functions.Winnow.fingerprint(${childGen.value});
         |  if ($out != null) { ${ev.isNull} = false; ${ev.value} = $out; }
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}
