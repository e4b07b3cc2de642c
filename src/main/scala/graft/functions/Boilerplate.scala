package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Boilerplate-strip kernel (r16) — the x114 pipeline's per-doc tail in one
  * codegen pass over (token array, matched 5-gram start positions).
  *
  * Replaces, value-identically (pinned in BoilerplateSpec):
  *  1. the covered-position expansion `explode(sequence(i, i + 4))` +
  *     `DISTINCT` (a 5× corpus-gram-stream blowup plus its exchange);
  *  2. the full `posexplode(tk)` token-position stream (one row per corpus
  *     token) LEFT ANTI joined against the covered positions;
  *  3. the per-doc `COUNT(*)` + `md5(array_join(sort_array(collect_list(
  *     concat(tok, ':', j))), ' '))` aggregate (a corpus-token shuffle into
  *     a sort-collect).
  *
  * Everything after the boilerplate df-threshold decision is a pure
  * function of the doc's own token array and its matched gram positions,
  * so the whole tail is map work: expand each matched start i over
  * positions i..i+4 into a covered bitmap, count the uncovered tokens, and
  * fingerprint them as the md5 of the space-joined BINARY-sorted `tok:pos`
  * strings — the exact bytes the old SQL hashed (sort_array on strings is
  * UTF8String binary order; md5 renders lowercase hex).
  *
  * Faithful edges: a NULL token element keeps its position counted in
  * kept_toks but is absent from the fingerprint (concat(null,…) was null
  * and collect_list drops nulls); returns NULL when no token survives
  * (the old GROUP BY produced no row for that doc).
  */
object Boilerplate {
  /** Gram width of the x114 boilerplate detector (5-grams). */
  val Width = 5

  private val HexDigits = "0123456789abcdef".toCharArray

  def strip(toks: ArrayData, matched: ArrayData): GenericInternalRow = {
    val n = toks.numElements()
    if (n == 0) return null
    val covered = new Array[Boolean](n + 1) // 1-based token positions
    val m = matched.numElements()
    var k = 0
    while (k < m) {
      if (!matched.isNullAt(k)) {
        var j = matched.getInt(k)
        if (j < 1) j = 1
        var end = j + Width - 1
        if (end > n) end = n
        while (j <= end) { covered(j) = true; j += 1 }
      }
      k += 1
    }
    var kept = 0L
    var j = 1
    while (j <= n) { if (!covered(j)) kept += 1; j += 1 }
    if (kept == 0L) return null
    val parts = new java.util.ArrayList[UTF8String](kept.toInt)
    j = 1
    while (j <= n) {
      if (!covered(j) && !toks.isNullAt(j - 1)) {
        parts.add(UTF8String.concat(toks.getUTF8String(j - 1),
          UTF8String.fromString(":" + j)))
      }
      j += 1
    }
    parts.sort(null) // UTF8String is Comparable: binary (byte-wise) order
    val arr = parts.toArray(new Array[UTF8String](parts.size()))
    val joined = UTF8String.concatWs(UTF8String.fromString(" "), arr: _*)
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(joined.getBytes)
    val hex = new Array[Char](32)
    var i = 0
    while (i < 16) {
      hex(i * 2) = HexDigits((digest(i) >> 4) & 0xf)
      hex(i * 2 + 1) = HexDigits(digest(i) & 0xf)
      i += 1
    }
    new GenericInternalRow(Array[Any](kept, UTF8String.fromString(new String(hex))))
  }
}

/** Native expression: `boilerplate_strip(tokens, matched_positions)` —
  * struct(kept_toks, clean_fp) after removing every token covered by a
  * matched 5-gram start position (1-based); NULL when nothing survives. */
case class BoilerplateStrip(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"boilerplate_strip expects (array<string>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("kept_toks", LongType, nullable = false),
    StructField("clean_fp", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "boilerplate_strip"

  override def nullSafeEval(t: Any, m: Any): Any =
    Boilerplate.strip(t.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val out = ctx.freshName("stripRow")
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
         |${lGen.code}
         |${rGen.code}
         |boolean ${ev.isNull} = true;
         |$javaType ${ev.value} = null;
         |if (!${lGen.isNull} && !${rGen.isNull}) {
         |  $javaType $out = graft.functions.Boilerplate.strip(
         |    ${lGen.value}, ${rGen.value});
         |  if ($out != null) { ${ev.isNull} = false; ${ev.value} = $out; }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoilerplateStrip =
    copy(left = newLeft, right = newRight)
}
