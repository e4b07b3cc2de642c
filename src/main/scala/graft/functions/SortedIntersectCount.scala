package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: |A ∩ B| for two SORTED int or long arrays
  * via a two-pointer merge (SURVEY.md §2.2 B71 — the x54 trigram verify
  * and the x57 exact word-set verify).
  *
  * Why not `size(array_intersect(a, b))`: that formulation builds an
  * OpenHashSet AND materializes the intersection array per row only to
  * take its length — measured 4 s of the x54 driver query at sf0.1
  * (758k verified pairs × ~50-element rank arrays). The merge loop is
  * allocation-free and stays inside whole-stage codegen; at 100 TB the
  * set-similarity verify step prices every surviving candidate pair, so
  * per-pair constant factors are the whole game.
  *
  * Contract: both inputs must be sorted ascending with distinct elements
  * (the `sort_array(collect_list(...))` shape x54/x57 build), and both of
  * the same element type (int or long). Inputs that violate the contract
  * undercount — this is a private building block for operators that own
  * their array construction, not a general UDF.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two array<int> or two array<bigint> " +
          s"arguments, got (${left.dataType.simpleString}, " +
          s"${right.dataType.simpleString})")
    }
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    if (elemType == IntegerType) {
      while (i < nx && j < ny) {
        val xv = x.getInt(i); val yv = y.getInt(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    } else {
      while (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val (jt, get) =
        if (elemType == IntegerType) ("int", "getInt") else ("long", "getLong")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  $jt $xv = $x.$get($i); $jt $yv = $y.$get($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
