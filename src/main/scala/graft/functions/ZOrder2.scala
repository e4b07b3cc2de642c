package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: 42-bit Morton (Z-order) code of two ints —
  * bit i of `left` lands at output bit 2i, bit i of `right` at 2i+1, for
  * the low [[ZOrder2.Bits]] bits of each input (SURVEY.md §2.2 B40/B8 —
  * data-layout clustering for multi-column scan pruning).
  *
  * Why an expression and not a lambda: `aggregate(sequence(0,20), ...)`
  * evaluates the higher-order function interpreted per row; sorting 100 TB
  * by z-value prices this on every row of the write path, so the interleave
  * must stay inside whole-stage codegen. The expression is deterministic
  * and null-safe (null in → null out), so Catalyst can constant-fold and
  * push it like any builtin.
  *
  * The layout use is [[graft.operators.Layout.zorderBy]]: repartitionByRange
  * + sortWithinPartitions on the z-value co-clusters BOTH key columns, so
  * parquet row-group min/max statistics become selective for predicates on
  * EITHER key — a plain lexicographic sort only prunes the leading column.
  * Inputs are masked to the low 21 bits; keys wider than 2²¹ should be
  * bucketed (e.g. `key >> shift`) before interleaving, which preserves the
  * clustering property the layout needs (z-order on key prefixes).
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"zorder2 expects two int arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrder2.interleave($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Bits kept from each input (2·21 = 42 output bits, sign-safe in a
    * BIGINT on both engines). */
  val Bits = 21

  /** Bit-parallel interleave (Morton spreading): each doubling step moves
    * half the remaining gap — 5 shift/mask ops per operand vs a 21-step
    * loop. Called from generated code; must stay a static pure function. */
  def interleave(x: Int, y: Int): Long =
    spread(x) | (spread(y) << 1)

  private def spread(v: Int): Long = {
    var x = v.toLong & 0x1FFFFFL            // low 21 bits
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }
}
