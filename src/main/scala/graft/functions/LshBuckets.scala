package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: multi-table random-hyperplane LSH bucket ids
  * for a float-array embedding, one int per table, encoded `(t << planes) |
  * bucketBits` so values are globally distinct across tables and the array
  * is strictly increasing (SURVEY.md §2.2 B72, §7 "custom Rule" row).
  *
  * Bit j of table t is the sign of the projection onto a pseudo-random ±1
  * hyperplane; the sign comes from a multiplicative hash of (t, j, dim), so
  * any executor recomputes identical buckets with zero shipped state — the
  * property that makes the scheme driver-free at 1000 executors. Identical
  * vectors get identical buckets by construction.
  *
  * This is the per-row building block [[graft.plans.CosineJoinRewrite]]
  * plants on both sides of a rewritten similarity join; it runs once per
  * scanned row (not per candidate pair), fused into whole-stage codegen.
  */
case class LshBuckets(child: Expression,
                      numTables: Int = LshBuckets.DefaultTables,
                      planesPerTable: Int = LshBuckets.DefaultPlanes)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var bv = 0
      var j = 0
      while (j < planesPerTable) {
        var proj = 0.0
        var i = 0
        while (i < n) {
          val s = LshBuckets.sign(t, j, i)
          proj += s * v.getFloat(i).toDouble
          i += 1
        }
        if (proj > 0) bv |= (1 << j)
        j += 1
      }
      out(t) = (t << planesPerTable) | bv
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val bv = ctx.freshName("bv")
      val proj = ctx.freshName("proj")
      val h = ctx.freshName("h")
      s"""
         |int $n = $v.numElements();
         |int[] $out = new int[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  int $bv = 0;
         |  for (int $j = 0; $j < $planesPerTable; $j++) {
         |    double $proj = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      int $h = ($t * 0x9E3779B1 + $j * 0x85EBCA77 + $i * 0xC2B2AE3D)
         |        * 0x27D4EB2F;
         |      $proj += ((($h >>> 31) == 0) ? 1.0 : -1.0)
         |        * (double) $v.getFloat($i);
         |    }
         |    if ($proj > 0) $bv |= (1 << $j);
         |  }
         |  $out[$t] = ($t << $planesPerTable) | $bv;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  val DefaultTables = 8
  val DefaultPlanes = 6

  /** ±1 hyperplane sign from a multiplicative hash of (table, plane, dim) —
    * mirrored exactly in the generated Java above. */
  @inline def sign(t: Int, j: Int, i: Int): Double = {
    val h = (t * 0x9E3779B1 + j * 0x85EBCA77 + i * 0xC2B2AE3D) * 0x27D4EB2F
    if ((h >>> 31) == 0) 1.0 else -1.0
  }

  /** Bucket array with [[graft.ext.Similarity.withBuckets]]'s EXACT sign
    * family and summation order (r15): sign(t, j, i) = ±1 by parity of
    * Spark's chained murmur3 `hash(t, j, i + 1)` (seed 42), projections
    * summed in dim order as doubles — so the encoded bucket ids are
    * bit-identical to the posexplode → 64-sum-column aggregation this
    * replaces, and every LSH consumer keeps its exact candidate sets.
    * Encoding: (t << planes) | bucketBits, strictly increasing. */
  def bucketsM3(v: org.apache.spark.sql.catalyst.util.ArrayData,
                numTables: Int, planesPerTable: Int): GenericArrayData = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt
    val n = v.numElements()
    val out = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var bv = 0
      var j = 0
      while (j < planesPerTable) {
        val hj = hashInt(j, hashInt(t, 42))
        var proj = 0.0
        var i = 0
        while (i < n) {
          // skip null dims (ADVICE r15): the posexplode+SUM formulation this
          // mirrors ignores null elements, so a null-containing array must
          // bucket identically
          if (!v.isNullAt(i)) {
            val h = hashInt(i + 1, hj)
            val s = if ((h & 1) == 0) 1.0 else -1.0
            proj += s * v.getFloat(i).toDouble
          }
          i += 1
        }
        if (proj > 0) bv |= (1 << j)
        j += 1
      }
      out(t) = (t << planesPerTable) | bv
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Native expression: [[LshBuckets.bucketsM3]] — the murmur3-sign LSH
  * bucket family of `Similarity.withBuckets`, computed map-only in one
  * fused loop (no posexplode, no aggregation, no join-back). */
case class LshBucketsM3(child: Expression, numTables: Int,
                        planesPerTable: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // numTables bound (ADVICE r15): the id encodes (t << planes) | bits, so
    // (numTables - 1) << planesPerTable must not overflow Int — otherwise
    // large table counts produce negative ids that decode wrongly
    case ArrayType(FloatType, _) if numTables >= 1 && planesPerTable >= 1 &&
        planesPerTable <= 30 &&
        numTables - 1 <= (Int.MaxValue >> planesPerTable) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets_m3 expects 1 <= planes <= 30 and numTables <= " +
        s"(Int.MaxValue >> planes) + 1, got ($numTables, $planesPerTable)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets_m3 expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets_m3"

  override def nullSafeEval(a: Any): Any =
    LshBuckets.bucketsM3(a.asInstanceOf[ArrayData], numTables, planesPerTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LshBuckets.bucketsM3(" +
        s"$v, $numTables, $planesPerTable);")

  override protected def withNewChildInternal(newChild: Expression): LshBucketsM3 =
    copy(child = newChild)
}
