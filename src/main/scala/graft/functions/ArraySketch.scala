package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Map-only sketch kernels over a tokenized word array (array<string>).
  *
  * These replace the explode → groupBy(doc_id) formulations the dedup
  * pipelines started with (`ext/Dedup.scala`): a 64-permutation MinHash
  * signature built as 64 `min(hash(tok, i))` aggregation columns pays a
  * full shuffle of the exploded token stream plus a 64-field aggregation
  * buffer per doc, when the signature is a pure per-row function of the
  * word array the doc already carries. Computing it in one tight loop
  * inside whole-stage codegen removes that shuffle entirely — at 100 TB
  * the sketch stage becomes embarrassingly parallel map work and the ONLY
  * shuffle left in the pipelines is the band/bucket join itself.
  *
  * Hash functions are Spark's own codegen'd kernels (murmur3 for the
  * permutation family, XXH64 seed 42 — the `xxhash64()` builtin — for the
  * word hashes), so values are deterministic, engine-version-stable, and
  * carry zero shipped state.
  *
  * Top-level object: Scala emits static forwarders, so generated Java
  * calls these directly and the expressions stay inside whole-stage
  * codegen (no interpreted fallback, no boxing).
  */
object ArraySketch {

  /** 64-perm MinHash signature of a word array: perm i = murmur3 of the
    * word's UTF-8 bytes with seed i (one pass over the words, all 64
    * minima updated per word). Empty arrays are the caller's concern —
    * the pipelines filter them out to preserve the documented
    * "sketches drop empty docs" contract. */
  def minhashSig(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(Dims.NumPerms)(Int.MaxValue)
    var wi = 0
    while (wi < n) {
      if (!arr.isNullAt(wi)) {
        val w = arr.getUTF8String(wi)
        val base = w.getBaseObject
        val off = w.getBaseOffset
        val len = w.numBytes
        var i = 0
        while (i < Dims.NumPerms) {
          val h = Murmur3_x86_32.hashUnsafeBytes(base, off, len, i)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      wi += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash of a word array: bit b is the sign of the sum over
    * words of ±1 by bit b of xxhash64(word) (seed 42 = the builtin, so
    * values are identical to the aggregation formulation it replaces). */
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var wi = 0
    while (wi < n) {
      if (!arr.isNullAt(wi)) {
        val w = arr.getUTF8String(wi)
        val h = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset,
          w.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      wi += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Sorted xxhash64 (seed 42 = the builtin) of each word — the input to
    * the codegen'd two-pointer intersection counts in the exact-verify
    * stages. One allocation, primitive sort; replaces the interpreted
    * `array_sort(transform(words, w -> xxhash64(w)))` lambda (higher-order
    * functions evaluate interpreted per element). */
  def xxhash64Sorted(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        out(m) = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset,
          w.numBytes, 42L)
        m += 1
      }
      i += 1
    }
    val dense = if (m == n) out else java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(dense)
    new GenericArrayData(dense)
  }

  /** Constants split out so [[minhashSig]]'s loop bound is a compile-time
    * constant in the generated code. */
  object Dims {
    val NumPerms = 64
  }
}

/** Base for the three array-sketch expressions: array<string> in, codegen
  * via a single static call. */
sealed trait WordArraySketch extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
}

/** Native expression: 64-perm MinHash signature of a word array
  * (SURVEY.md §2.2 B69/B71 — the sketch side of MinHash-LSH dedup). */
case class MinHashSignature(child: Expression) extends WordArraySketch {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(a: Any): Any =
    ArraySketch.minhashSig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ArraySketch.minhashSig($a);")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

/** Native expression: 64-bit SimHash of a word array (B71). */
case class SimHash64(child: Expression) extends WordArraySketch {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any =
    ArraySketch.simhash64(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ArraySketch.simhash64($a);")

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

/** Native expression: sorted xxhash64 array of a word array — feeds
  * [[SortedIntersectCount]] in the exact-verify joins. */
case class XxHash64Sorted(child: Expression) extends WordArraySketch {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "xxhash64_sorted"

  override def nullSafeEval(a: Any): Any =
    ArraySketch.xxhash64Sorted(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ArraySketch.xxhash64Sorted($a);")

  override protected def withNewChildInternal(
      newChild: Expression): XxHash64Sorted = copy(child = newChild)
}
