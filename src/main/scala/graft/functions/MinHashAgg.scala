package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** Typed UDAF (SURVEY.md §2.2 B69): 64-permutation MinHash signature as an
  * `Aggregator[token, sig, sig]` — partial aggregation (reduce) runs
  * map-side, merge is an elementwise min, so the shuffle carries one
  * 256-byte signature per group instead of the token multiset. That
  * map-side combine is the whole point at 100 TB.
  *
  * The hash family is Spark's murmur3 over the token's UTF-8 bytes with
  * the permutation index as the seed — bit-for-bit identical to
  * [[ArraySketch.minhashSig]], so signatures from this Aggregator and from
  * [[graft.ext.Dedup.signatures]] are interchangeable (pinned in spec).
  */
object MinHashAgg extends Aggregator[String, Array[Int], Array[Int]] {
  val NumPerms = 64

  /** murmur3(utf8 bytes of tok, seed = permutation index) — the
    * [[ArraySketch.minhashSig]] family. */
  def hashTok(tok: String, i: Int): Int = {
    val u = UTF8String.fromString(tok)
    org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
      u.getBaseObject, u.getBaseOffset, u.numBytes, i)
  }

  override def zero: Array[Int] = Array.fill(NumPerms)(Int.MaxValue)

  override def reduce(buf: Array[Int], tok: String): Array[Int] = {
    var i = 0
    while (i < NumPerms) {
      val h = hashTok(tok, i)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < NumPerms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Int]): Array[Int] = r

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
}
