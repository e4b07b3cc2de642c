package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Typed UDAF (SURVEY.md §2.2 B69): 64-permutation MinHash signature as an
  * `Aggregator[token, sig, sig]` — partial aggregation (reduce) runs
  * map-side, merge is an elementwise min, so the shuffle carries one
  * 256-byte signature per group instead of the token multiset. That
  * map-side combine is the whole point at 100 TB.
  *
  * The hash family is Catalyst's murmur3 folded over (token, permIndex)
  * with the default seed — bit-for-bit identical to the SQL expression
  * `hash(tok, i)`, so signatures from this Aggregator and from
  * [[graft.ext.Dedup.signatures]] are interchangeable (pinned in spec).
  */
object MinHashAgg extends Aggregator[String, Array[Int], Array[Int]] {
  val NumPerms = 64

  /** Catalyst's hash(tok, i): fold murmur3 over both inputs, seed 42. */
  def hashTok(tok: String, i: Int): Int = {
    val h1 = Murmur3HashFunction.hash(UTF8String.fromString(tok), StringType, 42L)
    Murmur3HashFunction.hash(i, IntegerType, h1).toInt
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
