package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import scala.util.hashing.MurmurHash3

/** Count-min frequency sketch as a typed Aggregator — approximate token
  * counts with NO shuffle keyed on the token: every map partition folds
  * its tokens into a fixed d×w grid, and the shuffle carries only the
  * d·w longs (one grid per partition, elementwise-summed). The exact
  * alternative is a full groupBy(token) shuffle of the corpus; at crawl
  * scale the sketch path is the only one whose traffic is independent of
  * the vocabulary.
  *
  * Guarantees (standard count-min): estimate(t) >= true count(t) always
  * (hash collisions only ADD); estimate(t) <= true + ε·N with probability
  * 1−δ for w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉. The never-underestimates side is
  * deterministic — which is what lets the x80 driver row assert
  * `est >= exact` as a DuckDB-checkable boolean.
  *
  * Hashes are MurmurHash3 with fixed seeds — pure, JVM-stable, so the
  * sketch is reproducible run-to-run (the suite's determinism contract).
  */
object CountMin {
  val Depth = 4
  val Width = 1024

  def bucket(row: Int, tok: String): Int =
    (MurmurHash3.stringHash(tok, 0x9747b28c + row) & Int.MaxValue) % Width

  def estimate(sketch: Array[Long], tok: String): Long =
    (0 until Depth).map(i => sketch(i * Width + bucket(i, tok))).min

  val agg: Aggregator[String, Array[Long], Array[Long]] =
    new Aggregator[String, Array[Long], Array[Long]] {
      def zero: Array[Long] = new Array[Long](Depth * Width)
      def reduce(b: Array[Long], tok: String): Array[Long] = {
        var i = 0
        while (i < Depth) { b(i * Width + bucket(i, tok)) += 1; i += 1 }
        b
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      def finish(r: Array[Long]): Array[Long] = r
      def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
}
