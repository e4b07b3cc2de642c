package graft.engine

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}

/** Literal fast path for `INSERT ... VALUES` tuples.
  *
  * A single-row INSERT through the envelope otherwise pays a full Catalyst
  * parse/analyze/execute round-trip (`session.sql("SELECT * FROM (VALUES
  * ...)")` + a cast projection + collect ≈ 4 ms), which dominates OLTP
  * throughput — the one performance figure the reference publishes
  * (single-row INSERT ops/sec, reference `README.md:27`). When every value
  * in every tuple is a plain literal whose parsed value is BIT-IDENTICAL
  * to what `CAST(<literal> AS <declared type>)` produces through Catalyst,
  * the rows are built directly on the driver. Anything else — expressions,
  * function calls, blobs, hex/boolean literals, backslashes in strings
  * (Spark's parser treats `\` as an escape), literal/type combinations
  * with nontrivial coercion, out-of-Long-range integers — returns None and
  * the caller keeps the exact Catalyst path, so observable semantics
  * (including error messages) are unchanged.
  *
  * Accepted (literal, declared type) pairs:
  *  - NULL → any type (null)
  *  - integer literal → BIGINT (Long), DOUBLE (widened — SQLite NUMERIC
  *    affinity maps to DoubleType here), STRING (decimal digits: Spark
  *    renders integral casts the same way)
  *  - decimal/scientific literal → DOUBLE only (`parseDouble` and
  *    Catalyst's decimal-literal-then-cast both round correctly to
  *    nearest, so the bits agree)
  *  - single-quoted string ('' self-escape, no backslash) → STRING only
  */
private[engine] object FastValues {

  private val intRe = "^[+-]?\\d+$".r
  private val realRe =
    "^[+-]?(?:(?:\\d+\\.\\d*|\\.\\d+)(?:[eE][+-]?\\d+)?|\\d+[eE][+-]?\\d+)$".r

  /** Parse a VALUES tail ("(...), (...)") into typed Rows, or None when any
    * tuple/value is outside the safe matrix above (caller falls back). */
  def rows(tail: String, cols: Seq[ColDef]): Option[IndexedSeq[Row]] = {
    val tuples = SqlText.splitTopLevel(tail).map(_.trim).filter(_.nonEmpty)
    if (tuples.isEmpty) return None
    val out = IndexedSeq.newBuilder[Row]
    tuples.foreach { t =>
      if (!(t.startsWith("(") && t.endsWith(")"))) return None
      val vals = SqlText.splitTopLevel(t.substring(1, t.length - 1))
      if (vals.size != cols.size) return None
      val row = new Array[Any](cols.size)
      var i = 0
      while (i < cols.size) {
        literal(vals(i).trim, cols(i).sparkType) match {
          case Right(v) => row(i) = v
          case Left(_) => return None
        }
        i += 1
      }
      out += Row.fromSeq(row.toIndexedSeq)
    }
    Some(out.result())
  }

  /** One literal against one declared type; Left = not fast-path-safe. */
  private def literal(tok: String, dt: DataType): Either[Unit, Any] = {
    if (tok.equalsIgnoreCase("NULL")) Right(null)
    else if (tok.length >= 2 && tok.head == '\'' && tok.last == '\'')
      dt match {
        case StringType => unquote(tok.substring(1, tok.length - 1))
        case _ => Left(())
      }
    else if (intRe.matches(tok))
      try {
        val v = tok.toLong
        dt match {
          case LongType => Right(v)
          case DoubleType => Right(v.toDouble)
          case StringType => Right(v.toString)
          case _ => Left(())
        }
      } catch { case _: NumberFormatException => Left(()) }
    else if (realRe.matches(tok))
      dt match {
        case DoubleType =>
          val d = java.lang.Double.parseDouble(tok)
          // -0.0: Catalyst's decimal-literal route may lose the sign bit
          // (BigDecimal has no negative zero); overflow-to-infinity is
          // likewise route-dependent. Both are rare — let Catalyst decide.
          if (d.isInfinite || (d == 0.0 && tok.startsWith("-"))) Left(())
          else Right(d)
        case _ => Left(())
      }
    else Left(())
  }

  /** Undo '' self-escaping; bail on backslash (Catalyst escape semantics)
    * or a stray single quote (means splitTopLevel saw a different shape
    * than we assume — never guess). */
  private def unquote(body: String): Either[Unit, String] = {
    if (body.indexOf('\\') >= 0) return Left(())
    val sb = new java.lang.StringBuilder(body.length)
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\'') {
        if (i + 1 >= body.length || body.charAt(i + 1) != '\'') return Left(())
        sb.append('\''); i += 2
      } else { sb.append(c); i += 1 }
    }
    Right(sb.toString)
  }
}
