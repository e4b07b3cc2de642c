package graft.engine

import java.net.URLDecoder

import graft.SparkSpec
import graft.command.Value

/** Differential battery for the OLTP read path's SQLite expression
  * semantics: every line of sqlite_expr_golden.tsv was captured from the
  * REAL SQLite (tools/gen_expr_golden.py, python's bundled 3.40+ — the
  * same oracle the OLTP fuzzer uses) and replays here through GraftDb,
  * comparing value-by-value with doubles bit-exact.
  *
  * Regenerate after extending the battery:
  *   python3 tools/gen_expr_golden.py
  */
class SqliteExprSpec extends SparkSpec {

  private def dec(s: String): String = URLDecoder.decode(s, "UTF-8")

  private def parseCell(c: String): Option[Value] = c match {
    case "N" => Some(Value.Null)
    case _ if c.startsWith("I:") => Some(Value.Integer(c.drop(2).toLong))
    case _ if c.startsWith("R:") => Some(Value.Real(
      java.lang.Double.longBitsToDouble(
        java.lang.Long.parseUnsignedLong(c.drop(2), 16))))
    case _ if c.startsWith("T:") => Some(Value.Text(dec(c.drop(2))))
    case _ if c.startsWith("B:") => Some(Value.Blob(
      c.drop(2).sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray))
    case _ => None
  }

  private def show(v: Value): String = v match {
    case Value.Null => "NULL"
    case Value.Integer(x) => s"i:$x"
    case Value.Real(x) => s"r:$x"
    case Value.Text(x) => s"t:'$x'"
    case Value.Blob(x) => "b:" + x.map("%02x".format(_)).mkString
  }

  private def sameCell(a: Value, b: Value): Boolean = (a, b) match {
    case (Value.Blob(x), Value.Blob(y)) => java.util.Arrays.equals(x, y)
    case (Value.Real(x), Value.Real(y)) =>
      java.lang.Double.doubleToLongBits(x) ==
        java.lang.Double.doubleToLongBits(y)
    case _ => a == b
  }

  test("sqlite expression golden battery (differential vs real SQLite)") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/sqlite_expr_golden.tsv"), "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    val db = GraftDb.openInMemory(spark)
    val failures = Seq.newBuilder[String]
    var nQ = 0
    lines.foreach { line =>
      val parts = line.split("\t", -1)
      parts(0) match {
        case "S" =>
          val sql = dec(parts(1))
          db.executeStringStmt(sql).left.foreach(e =>
            failures += s"SETUP FAILED: $sql -> $e")
        case "Q" =>
          nQ += 1
          val sql = dec(parts(1))
          val ncols = parts(2).toInt
          val cells =
            if (parts(3).isEmpty) Vector.empty
            else parts(3).split(" ").toVector.map(c => parseCell(c).get)
          val want: Seq[Seq[Value]] =
            if (ncols == 0) Nil else cells.grouped(ncols).toVector
          db.queryStringStmt(sql) match {
            case Left(err) => failures += s"$sql -> engine error: $err"
            case Right(rs) =>
              val got = rs.head.values
              if (got.size != want.size)
                failures += s"$sql -> rows ${got.size} != ${want.size}: " +
                  got.map(_.map(show).mkString(",")).mkString(" | ")
              else got.zip(want).zipWithIndex.foreach {
                case ((g, w), ri) =>
                  if (g.size != w.size)
                    failures += s"$sql -> row $ri arity ${g.size} != ${w.size}"
                  else g.zip(w).zipWithIndex.foreach { case ((gv, wv), ci) =>
                    if (!sameCell(gv, wv))
                      failures += s"$sql -> [$ri,$ci] got ${show(gv)} " +
                        s"want ${show(wv)}"
                  }
              }
          }
        case "E" =>
          nQ += 1
          val sql = dec(parts(1)); val wantErr = dec(parts(2))
          db.queryStringStmt(sql) match {
            case Left(err) =>
              if (err != wantErr)
                failures += s"$sql -> error '$err' want '$wantErr'"
            case Right(_) => failures += s"$sql -> succeeded, want error"
          }
        case _ => fail(s"bad golden line: $line")
      }
    }
    db.close()
    val fs = failures.result()
    assert(fs.isEmpty,
      s"\n${fs.size}/$nQ probes diverged:\n" + fs.mkString("\n"))
  }
}
