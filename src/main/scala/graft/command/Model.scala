package graft.command

/** Typed request/response command model — the engine envelope.
  *
  * Mirrors the reference's command crate semantically
  * (`command/src/lib.rs:14-75` in /root/reference): a batch of SQL
  * statements with positional parameters, write results as
  * (last_insert_id, rows_affected, error) with zero/empty suppression, and
  * read results as a row-major {columns, types, values} envelope with
  * SQLite's lowercase type-tag vocabulary. JSON must byte-match the
  * reference's serde output (golden-pinned in CommandJsonSpec).
  */
sealed trait Value
object Value {
  case object Null extends Value
  final case class Integer(v: Long) extends Value
  final case class Real(v: Double) extends Value
  final case class Text(v: String) extends Value
  final case class Blob(v: Array[Byte]) extends Value
}

/** Bind parameters are narrower than values — no Null/Blob binding
  * (reference `command/src/lib.rs:26-30`). */
sealed trait Parameter
object Parameter {
  final case class Integer(v: Long) extends Parameter
  final case class Real(v: Double) extends Parameter
  final case class Text(v: String) extends Parameter
}

final case class Statement(sql: String, parameters: Seq[Parameter] = Nil)

final case class Request(transaction: Boolean, statements: Seq[Statement])

/** Outcome of one mutating statement. Fields are suppressed in JSON when
  * zero/empty (reference `command/src/lib.rs:34-41`). last_insert_id is
  * CONNECTION-level state: it reports the rowid of the most recent
  * successful insert on this database, even for UPDATE responses
  * (reference golden `db/src/db.rs:398-401`). */
final case class Response(lastInsertId: Long = 0, rowsAffected: Long = 0,
                          error: String = "")

/** Outcome of one row-returning statement. An empty result carries empty
  * columns/types (the reference sniffs types from the first row —
  * `db/src/db.rs:247-257` — and its golden `db/src/db.rs:427-432` pins the
  * empty envelope; we reproduce that shape for parity even though our
  * schema is static). */
final case class RowsResult(columns: Seq[String], types: Seq[String],
                            values: Seq[Seq[Value]])

/** Hand-rolled JSON writer (byte-parity with serde) + Jackson-based reader
  * (Jackson ships on Spark's classpath). */
object Json {

  /** Escape + surrounding quotes — a complete JSON string literal. */
  def escapeQ(s: String): String = "\"" + escape(s) + "\""

  def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** Render a double the way serde_json does: integral values keep a
    * trailing ".0", others use the shortest roundtrip form (Java's
    * Double.toString matches for the value domain the goldens cover). */
  def real(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString

  def value(v: Value): String = v match {
    case Value.Null => "null"
    case Value.Integer(i) => i.toString
    case Value.Real(r) => real(r)
    case Value.Text(t) => "\"" + escape(t) + "\""
    case Value.Blob(b) => b.map(x => (x & 0xff).toString).mkString("[", ",", "]")
  }

  def response(r: Response): String = {
    val parts = Seq.newBuilder[String]
    if (r.lastInsertId != 0) parts += s""""last_insert_id":${r.lastInsertId}"""
    if (r.rowsAffected != 0) parts += s""""rows_affected":${r.rowsAffected}"""
    if (r.error.nonEmpty) parts += s""""error":"${escape(r.error)}""""
    parts.result().mkString("{", ",", "}")
  }

  def responses(rs: Seq[Response]): String =
    rs.map(response).mkString("[", ",", "]")

  def rows(r: RowsResult): String = {
    val cols = r.columns.map(c => "\"" + escape(c) + "\"").mkString("[", ",", "]")
    val tps = r.types.map(t => "\"" + t + "\"").mkString("[", ",", "]")
    val vals = r.values
      .map(_.map(value).mkString("[", ",", "]")).mkString("[", ",", "]")
    s"""{"columns":$cols,"types":$tps,"values":$vals}"""
  }

  def rowsSeq(rs: Seq[RowsResult]): String =
    rs.map(rows).mkString("[", ",", "]")

  // ---- reading (Jackson from Spark's classpath) ----

  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  private val mapper = new ObjectMapper()

  /** Parse `{"request":{"transaction":bool,"statements":[{"sql":...,
    * "parameters":[...]}]}}`. Parameters accept the serde enum encoding
    * ({"Integer":1} / {"Real":1.5} / {"Text":"x"}) and bare JSON scalars. */
  def parseRequest(body: String): Either[String, Request] =
    try {
      val root = mapper.readTree(body)
      val req = if (root.has("request")) root.get("request") else root
      if (req == null || !req.isObject) return Left("malformed request")
      val tx = req.path("transaction").asBoolean(false)
      val stmts = Seq.newBuilder[Statement]
      val arr = req.path("statements")
      if (!arr.isArray) return Left("statements must be an array")
      arr.forEach { s =>
        val sql = s.path("sql").asText("")
        val params = Seq.newBuilder[Parameter]
        val ps = s.path("parameters")
        if (ps.isArray) ps.forEach { p => params += parseParam(p) }
        stmts += Statement(sql, params.result())
      }
      Right(Request(tx, stmts.result()))
    } catch { case e: Exception => Left(s"bad json: ${e.getMessage}") }

  private def parseParam(p: JsonNode): Parameter =
    if (p.isObject && p.has("Integer")) Parameter.Integer(p.get("Integer").asLong)
    else if (p.isObject && p.has("Real")) Parameter.Real(p.get("Real").asDouble)
    else if (p.isObject && p.has("Text")) Parameter.Text(p.get("Text").asText)
    else if (p.isIntegralNumber) Parameter.Integer(p.asLong)
    else if (p.isFloatingPointNumber) Parameter.Real(p.asDouble)
    else Parameter.Text(p.asText)
}
