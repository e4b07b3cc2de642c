package graft.engine

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import SqliteValue.SqliteEvalError

/** The SQLite json1 scalar family (built into the 3.40.1 oracle; the
  * reference's users reach it through the delegated handle,
  * `db/src/db.rs:278`) — json / json_valid / json_quote / json_extract /
  * json_type / json_array / json_object / json_array_length /
  * json_insert / json_replace / json_set / json_remove / json_patch.
  * The aggregates (json_group_array/json_group_object) compose in
  * [[SqliteFunctions]]; the table-valued json_each/json_tree are not
  * implemented (documented gap — Spark has no SQLite-shaped TVF seam on
  * the OLTP path).
  *
  * Semantics probed live on 3.40.1 and pinned in R15ParitySpec:
  *  - strict RFC JSON (no `+5`, `.5`, `01`, `5.`, `nan` — JSON5 arrived
  *    in 3.42), `malformed JSON` error text;
  *  - minification preserves RAW scalar lexemes (`{"e":2.50}` stays
  *    `2.50`; string escapes stay verbatim) — only whitespace drops, so
  *    the AST keeps raw number/string lexemes;
  *  - the JSON "subtype" propagates through NESTED json function calls
  *    only (`json_array(json('[1]'))` → `[[1]]` but
  *    `json_array('[1]')` → `["[1]"]`) — modeled by composing child
  *    [[SqliteJson]] nodes through [[SqliteJson.evalSub]], never through
  *    stored values (SQLite's rule);
  *  - extraction: objects/arrays render as json text (carrying the
  *    subtype), `true`/`false` → integer 1/0, integral numbers → i64
  *    (overflow → real), `null` → SQL NULL;
  *  - paths: `$`, `.key`, `."quoted key"`, `[n]`, `[#]`, `[#-n]`; a bad
  *    path is `JSON path error near '…'`; a NULL path argument answers
  *    the unmodified document (modification fns) or NULL (extract);
  *  - insert never overwrites, replace never creates, set does both;
  *    missing intermediate containers are created (object for `.key`,
  *    array for `[0]`/`[#]`); array inserts append only at exactly the
  *    current length; BLOB values are `JSON cannot hold BLOB values`;
  *  - json_patch is RFC-7386 merge-patch.
  *
  * Static-typing residue (same family as SURVEY §3's comparison note):
  * a NON-literal json_extract declares StringType, so an integer
  * extracted from a column-held document reports as text through the
  * envelope where SQLite reports integer. All-literal calls fold at
  * build time with full dynamic typing and are exact.
  */
case class SqliteJson(fn: String, children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def nullable: Boolean = true

  override def dataType: DataType = fn match {
    case "json_valid" | "json_array_length" => LongType
    case _ => StringType
  }

  override def eval(input: InternalRow): Any =
    SqliteExprs.fit(dataType, SqliteJson.toSql(evalSub(input)))

  /** Evaluate keeping json-ness: a [[SqliteJson.JRes]] carries the
    * subtype for a parent json call; plain values are SQL scalars. */
  private[engine] def evalSub(input: InternalRow): Any = {
    val args = children.map {
      case j: SqliteJson => j.evalSub(input)
      case jl: SqliteJsonLit => SqliteJson.JRes(jl.j)
      case c => c.eval(input)
    }
    SqliteJson.eval(fn, args)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SqliteJson =
    copy(children = newChildren)

  override def prettyName: String = fn
}

/** A folded json-subtyped literal: evaluates as its rendered-text
  * literal, but a parent json call recovers the structural value from
  * `j` (the subtype never survives storage — SQLite's rule — only the
  * expression tree). Mirrors [[SqliteAffLit]]. */
case class SqliteJsonLit(child: Literal, j: SqliteJson.J)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def withNewChildInternal(c: Expression): SqliteJsonLit =
    copy(child = c.asInstanceOf[Literal])
  override def prettyName: String = "sqlite_jsonlit"
}

object SqliteJson {

  /** name → (minArgs, maxArgs); -1 = unbounded. */
  val arities: Map[String, (Int, Int)] = Map(
    "json" -> (1, 1), "json_valid" -> (1, 1), "json_quote" -> (1, 1),
    "json_extract" -> (2, -1), "json_type" -> (1, 2),
    "json_array" -> (0, -1), "json_object" -> (0, -1),
    "json_array_length" -> (1, 2),
    "json_insert" -> (3, -1), "json_replace" -> (3, -1),
    "json_set" -> (3, -1), "json_remove" -> (1, -1),
    "json_patch" -> (2, 2),
    // the -> and ->> operators (SQLite 3.38+), mapped by
    // SqliteRewrite.rewriteArrows; registered under internal names so a
    // user-typed `->` works while the names stay out of the way
    "__json_arrow" -> (2, 2), "__json_arrow2" -> (2, 2))

  def build(fn: String, args: Seq[Expression]): Expression = {
    val (lo, hi) = arities(fn)
    val shapeOk = args.size >= lo && (hi < 0 || args.size <= hi) &&
      (fn match {
        case "json_object" => args.size % 2 == 0
        case "json_insert" | "json_replace" | "json_set" =>
          args.size % 2 == 1
        case _ => true
      })
    if (!shapeOk) {
      val msg =
        if (fn == "json_object" && args.size % 2 == 1)
          "json_object() requires an even number of arguments"
        else s"wrong number of arguments to function $fn()"
      throw new IllegalArgumentException(msg)
    }
    // All-literal calls fold NOW with full dynamic typing (exact typeof
    // parity); a json-subtyped result keeps its subtype in a
    // [[SqliteJsonLit]] marker so `json_array(json('[1]'))` still embeds
    // as an array, mirroring SqliteAffLit's affinity marker.
    def litVal(e: Expression): Option[Any] = e match {
      case l: Literal => Some(l.value)
      case jl: SqliteJsonLit => Some(JRes(jl.j))
      case _ => None
    }
    val vals = args.map(litVal)
    if (vals.forall(_.isDefined)) {
      eval(fn, vals.map(_.get)) match {
        case r: JRes =>
          SqliteJsonLit(SqliteRewrite.dynLit(toSql(r)), r.j)
        case other => SqliteRewrite.dynLit(other)
      }
    } else SqliteJson(fn, args)
  }

  // ---------- JSON AST (raw lexemes preserved) -----------------------------

  sealed trait J
  case object JNull extends J
  final case class JBool(b: Boolean) extends J
  /** Raw number lexeme as it appeared in the source (or was rendered). */
  final case class JNum(raw: String) extends J
  /** Raw STILL-ESCAPED string body, without the surrounding quotes. */
  final case class JStr(raw: String) extends J
  final case class JArr(items: Vector[J]) extends J
  final case class JObj(fields: Vector[(String, J)]) extends J // raw keys

  /** A json-subtyped result travelling between nested json calls. */
  final case class JRes(j: J)

  private def malformed(): Nothing = throw new SqliteEvalError("malformed JSON")

  // ---------- parser --------------------------------------------------------

  private final class P(s: String) {
    var i = 0
    def ws(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    def value(): J = {
      ws()
      if (i >= s.length) malformed()
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case c if c == '-' || (c >= '0' && c <= '9') => num()
        case _ => malformed()
      }
    }
    private def lit(w: String): Unit = {
      if (!s.startsWith(w, i)) malformed()
      i += w.length
    }
    private def obj(): J = {
      i += 1; ws()
      val fields = Vector.newBuilder[(String, J)]
      if (i < s.length && s.charAt(i) == '}') { i += 1; return JObj(Vector()) }
      var more = true
      while (more) {
        ws()
        if (i >= s.length || s.charAt(i) != '"') malformed()
        val k = str()
        ws()
        if (i >= s.length || s.charAt(i) != ':') malformed()
        i += 1
        fields += ((k, value()))
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else if (i < s.length && s.charAt(i) == '}') { i += 1; more = false }
        else malformed()
      }
      JObj(fields.result())
    }
    private def arr(): J = {
      i += 1; ws()
      val items = Vector.newBuilder[J]
      if (i < s.length && s.charAt(i) == ']') { i += 1; return JArr(Vector()) }
      var more = true
      while (more) {
        items += value()
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else if (i < s.length && s.charAt(i) == ']') { i += 1; more = false }
        else malformed()
      }
      JArr(items.result())
    }
    /** Consume a quoted string; return the raw escaped body. */
    private def str(): String = {
      i += 1 // opening quote
      val start = i
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          if (i + 1 >= s.length) malformed()
          s.charAt(i + 1) match {
            case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' => i += 2
            case 'u' =>
              if (i + 5 >= s.length ||
                !(2 to 5).forall(k => isHex(s.charAt(i + k)))) malformed()
              i += 6
            case _ => malformed()
          }
        } else if (s.charAt(i) < ' ') malformed()
        else i += 1
      }
      if (i >= s.length) malformed()
      val raw = s.substring(start, i)
      i += 1 // closing quote
      raw
    }
    private def isHex(c: Char) = (c >= '0' && c <= '9') ||
      (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    private def num(): J = {
      val start = i
      if (s.charAt(i) == '-') i += 1
      if (i >= s.length || !s.charAt(i).isDigit) malformed()
      if (s.charAt(i) == '0' && i + 1 < s.length && s.charAt(i + 1).isDigit)
        malformed() // leading zero
      while (i < s.length && s.charAt(i).isDigit) i += 1
      if (i < s.length && s.charAt(i) == '.') {
        i += 1
        if (i >= s.length || !s.charAt(i).isDigit) malformed()
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        if (i >= s.length || !s.charAt(i).isDigit) malformed()
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      JNum(s.substring(start, i))
    }
  }

  def parse(s: String): J = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    if (p.i != s.length) malformed()
    v
  }

  // ---------- render --------------------------------------------------------

  def render(j: J): String = {
    val sb = new java.lang.StringBuilder
    render(j, sb)
    sb.toString
  }

  private def render(j: J, sb: java.lang.StringBuilder): Unit = j match {
    case JNull => sb.append("null")
    case JBool(b) => sb.append(if (b) "true" else "false")
    case JNum(raw) => sb.append(raw)
    case JStr(raw) => sb.append('"').append(raw).append('"')
    case JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(','); first = false
        render(it, sb)
      }
      sb.append(']')
    case JObj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, v) =>
        if (!first) sb.append(','); first = false
        sb.append('"').append(k).append("\":")
        render(v, sb)
      }
      sb.append('}')
  }

  /** Decode a raw escaped string body to its value. */
  private def decode(raw: String): String = {
    if (raw.indexOf('\\') < 0) return raw
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) {
        raw.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Escape a string value into a raw JSON body (SQLite's shapes:
    * shorthand escapes for the common controls, \u00xx otherwise). */
  private[engine] def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case cc if cc < ' ' => sb.append(f"\\u${cc.toInt}%04x")
        case cc => sb.append(cc)
      }
      i += 1
    }
    sb.toString
  }

  // ---------- paths ---------------------------------------------------------

  private sealed trait Step
  private final case class Key(k: String) extends Step
  private final case class Idx(i: Int) extends Step
  /** `[#-n]` / `[#]` (n = 0): `#` is the array LENGTH, so the index is
    * `size - n` — `[#-1]` is the last element, `[#]` the append slot. */
  private final case class End(back: Int) extends Step

  private def pathError(rest: String): Nothing =
    throw new SqliteEvalError(s"JSON path error near '$rest'")

  private def parsePath(p: String): List[Step] = {
    if (p.isEmpty || p.charAt(0) != '$') pathError(p)
    var i = 1
    val steps = List.newBuilder[Step]
    while (i < p.length) {
      p.charAt(i) match {
        case '.' =>
          i += 1
          if (i < p.length && p.charAt(i) == '"') {
            val end = p.indexOf('"', i + 1)
            if (end < 0) pathError(p.substring(i))
            steps += Key(p.substring(i + 1, end))
            i = end + 1
          } else {
            val start = i
            while (i < p.length && p.charAt(i) != '.' && p.charAt(i) != '[')
              i += 1
            if (i == start) pathError(p.substring(start))
            steps += Key(p.substring(start, i))
          }
        case '[' =>
          val end = p.indexOf(']', i)
          if (end < 0) pathError(p.substring(i))
          val body = p.substring(i + 1, end)
          if (body == "#") steps += End(0)
          else if (body.startsWith("#-") &&
            body.drop(2).forall(_.isDigit) && body.length > 2)
            steps += End(body.drop(2).toInt)
          else if (body.nonEmpty && body.forall(_.isDigit))
            steps += Idx(body.toInt)
          else pathError(p.substring(i))
          i = end + 1
        case _ => pathError(p.substring(i))
      }
    }
    steps.result()
  }

  private def lookup(j: J, steps: List[Step]): Option[J] = steps match {
    case Nil => Some(j)
    case Key(k) :: rest => j match {
      case JObj(fields) =>
        fields.find(f => decode(f._1) == k).flatMap(f => lookup(f._2, rest))
      case _ => None
    }
    case Idx(n) :: rest => j match {
      case JArr(items) if n >= 0 && n < items.size => lookup(items(n), rest)
      case _ => None
    }
    case End(back) :: rest => j match {
      case JArr(items)
          if items.size - back >= 0 && items.size - back < items.size =>
        lookup(items(items.size - back), rest)
      case _ => None
    }
  }

  /** Apply set/insert/replace at a path. `create`: may create the leaf
    * (insert/set); `overwrite`: may replace an existing leaf
    * (replace/set). Missing intermediate containers are created when
    * `create` (object for a key step, array for `[0]`/`[#]`). */
  private def put(j: J, steps: List[Step], v: J, create: Boolean,
                  overwrite: Boolean): J = steps match {
    case Nil => if (overwrite) v else j
    case Key(k) :: rest => j match {
      case JObj(fields) =>
        val idx = fields.indexWhere(f => decode(f._1) == k)
        if (idx >= 0)
          JObj(fields.updated(idx,
            (fields(idx)._1, put(fields(idx)._2, rest, v, create, overwrite))))
        else if (create)
          mkLeaf(rest, v).map(leaf => JObj(fields :+ ((escape(k), leaf))))
            .getOrElse(j)
        else j
      case _ => j
    }
    case Idx(n) :: rest => j match {
      case JArr(items) =>
        if (n >= 0 && n < items.size)
          JArr(items.updated(n, put(items(n), rest, v, create, overwrite)))
        else if (n == items.size && create)
          mkLeaf(rest, v).map(leaf => JArr(items :+ leaf)).getOrElse(j)
        else j
      case _ => j
    }
    case End(back) :: rest => j match {
      case JArr(items) =>
        val n = items.size - back
        if (n >= 0 && n < items.size)
          JArr(items.updated(n, put(items(n), rest, v, create, overwrite)))
        else if (n == items.size && create) // `[#]` appends
          mkLeaf(rest, v).map(leaf => JArr(items :+ leaf)).getOrElse(j)
        else j
      case _ => j
    }
  }

  /** Containers for the remaining steps when creating a missing leaf. */
  private def mkLeaf(rest: List[Step], v: J): Option[J] = rest match {
    case Nil => Some(v)
    case Key(k) :: more =>
      mkLeaf(more, v).map(leaf => JObj(Vector((escape(k), leaf))))
    case Idx(0) :: more => mkLeaf(more, v).map(leaf => JArr(Vector(leaf)))
    case End(0) :: more => mkLeaf(more, v).map(leaf => JArr(Vector(leaf)))
    case _ => None
  }

  private def remove(j: J, steps: List[Step]): Option[J] = steps match {
    case Nil => None // removing the root yields NULL
    case Key(k) :: Nil => j match {
      case JObj(fields) => Some(JObj(fields.filterNot(f => decode(f._1) == k)))
      case _ => Some(j)
    }
    case Key(k) :: rest => j match {
      case JObj(fields) =>
        val idx = fields.indexWhere(f => decode(f._1) == k)
        if (idx < 0) Some(j)
        else remove(fields(idx)._2, rest) match {
          case Some(sub) =>
            Some(JObj(fields.updated(idx, (fields(idx)._1, sub))))
          case None =>
            Some(JObj(fields.patch(idx, Nil, 1)))
        }
      case _ => Some(j)
    }
    case (step @ (Idx(_) | End(_))) :: rest => j match {
      case JArr(items) =>
        val n = step match {
          case Idx(x) => x
          case End(back) => items.size - back
          case _ => -1
        }
        if (n < 0 || n >= items.size) Some(j)
        else if (rest.isEmpty) Some(JArr(items.patch(n, Nil, 1)))
        else remove(items(n), rest) match {
          case Some(sub) => Some(JArr(items.updated(n, sub)))
          case None => Some(JArr(items.patch(n, Nil, 1)))
        }
      case _ => Some(j)
    }
  }

  /** RFC-7386 merge patch (probed). */
  private def mergePatch(target: J, patch: J): J = patch match {
    case JObj(pf) =>
      val base = target match {
        case o: JObj => o.fields
        case _ => Vector.empty[(String, J)]
      }
      var out = base
      pf.foreach { case (rawK, pv) =>
        val k = decode(rawK)
        val idx = out.indexWhere(f => decode(f._1) == k)
        pv match {
          case JNull =>
            if (idx >= 0) out = out.patch(idx, Nil, 1)
          case _ =>
            val merged =
              if (idx >= 0) mergePatch(out(idx)._2, pv)
              else mergePatch(JNull, pv)
            out =
              if (idx >= 0) out.updated(idx, (out(idx)._1, merged))
              else out :+ ((rawK, merged))
        }
      }
      JObj(out)
    case other => other
  }

  // ---------- SQL <-> JSON value bridging ----------------------------------

  /** An argument value (possibly a [[JRes]] from a nested json call) as
    * a J node for embedding. JRes is matched BEFORE SqliteValue.norm —
    * norm only understands SQL value classes. */
  private def toJ(a0: Any): J = (a0 match {
    case r: JRes => r
    case other => SqliteValue.norm(other)
  }) match {
    case JRes(j) => j
    case null => JNull
    case l: java.lang.Long => JNum(l.toString)
    case d: java.lang.Double => JNum(SqliteValue.renderReal(d.doubleValue))
    case s: UTF8String => JStr(escape(s.toString))
    case b: java.lang.Boolean => JNum(if (b.booleanValue) "1" else "0")
    case _: Array[Byte] =>
      throw new SqliteEvalError("JSON cannot hold BLOB values")
    case other => JStr(escape(SqliteValue.renderText(other)))
  }

  /** The document argument: a JRes passes through; text parses. */
  private def docOf(a0: Any): J = (a0 match {
    case r: JRes => r
    case other => SqliteValue.norm(other)
  }) match {
    case JRes(j) => j
    case s: UTF8String => parse(s.toString)
    case b: Array[Byte] =>
      parse(new String(b, java.nio.charset.StandardCharsets.UTF_8))
    case l: java.lang.Long => JNum(l.toString)
    case d: java.lang.Double => JNum(SqliteValue.renderReal(d.doubleValue))
    case _ => malformed()
  }

  private def pathOf(a: Any): List[Step] = SqliteValue.norm(a) match {
    case s: UTF8String => parsePath(s.toString)
    case b: Array[Byte] =>
      parsePath(new String(b, java.nio.charset.StandardCharsets.UTF_8))
    case _ => pathError(SqliteValue.renderText(a))
  }

  /** Extraction result: containers keep the subtype; scalars unwrap. */
  private def extracted(j: J): Any = j match {
    case JNull => null
    case JBool(b) => java.lang.Long.valueOf(if (b) 1L else 0L)
    case JNum(raw) =>
      if (raw.indexOf('.') < 0 && raw.indexOf('e') < 0 &&
        raw.indexOf('E') < 0)
        try java.lang.Long.valueOf(raw.toLong)
        catch { case _: NumberFormatException =>
          java.lang.Double.valueOf(raw.toDouble) }
      else java.lang.Double.valueOf(raw.toDouble)
    case JStr(raw) => UTF8String.fromString(decode(raw))
    case container => JRes(container)
  }

  /** A result (JRes or plain value) as the final SQL value. */
  private[engine] def toSql(a: Any): Any = a match {
    case JRes(j) => UTF8String.fromString(render(j))
    case other => other
  }

  // ---------- dispatcher ----------------------------------------------------

  def eval(fn: String, args: Seq[Any]): Any = {
    def norm(a: Any): Any = a match {
      case r: JRes => r
      case other => SqliteValue.norm(other)
    }
    val as = args.map(norm)
    fn match {
      case "json" =>
        if (as.head == null) return null
        JRes(docOf(as.head))

      case "json_valid" => as.head match {
        case null => java.lang.Long.valueOf(0L)
        case a =>
          try { docOf(a); java.lang.Long.valueOf(1L) }
          catch { case _: SqliteEvalError => java.lang.Long.valueOf(0L) }
      }

      case "json_quote" => as.head match {
        case null => JRes(JNull)
        case a => JRes(toJ(a))
      }

      case "json_extract" =>
        if (as.exists(_ == null)) return null
        val doc = docOf(as.head)
        val hits = as.tail.map(p => lookup(doc, pathOf(p)))
        if (hits.size == 1) hits.head.map(extracted).orNull
        else JRes(JArr(hits.map(_.getOrElse(JNull)).toVector))

      case "json_type" =>
        if (as.exists(_ == null)) return null
        val doc = docOf(as.head)
        val target =
          if (as.size > 1) lookup(doc, pathOf(as(1)))
          else Some(doc)
        target.map { j =>
          UTF8String.fromString(j match {
            case JNull => "null"
            case JBool(b) => if (b) "true" else "false"
            case JNum(raw) =>
              if (raw.indexOf('.') < 0 && raw.indexOf('e') < 0 &&
                raw.indexOf('E') < 0) "integer"
              else "real"
            case _: JStr => "text"
            case _: JArr => "array"
            case _: JObj => "object"
          })
        }.orNull

      case "json_array" => JRes(JArr(as.map(toJ).toVector))

      case "json_object" =>
        val fields = Vector.newBuilder[(String, J)]
        as.grouped(2).foreach {
          case Seq(k, v) =>
            val key = k match {
              case s: UTF8String => escape(s.toString)
              case _ => throw new SqliteEvalError(
                "json_object() labels must be TEXT")
            }
            fields += ((key, toJ(v)))
          case _ =>
        }
        JRes(JObj(fields.result()))

      case "json_array_length" =>
        if (as.head == null) return null
        val doc = docOf(as.head)
        val target =
          if (as.size > 1) {
            if (as(1) == null) return null
            lookup(doc, pathOf(as(1)))
          } else Some(doc)
        target.map {
          case JArr(items) => java.lang.Long.valueOf(items.size.toLong)
          case _ => java.lang.Long.valueOf(0L)
        }.orNull

      case "json_insert" | "json_replace" | "json_set" =>
        if (as.head == null) return null
        var doc = docOf(as.head)
        val create = fn != "json_replace"
        val overwrite = fn != "json_insert"
        as.tail.grouped(2).foreach {
          case Seq(p, v) if p != null =>
            doc = put(doc, pathOf(p), toJ(v), create, overwrite)
          case _ => // NULL path: that pair is a no-op (probed)
        }
        JRes(doc)

      case "json_remove" =>
        if (as.head == null) return null
        var doc: Option[J] = Some(docOf(as.head))
        as.tail.foreach { p =>
          if (p == null) return null
          doc = doc.flatMap(d => remove(d, pathOf(p)))
        }
        doc.map(JRes(_)).orNull

      case "json_patch" =>
        if (as.exists(_ == null)) return null
        JRes(mergePatch(docOf(as.head), docOf(as(1))))

      case "__json_arrow" | "__json_arrow2" =>
        // `doc -> p` / `doc ->> p` with the 3.38 shorthand paths: text
        // not starting with `$` is `$.text`, an integer is `$[n]`
        // (probed). `->` answers the JSON TEXT of the sub-value (always
        // text, subtype kept for chaining); `->>` answers the SQL value
        // (containers render as plain text).
        if (as.head == null || as(1) == null) return null
        val doc = docOf(as.head)
        val steps = as(1) match {
          case s: UTF8String if s.toString.startsWith("$") =>
            parsePath(s.toString)
          case s: UTF8String => List(Key(s.toString): Step)
          case l: java.lang.Long => List(Idx(l.intValue): Step)
          case d: java.lang.Double => List(Idx(d.intValue): Step)
          case other => List(Key(SqliteValue.renderText(other)): Step)
        }
        lookup(doc, steps) match {
          case None => null
          case Some(j) =>
            if (fn == "__json_arrow") JRes(j)
            else j match {
              case JNull => null
              case container @ (_: JArr | _: JObj) =>
                UTF8String.fromString(render(container))
              case scalar => extracted(scalar)
            }
        }

      case other =>
        throw new IllegalStateException(s"unknown json function: $other")
    }
  }
}
