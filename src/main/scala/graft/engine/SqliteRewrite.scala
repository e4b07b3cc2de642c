package graft.engine

import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedHaving, UnresolvedInlineTable}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, CollectList}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, Join, LocalLimit, LogicalPlan, Offset}
import org.apache.spark.sql.graft.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

import SqliteValue.SqliteEvalError

/** Pre-analysis plan rewrite giving the engine's OLTP SQL path SQLite
  * expression semantics (the reference executes user statements inside
  * SQLite itself, `db/src/db.rs:278`; this engine executes them on
  * Spark, whose ANSI dialect diverges on division, LIKE case folding,
  * CAST of malformed text, typeof vocabulary, and mixed-type
  * comparisons — all probed live on 3.40 and pinned in SqliteExprSpec).
  *
  * Substitution strategy, sized to keep Catalyst's planning intact:
  *  - operators (`+ - * / %`, unary minus, `& | ~`, LIKE, CAST) are
  *    ALWAYS rewritten to the [[SqliteExprs]] forms;
  *  - comparisons are rewritten only when ONE side is a literal — the
  *    shape where Spark's ANSI coercion errors or answers differently
  *    (`i = 'abc'`), while column-to-column comparisons stay native so
  *    equi-join planning and pushdown survive (cross-TYPE column
  *    comparisons are a documented static-typing residue, SURVEY §3);
  *  - all-literal subtrees fold at rewrite time with FULL dynamic
  *    typing, so literal probes get SQLite's exact value classes
  *    ('12abc'+1 → integer 13) even where a column expression would
  *    declare real;
  *  - WHERE/HAVING/JOIN/CASE conditions pass through SQLite's truth
  *    coercion ([[SqliteTruth]]) unless syntactically boolean already.
  */
object SqliteRewrite {

  /** Run one OLTP statement with SQLite expression semantics. */
  def run(session: SparkSession, sqlText: String,
          caseSensitiveLike: Boolean): DataFrame = {
    val text = preText(rewriteArrows(sqlText))
    val plan = GraftSql.parsePlan(session, text)
    checkFunctions(plan)
    GraftSql.ofRows(session, rewrite(plan, caseSensitiveLike))
  }

  /** Closed function registry (VERDICT r14 #6): a name the SQLite 3.40
    * oracle lacks — or that this engine neither implements nor
    * deliberately delegates — fails at prepare time with SQLite's error
    * text, instead of resolving to whatever Spark builtin happens to
    * share the name. */
  private def checkFunctions(plan: LogicalPlan): Unit =
    plan.transformDownWithSubqueries { case p =>
      p.expressions.foreach(_.foreach {
        case uf: UnresolvedFunction if uf.nameParts.size == 1 &&
            !SqliteFunctions.known(uf.nameParts.head.toLowerCase) =>
          throw new SqliteEvalError(
            s"no such function: ${uf.nameParts.head}")
        case _ =>
      })
      p
    }

  // ---------- text-level pass: GLOB token, RLIKE/REGEXP rejection ----------

  /** Text-level adjustments between SQLite's dialect and Spark's
    * grammar, all quote-aware (backticks count: aliasSelectList's
    * verbatim expression names keep their SQLite spelling):
    *  - backslashes inside string literals double, because Spark's
    *    parser treats `\` as an escape while SQLite has none ('C:\dir'
    *    must stay five characters) — this is the ONLY place engine text
    *    crosses into Spark's parser, so journal/trigger/view text stays
    *    SQLite-shaped everywhere else;
    *  - the GLOB operator token maps onto RLIKE (same precedence slot;
    *    the plan rewrite turns the node into [[SqliteGlob]]) — but not
    *    `glob(`, the function form. Raw RLIKE/REGEXP get SQLite's own
    *    responses first, so the mapping is unambiguous;
    *  - `CAST(… AS TEXT|CLOB|BLOB)` type names map to Spark's
    *    (STRING/BINARY) — recognized as `AS <name> )`, which a column
    *    alias can never produce outside a parenthesized subquery tail;
    *  - bare `IS` / `IS NOT` between scalars (SQLite null-safe equality)
    *    map onto `IS [NOT] DISTINCT FROM`, which Spark's grammar accepts
    *    (`IS [NOT] NULL` and already-spelled DISTINCT forms untouched);
    *  - `0x`-prefixed hex integer literals become decimal (SQLite reads
    *    them as two's-complement i64: 0xFFFFFFFFFFFFFFFF → -1; more than
    *    16 digits is SQLite's `hex literal too big` error — probed);
    *  - negative LIMIT means no bound and negative OFFSET means zero
    *    (probed `SELECT 1 LIMIT -1` → 1 row), and the `LIMIT a, b` comma
    *    form (= LIMIT b OFFSET a) is rewritten — literal counts only. */
  private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  // ---------- `->` / `->>` operator mapping (SQLite 3.38+) ------------------

  /** One lexed token: kind 's' string, 'q' quoted ident (`"` or backtick),
    * 'n' number, 'i' ident, 'o' operator, 'p' punctuation, 'c' comment. */
  private final case class Tok(kind: Char, text: String, start: Int, end: Int)

  private def lex(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    def isW(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    while (i < sql.length) {
      val c = sql.charAt(i)
      val start = i
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        i += 1
        var done = false
        while (!done && i < sql.length) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 2
            else { i += 1; done = true }
          } else i += 1
        }
        out += Tok('s', sql.substring(start, i), start, i)
      } else if (c == '"' || c == '`') {
        i += 1
        while (i < sql.length && sql.charAt(i) != c) i += 1
        if (i < sql.length) i += 1
        out += Tok('q', sql.substring(start, i), start, i)
      } else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') i += 1
        out += Tok('c', sql.substring(start, i), start, i)
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        val end = sql.indexOf("*/", i + 2)
        i = if (end < 0) sql.length else end + 2
        out += Tok('c', sql.substring(start, i), start, i)
      } else if (c.isDigit ||
        (c == '.' && i + 1 < sql.length && sql.charAt(i + 1).isDigit)) {
        while (i < sql.length && (isW(sql.charAt(i)) || sql.charAt(i) == '.'))
          i += 1
        out += Tok('n', sql.substring(start, i), start, i)
      } else if (isW(c)) {
        while (i < sql.length && isW(sql.charAt(i))) i += 1
        out += Tok('i', sql.substring(start, i), start, i)
      } else if (c == '-' && i + 2 < sql.length && sql.charAt(i + 1) == '>' &&
        sql.charAt(i + 2) == '>') {
        i += 3; out += Tok('o', "->>", start, i)
      } else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '>') {
        i += 2; out += Tok('o', "->", start, i)
      } else if (c == '(' || c == ')' || c == ',' || c == ';' || c == '.') {
        i += 1; out += Tok('p', c.toString, start, i)
      } else {
        i += 1; out += Tok('o', c.toString, start, i)
      }
    }
    out.result()
  }

  /** Map infix `doc -> path` / `doc ->> path` onto the internal
    * [[SqliteJson]] functions, repeatedly until none remain. Operands are
    * one "primary" each — a literal, an identifier chain (with optional
    * call parens), or a parenthesized expression — which reproduces
    * SQLite's precedence (`j -> 'a' = 5` compares the arrow's result).
    * A shape this scan cannot bound passes through untouched and fails
    * in the parser like before. */
  private[engine] def rewriteArrows(sql0: String): String = {
    if (!sql0.contains("->")) return sql0
    var sql = sql0
    var guard = 0
    while (guard < 256) {
      guard += 1
      val toks = lex(sql)
      val ai = toks.indexWhere(t => t.kind == 'o' &&
        (t.text == "->" || t.text == "->>"))
      if (ai < 0) return sql
      // ---- left operand: walk back one primary
      var lo = ai - 1
      if (lo < 0) return sql
      if (toks(lo).kind == 'p' && toks(lo).text == ")") {
        var depth = 1
        lo -= 1
        while (lo >= 0 && depth > 0) {
          if (toks(lo).kind == 'p' && toks(lo).text == ")") depth += 1
          else if (toks(lo).kind == 'p' && toks(lo).text == "(") depth -= 1
          if (depth > 0) lo -= 1
        }
        if (lo < 0) return sql
        if (lo - 1 >= 0 && toks(lo - 1).kind == 'i') lo -= 1 // call name
      } else if (toks(lo).kind != 's' && toks(lo).kind != 'n' &&
        toks(lo).kind != 'i' && toks(lo).kind != 'q') return sql
      // dotted qualifier chain before the primary (t.j -> 'a')
      while (lo - 2 >= 0 && toks(lo - 1).kind == 'p' &&
        toks(lo - 1).text == "." &&
        (toks(lo - 2).kind == 'i' || toks(lo - 2).kind == 'q')) lo -= 2
      // ---- right operand: one primary forward
      var ro = ai + 1
      if (ro >= toks.size) return sql
      if (toks(ro).kind == 'o' &&
        (toks(ro).text == "-" || toks(ro).text == "+") &&
        ro + 1 < toks.size && toks(ro + 1).kind == 'n') ro += 1
      toks(ro).kind match {
        case 's' | 'n' | 'q' => // literal
        case 'i' =>
          // identifier chain with optional call parens
          var k = ro
          var extended = true
          while (extended) {
            extended = false
            if (k + 1 < toks.size && toks(k + 1).kind == 'p' &&
              toks(k + 1).text == "(") {
              var depth = 1
              var m = k + 2
              while (m < toks.size && depth > 0) {
                if (toks(m).kind == 'p' && toks(m).text == "(") depth += 1
                else if (toks(m).kind == 'p' && toks(m).text == ")") depth -= 1
                m += 1
              }
              if (depth != 0) return sql
              k = m - 1
              extended = true
            } else if (k + 2 < toks.size && toks(k + 1).kind == 'p' &&
              toks(k + 1).text == "." && toks(k + 2).kind == 'i') {
              k += 2
              extended = true
            }
          }
          ro = k
        case 'p' if toks(ro).text == "(" =>
          var depth = 1
          var m = ro + 1
          while (m < toks.size && depth > 0) {
            if (toks(m).kind == 'p' && toks(m).text == "(") depth += 1
            else if (toks(m).kind == 'p' && toks(m).text == ")") depth -= 1
            m += 1
          }
          if (depth != 0) return sql
          ro = m - 1
        case _ => return sql
      }
      val fnName =
        if (toks(ai).text == "->") "__json_arrow" else "__json_arrow2"
      val lStart = toks(lo).start
      val rEnd = toks(ro).end
      sql = sql.substring(0, lStart) + fnName + "(" +
        sql.substring(lStart, toks(ai).start).trim + ", " +
        sql.substring(toks(ai).end, rEnd).trim + ")" +
        sql.substring(rEnd)
    }
    sql
  }

  private[engine] def preText(sql: String): String = {
    def isWord(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    val u = sql.toUpperCase
    val out = new StringBuilder(sql.length + 8)
    var inS = false; var inD = false; var inB = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'' && !inD && !inB) inS = !inS
      else if (c == '"' && !inS && !inB) inD = !inD
      else if (c == '`' && !inS && !inD) inB = !inB
      val quoted = inS || inD || inB
      def tok(kw: String): Boolean =
        !quoted && u.startsWith(kw, i) &&
          (i == 0 || !isWord(u.charAt(i - 1))) &&
          (i + kw.length >= u.length || !isWord(u.charAt(i + kw.length)))
      def wordAfter(k0: Int): (String, Int, Int) = {
        var k = k0
        while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
        var e = k
        while (e < sql.length && isWord(sql.charAt(e))) e += 1
        (u.substring(k, e), k, e)
      }
      // signed integer literal after position k0: (text, start, end) or null
      def intAfter(k0: Int): (String, Int, Int) = {
        var k = k0
        while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
        var e = k
        if (e < sql.length && (sql.charAt(e) == '-' || sql.charAt(e) == '+'))
          e += 1
        val ds = e
        while (e < sql.length && sql.charAt(e).isDigit) e += 1
        if (e == ds || (e < sql.length && isWord(sql.charAt(e)))) null
        else (sql.substring(k, e), k, e)
      }
      if ((inS || inD) && c == '\\') { out.append("\\\\"); i += 1 }
      else if (!quoted && c == '0' && i + 1 < sql.length &&
        (sql.charAt(i + 1) == 'x' || sql.charAt(i + 1) == 'X') &&
        (i == 0 || !isWord(sql.charAt(i - 1))) &&
        i + 2 < sql.length && isHexDigit(sql.charAt(i + 2))) {
        var j = i + 2
        while (j < sql.length && isHexDigit(sql.charAt(j))) j += 1
        val digits = sql.substring(i + 2, j)
        if (digits.length > 16)
          throw new SqliteEvalError(
            s"hex literal too big: 0x$digits")
        out.append(java.lang.Long.parseUnsignedLong(digits, 16).toString)
        i = j
      }
      else if (tok("IS")) {
        val (w1, _, e1) = wordAfter(i + 2)
        if (w1 == "NULL" || w1 == "DISTINCT") {
          out.append(sql.substring(i, i + 2)); i += 2
        } else if (w1 == "NOT") {
          val (w2, _, _) = wordAfter(e1)
          if (w2 == "NULL" || w2 == "DISTINCT") {
            out.append(sql.substring(i, i + 2)); i += 2
          } else { out.append("IS DISTINCT FROM"); i = e1 }
        } else { out.append("IS NOT DISTINCT FROM"); i += 2 }
      }
      else if (tok("LIMIT")) {
        val a = intAfter(i + 5)
        if (a == null) { out.append(c); i += 1 }
        else {
          // comma form? LIMIT a, b = LIMIT b OFFSET a (SQLite grammar)
          var k = a._3
          while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
          val b =
            if (k < sql.length && sql.charAt(k) == ',') intAfter(k + 1)
            else null
          def off(s: String) = if (s.trim.startsWith("-")) "0" else s.trim
          // Spark enforces limit + offset ≤ Int.MaxValue, so the
          // "unbounded" stand-in must leave room for the offset
          def bound(s: String, offTxt: String) =
            if (!s.trim.startsWith("-")) s.trim
            else (Int.MaxValue.toLong -
              offTxt.toLongOption.filter(_ > 0).getOrElse(0L)).toString
          if (b != null) {
            val o = off(a._1)
            out.append("LIMIT ").append(bound(b._1, o))
              .append(" OFFSET ").append(o)
            i = b._3
          } else {
            // a trailing OFFSET clause (only relevant when this LIMIT is
            // negative = unbounded): peek so the stand-in leaves room
            val oAfter =
              if (a._1.trim.startsWith("-")) {
                var k2 = a._3
                while (k2 < sql.length && sql.charAt(k2).isWhitespace) k2 += 1
                if (u.startsWith("OFFSET", k2)) intAfter(k2 + 6) else null
              } else null
            val oTxt = if (oAfter == null) "0" else off(oAfter._1)
            out.append("LIMIT ").append(bound(a._1, oTxt))
            i = a._3
          }
        }
      }
      else if (tok("OFFSET")) {
        val a = intAfter(i + 6)
        if (a == null || !a._1.trim.startsWith("-")) { out.append(c); i += 1 }
        else { out.append("OFFSET 0"); i = a._3 }
      }
      else if (tok("RLIKE"))
        throw new SqliteEvalError("near \"RLIKE\": syntax error")
      else if (tok("REGEXP"))
        throw new SqliteEvalError("no such function: REGEXP")
      else if (tok("GLOB")) {
        var j = i + 4
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (j < sql.length && sql.charAt(j) == '(') { out.append(c); i += 1 }
        else { out.append("RLIKE"); i += 5 }
      } else if (tok("AS")) {
        // CAST target type names Spark's parser lacks
        var j = i + 2
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        val start = j
        while (j < sql.length && isWord(sql.charAt(j))) j += 1
        var k = j
        while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
        val name = u.substring(start, j)
        if (k < sql.length && sql.charAt(k) == ')' &&
          (name == "TEXT" || name == "CLOB" || name == "BLOB")) {
          out.append(sql.substring(i, start))
          out.append(if (name == "BLOB") "BINARY" else "STRING")
          i = j
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  // ---------- plan rewrite ---------------------------------------------------

  def rewrite(plan: LogicalPlan, csLike: Boolean): LogicalPlan =
    plan.transformDownWithSubqueries {
      case f: Filter =>
        f.copy(condition = truthify(rewriteExpr(f.condition, csLike)))
      case h: UnresolvedHaving =>
        h.copy(havingCondition =
          truthify(rewriteExpr(h.havingCondition, csLike)))
      case j: Join if j.condition.isDefined =>
        j.copy(condition =
          j.condition.map(c => truthify(rewriteExpr(c, csLike))))
      // LIMIT/OFFSET expressions stay native: Catalyst requires an
      // IntegerType literal there (the i64 promotion would break it)
      case l: GlobalLimit => l
      case l: LocalLimit => l
      case o: Offset => o
      // inline VALUES rows must stay foldable for ResolveInlineTables:
      // rewrite, then strip the affinity markers (plain literals inside)
      case it: UnresolvedInlineTable =>
        it.transformExpressionsUp(rules(csLike))
          .transformExpressionsUp { case SqliteAffLit(lit, _) => lit }
      case other => other.transformExpressionsUp(rules(csLike))
    }

  private def rewriteExpr(e: Expression, csLike: Boolean): Expression =
    e.transformUp(rules(csLike))

  /** Nodes that are boolean by construction — no truth wrap, so native
    * equality predicates keep their planning shapes (equi-join keys,
    * pushdown). Everything else gets SQLite's numeric truth coercion
    * (identity on values that turn out boolean). */
  private def boolShaped(e: Expression): Boolean = e match {
    case _: And | _: Or | _: Not | _: EqualTo | _: EqualNullSafe |
        _: LessThan | _: LessThanOrEqual | _: GreaterThan |
        _: GreaterThanOrEqual | _: In | _: InSubquery | _: Exists |
        _: IsNull | _: IsNotNull | _: Like | _: RLike |
        _: SqliteCmpLit | _: SqliteLike | _: SqliteGlob | _: SqliteTruth =>
      true
    case l: Literal => l.dataType == BooleanType
    case _ => false
  }

  private def truthify(e: Expression): Expression =
    if (boolShaped(e)) e else fold(SqliteTruth(e))

  private def isLitLike(e: Expression): Boolean =
    e.isInstanceOf[Literal] || e.isInstanceOf[SqliteAffLit]

  private def litSide(l: Expression, r: Expression): Boolean =
    isLitLike(l) || isLitLike(r)

  private def rules(csLike: Boolean): PartialFunction[Expression, Expression] = {
    // i64 everywhere: SQLite integers are 64-bit (probed
    // abs(-2147483648) → 2147483648; the parser types that literal i32)
    case Literal(v, IntegerType) =>
      Literal(if (v == null) null else v.asInstanceOf[Int].toLong, LongType)
    case Literal(v, ShortType) =>
      Literal(if (v == null) null else v.asInstanceOf[Short].toLong, LongType)
    case Literal(v, ByteType) =>
      Literal(if (v == null) null else v.asInstanceOf[Byte].toLong, LongType)
    // SQLite has no decimal storage class: `1.0` is REAL (Spark's parser
    // types it DECIMAL(2,1))
    case Literal(v, _: DecimalType) =>
      if (v == null) Literal.create(null, DoubleType)
      else Literal(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)

    case a: Add => fold(SqliteArith(0, a.left, a.right))
    case a: Subtract => fold(SqliteArith(1, a.left, a.right))
    case a: Multiply => fold(SqliteArith(2, a.left, a.right))
    case a: Divide => fold(SqliteArith(3, a.left, a.right))
    case a: Remainder => fold(SqliteArith(4, a.left, a.right))
    case u: UnaryMinus => fold(SqliteNegate(u.child))
    case u: UnaryPositive => u.child // SQLite: +x is identity, no coercion

    case b: BitwiseAnd => fold(SqliteBit(0, b.left, b.right))
    case b: BitwiseOr => fold(SqliteBit(1, b.left, b.right))
    case b: BitwiseNot => fold(SqliteBitNot(b.child))
    case s: ShiftLeft => fold(SqliteShift(true, s.left, s.right))
    case s: ShiftRight => fold(SqliteShift(false, s.left, s.right))

    case l: Like =>
      // Spark's grammar defaults the escape to backslash; SQLite LIKE
      // has NO default escape (probed: 'a\b' LIKE 'a\b' → 1). A
      // user-written ESCAPE '\' is indistinguishable — documented.
      val esc = if (l.escapeChar == '\\') None else Some(l.escapeChar)
      fold(SqliteLike(l.left, l.right, esc, csLike))
    case r: RLike => // only reachable via the GLOB token mapping
      fold(SqliteGlob(r.left, r.right))

    case c: Cast => c.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        fold(SqliteCastInt(c.child))
      case DoubleType | FloatType => fold(SqliteCastReal(c.child))
      case _: DecimalType => fold(SqliteCastNumeric(c.child))
      case st: StringType if st == StringType => fold(SqliteCastText(c.child))
      case BinaryType => fold(SqliteCastBlob(c.child))
      case _ => c // BOOLEAN (engine CHECK shape), timestamps: native
    }
    // string-typed CAST targets Spark's parser lacks arrive via preText
    // (TEXT/CLOB → STRING, BLOB → BINARY), so nothing further here

    case e: EqualTo if litSide(e.left, e.right) =>
      fold(SqliteCmpLit(e.left, e.right, 0))
    case e: EqualNullSafe if litSide(e.left, e.right) =>
      // SQLite's IS compares without affinity coercion exactly like =
      // (probed 1 IS '1' → 0); NULL operands: both → 1, one → 0.
      // preText maps bare `IS [NOT]` onto the DISTINCT FROM spellings,
      // which parse to [Not(]EqualNullSafe[)].
      If(IsNull(e.left), IsNull(e.right),
        Coalesce(Seq(fold(SqliteCmpLit(e.left, e.right, 0)),
          Literal(false))))
    case e: LessThan if litSide(e.left, e.right) =>
      fold(SqliteCmpLit(e.left, e.right, 1))
    case e: LessThanOrEqual if litSide(e.left, e.right) =>
      fold(SqliteCmpLit(e.left, e.right, 2))
    case e: GreaterThan if litSide(e.left, e.right) =>
      fold(SqliteCmpLit(e.left, e.right, 3))
    case e: GreaterThanOrEqual if litSide(e.left, e.right) =>
      fold(SqliteCmpLit(e.left, e.right, 4))
    case in: In if in.list.nonEmpty && in.list.forall(isLitLike) =>
      // per-element SQLite comparison; the OR chain reproduces IN's
      // three-valued logic exactly (probed 1 IN ('1') → 0)
      in.list.map(e => fold(SqliteCmpLit(in.value, e, 0)))
        .reduceLeft[Expression]((a, b) => Or(a, b))

    // Catalyst requires IntegerType literals in window frame bounds and
    // the ntile/lag/lead/nth_value count-or-offset slot (ADVICE r14: the
    // blanket i64 promotion broke `ROWS BETWEEN 1 PRECEDING …` and
    // ntile(4) on the OLTP path). transformExpressionsUp is bottom-up, so
    // the literal was already promoted by the time this parent is
    // visited — demote it back; the slot is operator bookkeeping, never a
    // value the user observes.
    case f: SpecifiedWindowFrame =>
      f.copy(lower = demoteInt(f.lower), upper = demoteInt(f.upper))
    case uf: UnresolvedFunction
        if Set("ntile", "lag", "lead", "nth_value").contains(fnName(uf)) &&
          uf.arguments.size > (if (fnName(uf) == "ntile") 0 else 1) =>
      val k = if (fnName(uf) == "ntile") 0 else 1
      uf.copy(arguments = uf.arguments.updated(k, demoteInt(uf.arguments(k))))

    case n: Not => Not(truthify(n.child))
    case a: And => And(truthify(a.left), truthify(a.right))
    case o: Or => Or(truthify(o.left), truthify(o.right))
    case cw: CaseWhen =>
      cw.copy(branches = cw.branches.map { case (c, v) => (truthify(c), v) })

    case c: Concat =>
      // SQLite || renders numeric operands with its own real format
      // (1.0 || 'a' → '1.0a'); NULL propagation matches Spark's
      Concat(c.children.map(ch => fold(SqliteCastText(ch))))

    case uf: UnresolvedFunction
        if fnName(uf) == "group_concat" && !uf.isDistinct &&
          (uf.arguments.size == 1 || uf.arguments.size == 2) =>
      groupConcat(uf.arguments, distinct = false)
    case uf: UnresolvedFunction
        if fnName(uf) == "group_concat" && uf.isDistinct &&
          uf.arguments.size == 1 =>
      groupConcat(uf.arguments, distinct = true)

    case uf: UnresolvedFunction
        if fnName(uf) == "between" && uf.arguments.size == 3 =>
      // Spark's analyzer would desugar BETWEEN only AFTER this rewrite
      // (into With/CommonExpressionRef, which also trips collated
      // columns); desugar here so the bounds get SQLite comparison
      // semantics like any other comparison
      val x = uf.arguments.head
      val lo = uf.arguments(1); val hi = uf.arguments(2)
      val lower =
        if (litSide(x, lo)) fold(SqliteCmpLit(x, lo, 4))
        else GreaterThanOrEqual(x, lo)
      val upper =
        if (litSide(x, hi)) fold(SqliteCmpLit(x, hi, 2))
        else LessThanOrEqual(x, hi)
      And(lower, upper)

    case uf: UnresolvedFunction
        if fnName(uf) == "nullif" && uf.arguments.size == 2 &&
          litSide(uf.arguments.head, uf.arguments(1)) =>
      // SQLite NULLIF compares without ANSI coercion (nullif(1,'1') → 1)
      If(fold(SqliteCmpLit(uf.arguments.head, uf.arguments(1), 0)),
        Literal.create(null, NullType), uf.arguments.head)
  }

  private def fnName(uf: UnresolvedFunction): String =
    if (uf.nameParts.size == 1) uf.nameParts.head.toLowerCase else ""

  /** Undo the i64 literal promotion where Catalyst's contract requires an
    * IntegerType literal (window frame bounds, ntile/offset slots). */
  private def demoteInt(e: Expression): Expression = e match {
    case Literal(v: Long, LongType)
        if v >= Int.MinValue && v <= Int.MaxValue =>
      Literal(v.toInt)
    case other => other
  }

  /** group_concat(x[, sep]): non-NULL values in arrival order, rendered
    * SQLite-style, NULL on empty input (probed). DISTINCT keeps first
    * occurrences — deduplicated BEFORE rendering, on the operand's own
    * type, so a collated column dedups under its collation (probed:
    * group_concat(DISTINCT s) on a NOCASE column → 'Apple,BANANA', not
    * 'Apple,apple,BANANA' — VERDICT r14), with each survivor rendered
    * through [[SqliteCastText]] afterwards. */
  private def groupConcat(args: Seq[Expression],
                          distinct: Boolean): Expression = {
    val sep: Expression =
      if (args.size > 1) fold(SqliteCastText(args(1))) else Literal(",")
    val arr: Expression =
      if (distinct) {
        val x = UnresolvedNamedLambdaVariable(Seq("__gc_x"))
        ArrayTransform(
          ArrayDistinct(CollectList(args.head).toAggregateExpression()),
          LambdaFunction(SqliteCastText(x), Seq(x)))
      } else
        CollectList(fold(SqliteCastText(args.head))).toAggregateExpression()
    If(GreaterThan(Count(args.head).toAggregateExpression(), Literal(0L)),
      ArrayJoin(arr, sep, None), Literal.create(null, StringType))
  }

  // ---------- rewrite-time literal folding -----------------------------------

  /** Literal or folded-cast marker: the foldable shapes with their
    * remembered affinity. */
  private object LitLike {
    def unapply(e: Expression): Option[(Any, Int)] = e match {
      case Literal(v, _) => Some((v, SqliteValue.AffNone))
      case SqliteAffLit(Literal(v, _), aff) => Some((v, aff))
      case _ => None
    }
  }

  /** Evaluate an all-literal SQLite node NOW, with full dynamic typing —
    * this is how literal probes keep SQLite's exact value classes
    * ('12abc'+1 → integer 13) where the column-typed expression would
    * declare real. Folded CASTs keep their affinity in a [[SqliteAffLit]]
    * marker (probed: CAST(1 AS INTEGER) = '1' → 1). */
  private def fold(e: Expression): Expression = e match {
    case SqliteArith(op, LitLike(a, _), LitLike(b, _)) =>
      dynLit(SqliteValue.arith(op, a, b))
    case SqliteNegate(LitLike(a, _)) => dynLit(SqliteValue.negate(a))
    case SqliteCastInt(LitLike(a, _)) =>
      SqliteAffLit(dynLit(SqliteValue.castInt(a)), SqliteValue.AffNum)
    case SqliteCastReal(LitLike(a, _)) =>
      SqliteAffLit(dynLit(SqliteValue.castReal(a)), SqliteValue.AffNum)
    case SqliteCastNumeric(LitLike(a, _)) =>
      SqliteAffLit(dynLit(SqliteValue.castNumeric(a)), SqliteValue.AffNum)
    case SqliteCastText(LitLike(a, _)) =>
      SqliteAffLit(dynLit(SqliteValue.castText(a)), SqliteValue.AffText)
    case SqliteCastBlob(LitLike(a, _)) =>
      SqliteAffLit(dynLit(SqliteValue.castBlob(a)), SqliteValue.AffBlob)
    case SqliteLike(LitLike(a, _), LitLike(b, _), esc, cs) =>
      dynLit(SqliteValue.like(a, b, esc, cs))
    case SqliteGlob(LitLike(a, _), LitLike(b, _)) =>
      dynLit(SqliteValue.glob(a, b))
    case SqliteTruth(LitLike(a, _)) => dynLit(SqliteValue.truth(a))
    case SqliteBit(op, LitLike(a, _), LitLike(b, _)) =>
      val l = SqliteValue.toI64(a); val r = SqliteValue.toI64(b)
      dynLit(if (l == null || r == null) null
      else java.lang.Long.valueOf(
        if (op == 0) l.longValue & r.longValue else l.longValue | r.longValue))
    case SqliteBitNot(LitLike(a, _)) =>
      val v = SqliteValue.toI64(a)
      dynLit(if (v == null) null else java.lang.Long.valueOf(~v.longValue))
    case SqliteShift(dir, LitLike(a, _), LitLike(b, _)) =>
      dynLit(SqliteValue.shift(dir, a, b))
    case cmp @ SqliteCmpLit(LitLike(a, laff), LitLike(b, raff), op) =>
      if (a == null || b == null) Literal.create(null, BooleanType)
      else {
        val c = SqliteValue.cmp(a, b, laff, raff, "BINARY")
        dynLit(java.lang.Boolean.valueOf(op match {
          case 0 => c == 0
          case 1 => c < 0
          case 2 => c <= 0
          case 3 => c > 0
          case _ => c >= 0
        }))
      }
    case other => other
  }

  private[engine] def dynLit(v: Any): Literal = v match {
    case null => Literal.create(null, NullType)
    case l: java.lang.Long => Literal(l.longValue)
    case d: java.lang.Double => Literal(d.doubleValue)
    case s: UTF8String => Literal.create(s.toString, StringType)
    case b: Array[Byte] => Literal(b)
    case b: java.lang.Boolean => Literal(b.booleanValue)
    case other => Literal.create(SqliteValue.renderText(other), StringType)
  }
}
