package graft.engine

import graft.command.Parameter

/** Text-level SQL utilities for the engine envelope path: positional
  * parameter binding, top-level splitting, and the SQLite-ism shims
  * (double-quoted identifiers after keywords; verbatim expression column
  * names). The analytics path (SparkEntry) never goes through these —
  * Catalyst parses that SQL directly.
  */
object SqlText {

  /** Scan positions that are outside '...'/"..." quotes. */
  private def scan(sql: String)(f: (Char, Int, Boolean) => Unit): Unit = {
    var i = 0; var inS = false; var inD = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      f(c, i, inS || inD)
      i += 1
    }
  }

  /** Replace `?` placeholders positionally with rendered literals
    * (reference `db/src/db.rs:312-321` binds via rusqlite; we inline —
    * values join the statement text exactly as the journal requires). */
  def bind(sql: String, params: Seq[Parameter]): String = {
    if (params.isEmpty) return sql
    val out = new StringBuilder
    var n = 0
    scan(sql) { (c, _, quoted) =>
      if (c == '?' && !quoted && n < params.length) {
        out.append(render(params(n))); n += 1
      } else out.append(c)
    }
    out.toString
  }

  def render(p: Parameter): String = p match {
    case Parameter.Integer(v) => v.toString
    case Parameter.Real(v) => if (v.isWhole && math.abs(v) < 1e15) s"${v.toLong}.0" else v.toString
    // Spark's default parser treats backslash as an escape inside string
    // literals (unlike SQLite/rusqlite binding): double backslashes FIRST,
    // then quotes, or text containing \n / trailing \ is corrupted and a
    // trailing backslash swallows the closing quote (literal breakout in
    // the journaled replay text). `''` quote-doubling works in this mode;
    // escapedStringLiterals=true would break it ('don''t' stays two chars).
    case Parameter.Text(v) =>
      "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
  }

  /** Map SQLite collation names after an expression-level `COLLATE`
    * keyword (outside string literals) onto Spark's builtin collations:
    * NOCASE → UTF8_LCASE, BINARY → UTF8_BINARY, RTRIM →
    * UTF8_BINARY_RTRIM. Returns Left with SQLite's exact error text for
    * an unknown name. A statement without COLLATE passes through
    * untouched (zero-cost fast path: one indexOf). */
  def mapCollations(sql: String): Either[String, String] = {
    if (!sql.toUpperCase.contains("COLLATE")) return Right(sql)
    def isWord(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    val u = sql.toUpperCase
    val out = new StringBuilder
    var skipUntil = 0
    var err: Option[String] = None
    // own scanner: backtick-quoted ALIAS text (aliasSelectList's verbatim
    // expression names) must keep the SQLite spelling, so backticks count
    // as quotes here alongside '…' and "…"
    var inS = false; var inD = false; var inB = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'' && !inD && !inB) inS = !inS
      else if (c == '"' && !inS && !inB) inD = !inD
      else if (c == '`' && !inS && !inD) inB = !inB
      val quoted = inS || inD || inB
      if (i >= skipUntil && err.isEmpty) {
        if (!quoted && u.startsWith("COLLATE", i) &&
          (i == 0 || !isWord(u.charAt(i - 1))) &&
          (i + 7 >= u.length || !isWord(u.charAt(i + 7)))) {
          // parse the identifier after the keyword
          var j = i + 7
          while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
          val q = j < sql.length && (sql.charAt(j) == '"' || sql.charAt(j) == '`')
          val qc = if (q) sql.charAt(j) else ' '
          if (q) j += 1
          val start = j
          while (j < sql.length && isWord(sql.charAt(j))) j += 1
          val name = sql.substring(start, j)
          if (q && j < sql.length && sql.charAt(j) == qc) j += 1
          name.toUpperCase match {
            case "NOCASE" => out.append("COLLATE UTF8_LCASE"); skipUntil = j
            case "BINARY" => out.append("COLLATE UTF8_BINARY"); skipUntil = j
            case "RTRIM" =>
              out.append("COLLATE UTF8_BINARY_RTRIM"); skipUntil = j
            case _ => err = Some(s"no such collation sequence: $name")
          }
        } else out.append(c)
      }
      i += 1
    }
    err.toLeft(out.toString)
  }

  /** Split on top-level commas (not inside parens or quotes). */
  def splitTopLevel(s: String, sep: Char = ','): Seq[String] = {
    val parts = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    scan(s) { (c, _, quoted) =>
      if (!quoted) {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
      }
      if (c == sep && depth == 0 && !quoted) { parts += cur.toString; cur.clear() }
      else cur.append(c)
    }
    parts += cur.toString
    parts.result()
  }

  /** Find a top-level standalone keyword (e.g. WHERE) outside quotes/parens;
    * returns its index or -1. Word boundaries follow SQL identifier rules:
    * `_` is a word character, so `last_update` never matches UPDATE and
    * `returning_flag` never matches RETURNING. */
  def findKeyword(s: String, kw: String): Int = {
    val u = s.toUpperCase
    def isWord(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    var depth = 0; var found = -1
    scan(s) { (c, i, quoted) =>
      if (!quoted) {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (found < 0 && depth == 0 && u.startsWith(kw, i) &&
          (i == 0 || !isWord(u.charAt(i - 1))) &&
          (i + kw.length >= u.length || !isWord(u.charAt(i + kw.length))))
          found = i
      }
    }
    found
  }

  private val identRe = "^[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)?$".r
  private val starRe = "^(\\*|[A-Za-z_][A-Za-z0-9_]*\\.\\*)$".r

  /** SQLite reports an expression column under its verbatim source text
    * (golden `db/src/db.rs:499-504`: `SELECT id || "_bar"` → column name
    * `id || "_bar"`). Alias every non-trivial un-aliased SELECT item with
    * its raw text so the envelope matches. */
  def aliasSelectList(sql: String): String = {
    val selIdx = findKeyword(sql, "SELECT")
    if (selIdx != 0 && sql.take(selIdx).trim.nonEmpty) return sql
    if (selIdx < 0) return sql
    val fromIdx = findKeyword(sql, "FROM")
    val (list, rest) =
      if (fromIdx >= 0) (sql.substring(selIdx + 6, fromIdx), sql.substring(fromIdx))
      else (sql.substring(selIdx + 6), "")
    val items = splitTopLevel(list).map { raw =>
      val t = raw.trim
      val isPlain = identRe.matches(t) || starRe.matches(t)
      val hasAlias = findKeyword(t, "AS") >= 0
      if (isPlain || hasAlias || t.isEmpty) raw
      else s" $t AS `${t.replace("`", "``")}`"
    }
    sql.take(selIdx) + "SELECT" + items.mkString(",") + " " + rest
  }

  /** Rewrite double-quoted identifiers right after structural keywords
    * (INTO/FROM/JOIN/UPDATE/TABLE) to backticks — SQLite allows `INSERT
    * INTO "names"` (golden `db/src/db.rs:475`), while Spark reads "..."
    * as a string literal. Other double-quoted tokens stay literals, which
    * matches SQLite's fallback behavior for non-identifier positions. */
  def fixQuotedIdents(sql: String): String =
    sql.replaceAll(
      """(?i)\b(INTO|FROM|JOIN|UPDATE|TABLE)\s+"([A-Za-z_][A-Za-z0-9_]*)"""",
      "$1 `$2`")
}
