package graft.engine

import graft.SparkSpec
import graft.command.Value

/** Round-15 SQLite-parity goldens, every row probed live on the 3.40.1
  * oracle (this machine's sqlite3) before being pinned here:
  *
  *  - the select-list aliaser handles DISTINCT/ALL and no-FROM tails
  *    (VERDICT r14 "What's wrong": `SELECT DISTINCT v FROM t ORDER BY v`
  *    errored; `SELECT 1 LIMIT 1` died in the parser);
  *  - `group_concat(DISTINCT s)` dedups under the column's collation;
  *  - connection-state functions on the SELECT surface;
  *  - `IS` / `IS NOT` between scalars, hex integer literals, negative
  *    LIMIT/OFFSET and the `LIMIT a, b` comma form;
  *  - the SQLITE_ENABLE_MATH_FUNCTIONS family;
  *  - the closed function registry (`no such function: concat`);
  *  - parse-error text parity (`near "X": syntax error`,
  *    `incomplete input`);
  *  - window frames / ntile / lag offsets survive the i64 literal
  *    promotion (ADVICE r14);
  *  - `SELECT rowid, a*b` keeps the multiplication (ADVICE r14).
  */
class R15ParitySpec extends SparkSpec {

  private lazy val db = {
    val d = GraftDb.openInMemory(spark, 500)
    def ex(sql: String): Unit = {
      val r = d.executeStringStmt(sql).fold(e => fail(s"[$sql] $e"), identity)
      r.foreach(x => assert(x.error.isEmpty, s"[$sql] ${x.error}"))
    }
    ex("CREATE TABLE t (id INTEGER PRIMARY KEY, v INTEGER, s TEXT)")
    ex("INSERT INTO t(v,s) VALUES (3,'b'),(1,'a'),(3,'B'),(2,'a'),(1,'c')")
    ex("CREATE TABLE c2 (s TEXT COLLATE NOCASE)")
    ex("INSERT INTO c2 VALUES ('Apple'),('apple'),('BANANA')," +
      "('banana'),('Apple')")
    d
  }

  private def unwrap(v: Value): Any = v match {
    case Value.Integer(x) => x
    case Value.Text(x) => x
    case Value.Real(x) => x
    case Value.Null => null
    case other => other
  }

  private def rows(sql: String): Seq[Seq[Any]] =
    db.queryStringStmt(sql).fold(e => fail(s"[$sql] $e"), identity)
      .head.values.map(_.map(unwrap))

  private def cols(sql: String): Seq[String] =
    db.queryStringStmt(sql).fold(e => fail(s"[$sql] $e"), identity)
      .head.columns

  private def one(sql: String): Any = rows(sql).head.head

  private def err(sql: String): String =
    db.queryStringStmt(sql).fold(identity,
      r => fail(s"[$sql] expected an error, got $r"))

  test("DISTINCT select lists: ORDER BY tail and SQLite column naming") {
    assert(rows("SELECT DISTINCT v FROM t ORDER BY v") ==
      Seq(Seq(1L), Seq(2L), Seq(3L)))
    assert(rows("SELECT DISTINCT v FROM t ORDER BY v DESC") ==
      Seq(Seq(3L), Seq(2L), Seq(1L)))
    assert(cols("SELECT DISTINCT v FROM t ORDER BY v") == Seq("v"))
    // expression item still gets the verbatim name, minus the quantifier
    assert(cols("SELECT DISTINCT v+1 FROM t ORDER BY 1") == Seq("v+1"))
    assert(rows("SELECT DISTINCT v+1 FROM t ORDER BY 1") ==
      Seq(Seq(2L), Seq(3L), Seq(4L)))
    // NOCASE column: DISTINCT dedups case-insensitively, first occurrences
    assert(rows("SELECT DISTINCT s FROM c2").map(_.head).toSet ==
      Set("Apple", "BANANA"))
    assert(cols("SELECT DISTINCT s FROM c2") == Seq("s"))
  }

  test("no-FROM SELECTs with tail clauses (probed shapes)") {
    assert(one("SELECT 1 ORDER BY 1") == 1L)
    assert(one("SELECT 1 LIMIT 1") == 1L)
    assert(cols("SELECT 1 LIMIT 1") == Seq("1"))
    assert(one("SELECT 2+2 WHERE 1") == 4L)
    assert(cols("SELECT 2+2 WHERE 1") == Seq("2+2"))
    // 'abc' is falsy under SQLite truth coercion → zero rows
    assert(rows("SELECT 2+2 WHERE 'abc'").isEmpty)
  }

  test("group_concat(DISTINCT): collation-aware dedup (probed goldens)") {
    assert(one("SELECT group_concat(DISTINCT s) FROM c2") == "Apple,BANANA")
    // BINARY column: dedup is exact, first-occurrence order
    assert(one("SELECT group_concat(DISTINCT s) FROM t") == "b,a,B,c")
    assert(one("SELECT group_concat(s) FROM t") == "b,a,B,a,c")
  }

  test("connection-state functions on the SELECT surface") {
    val d = GraftDb.openInMemory(spark, 500)
    d.executeStringStmt("CREATE TABLE k (id INTEGER PRIMARY KEY, x INTEGER)")
    def sel(): Seq[Any] =
      d.queryStringStmt(
        "SELECT last_insert_rowid(), changes(), total_changes()")
        .fold(e => fail(e), identity).head.values.head.map(unwrap)
    assert(sel() == Seq(0L, 0L, 0L)) // fresh connection (probed)
    d.executeStringStmt("INSERT INTO k(x) VALUES (10),(20),(30)")
    assert(sel() == Seq(3L, 3L, 3L))
    d.executeStringStmt("UPDATE k SET x = x WHERE x >= 20")
    assert(sel() == Seq(3L, 2L, 5L))
    d.executeStringStmt("DELETE FROM k WHERE x = 10")
    assert(sel() == Seq(3L, 1L, 6L))
    // DDL leaves the registers untouched (SQLite semantics)
    d.executeStringStmt("CREATE TABLE k2 (a INTEGER)")
    assert(sel() == Seq(3L, 1L, 6L))
    d.close()
  }

  test("IS / IS NOT between scalars (null-safe, no affinity coercion)") {
    assert(rows("SELECT 1 IS 1, 1 IS NOT 1, NULL IS NULL, 1 IS NULL, " +
      "NULL IS NOT 2, 1 IS NOT '1'").head ==
      Seq(1L, 0L, 1L, 0L, 1L, 1L))
    assert(rows("SELECT v IS 3 FROM t ORDER BY id").map(_.head) ==
      Seq(1L, 0L, 1L, 0L, 0L))
    // IS [NOT] NULL keeps its classic spelling and behavior
    assert(one("SELECT s IS NOT NULL FROM t LIMIT 1") == 1L)
  }

  test("hex integer literals (two's-complement i64, probed)") {
    assert(rows("SELECT 0x1A, 0xff, -0x2").head == Seq(26L, 255L, -2L))
    assert(one("SELECT 0xFFFFFFFFFFFFFFFF") == -1L)
    assert(err("SELECT 0x10000000000000000") ==
      "hex literal too big: 0x10000000000000000")
  }

  test("negative LIMIT/OFFSET and the LIMIT a, b comma form (probed)") {
    assert(rows("SELECT v FROM t ORDER BY id LIMIT -1").map(_.head) ==
      Seq(3L, 1L, 3L, 2L, 1L))
    assert(rows("SELECT v FROM t ORDER BY id LIMIT 2 OFFSET -3")
      .map(_.head) == Seq(3L, 1L))
    assert(rows("SELECT v FROM t ORDER BY id LIMIT 1,2").map(_.head) ==
      Seq(1L, 3L))
    assert(rows("SELECT v FROM t ORDER BY id LIMIT -1 OFFSET 2")
      .map(_.head) == Seq(3L, 2L, 1L))
  }

  test("math function family (probed battery)") {
    val goldens: Seq[(String, Any)] = Seq(
      "ceil(3.3)" -> 4.0, "ceil(3)" -> 3L, "ceil(3.0)" -> 3.0,
      "ceil(' 3.2')" -> 4.0, "ceil('3.2abc')" -> null,
      "ceil('abc')" -> null, "ceil(NULL)" -> null,
      "floor(3.7)" -> 3.0, "floor(-3)" -> -3L,
      "trunc(3.7)" -> 3.0, "trunc(-3.7)" -> -3.0, "trunc(5)" -> 5L,
      "trunc('5')" -> 5L,
      "ln(1)" -> 0.0, "ln(0)" -> null,
      "log(100)" -> 2.0, "log(-1)" -> null, "log(2,8)" -> 3.0,
      "log(1,8)" -> null, "log(0,8)" -> null, "log(-2,8)" -> null,
      "log(2,-8)" -> null, "log(2,0)" -> null,
      "log2(8)" -> 3.0, "log10(100)" -> 2.0,
      "exp(0)" -> 1.0, "sqrt(-1)" -> null, "sqrt(0)" -> 0.0,
      "pow(2,3)" -> 8.0, "pow(-1,0.5)" -> null, "power(2,10)" -> 1024.0,
      "mod(7,3)" -> 1.0, "mod(-7,3)" -> -1.0, "mod(7,0)" -> null,
      "mod(7.5,2)" -> 1.5, "mod('8','3')" -> 2.0,
      "pi()" -> math.Pi,
      "atan2(0,0)" -> 0.0,
      "acos(1)" -> 0.0, "acos(2)" -> null, "acosh(0.5)" -> null,
      "cosh(0)" -> 1.0, "asinh(0)" -> 0.0,
      "degrees('x')" -> null, "radians(180)" -> math.Pi,
      "ceiling(3.3)" -> 4.0)
    goldens.foreach { case (e, want) =>
      val got = one(s"SELECT $e")
      assert(got == want, s"$e => $got (want $want)")
    }
    // infinities pass through where SQLite's do (exp(1000) → Inf)
    assert(one("SELECT exp(1000)") == Double.PositiveInfinity)
  }

  test("closed function registry: SQLite's no-such-function text") {
    assert(err("SELECT concat('a','b')") == "no such function: concat")
    assert(err("SELECT unhex('41')") == "no such function: unhex")
    assert(err("SELECT octet_length('ab')") ==
      "no such function: octet_length")
    assert(err("SELECT string_agg(s, ',') FROM t") ==
      "no such function: string_agg")
    // known names still resolve
    assert(one("SELECT format('%d-%s', 7, 'x')") == "7-x")
    assert(one("SELECT likelihood(7, 0.5)") == 7L)
    assert(one("SELECT likely(3)") == 3L)
    assert(one("SELECT unlikely('x')") == "x")
    assert(one("SELECT sqlite_version()") == "3.40.1")
  }

  test("random()/randomblob() answer SQLite's domains on the query path") {
    assert(one("SELECT typeof(random())") == "integer")
    assert(one("SELECT length(randomblob(5))") == 5L)
    assert(one("SELECT length(randomblob(0))") == 1L)
    assert(one("SELECT length(randomblob(-2))") == 1L)
    // the write path still rejects them (statement-log determinism)
    val r = db.executeStringStmt("INSERT INTO t(v) VALUES (random())")
    assert(r.isLeft && r.left.exists(_.contains("non-deterministic")), r)
  }

  test("parse-error text parity (probed shapes)") {
    assert(err("SELECT 1 FRM t").startsWith("near "))
    assert(err("SELECT 1 FRM t").endsWith(": syntax error"))
    assert(err("SELECT (1") == "incomplete input")
    assert(err("SELECT 1 +") == "incomplete input")
    // no Spark banner may leak
    Seq("SELECT 1 FRM t", "SELECT (1").foreach { q =>
      val e = err(q)
      assert(!e.contains("SQLSTATE") && !e.contains("PARSE_SYNTAX"), e)
    }
  }

  test("UDF-wrapped engine errors surface clean (date('now') rejection)") {
    val e = err("SELECT date('now') FROM t")
    assert(e.contains("non-deterministic time value 'now'"), e)
    assert(!e.contains("FAILED_EXECUTE_UDF") && !e.contains("Lambda"), e)
  }

  test("window frames / ntile / lag offsets on the OLTP path (ADVICE r14)") {
    assert(rows("SELECT ntile(2) OVER (ORDER BY id), " +
      "lag(v,2) OVER (ORDER BY id), " +
      "sum(v) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) " +
      "FROM t") ==
      Seq(Seq(1L, null, 3L), Seq(1L, null, 4L), Seq(1L, 3L, 4L),
        Seq(2L, 1L, 5L), Seq(2L, 3L, 3L)))
    assert(one("SELECT nth_value(v,2) OVER (ORDER BY id ROWS BETWEEN " +
      "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM t LIMIT 1") == 1L)
  }

  test("SELECT rowid, a*b keeps the multiplication (ADVICE r14)") {
    // IPK table: rowid is the alias column — column name `id` (probed)
    assert(rows("SELECT rowid, v*id FROM t LIMIT 2") ==
      Seq(Seq(1L, 3L), Seq(2L, 2L)))
    assert(cols("SELECT rowid, v*id FROM t LIMIT 2") == Seq("id", "v*id"))
    // plain rowid table: the rid-view path with a real `*` operator
    val d = GraftDb.openInMemory(spark, 500)
    d.executeStringStmt("CREATE TABLE p (a INTEGER, b INTEGER)")
    d.executeStringStmt("INSERT INTO p VALUES (2,3),(4,5)")
    val r = d.queryStringStmt("SELECT rowid, a*b FROM p ORDER BY rowid")
      .fold(e => fail(e), identity).head
    assert(r.columns == Seq("rowid", "a*b"))
    assert(r.values.map(_.map(unwrap)) == Seq(Seq(1L, 6L), Seq(2L, 20L)))
    // star expansion still works on the rid view
    val r2 = d.queryStringStmt("SELECT rowid, * FROM p ORDER BY rowid")
      .fold(e => fail(e), identity).head
    assert(r2.columns == Seq("rowid", "a", "b"))
    d.close()
  }

  test("NOCASE comparison folds ASCII only (ADVICE r14)") {
    // 'Ä' vs 'ä': unequal under SQLite's NOCASE (ASCII fold only)
    assert(one("SELECT 'Ä' = 'ä' COLLATE NOCASE") == 0L)
    assert(one("SELECT 'AbC' = 'aBc' COLLATE NOCASE") == 1L)
  }
}
