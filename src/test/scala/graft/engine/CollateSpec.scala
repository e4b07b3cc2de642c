package graft.engine

import graft.SparkSpec
import graft.command.Value

/** COLLATE NOCASE / RTRIM / BINARY end-to-end (VERDICT r12 #1), probed
  * live on SQLite 3.40.1:
  *  - column collation drives UNIQUE/PK enforcement ('Abc' vs 'abc'
  *    collide under NOCASE; 'ab' vs 'ab  ' under RTRIM), WHERE/IN
  *    comparison, ORDER BY, and the conflict policies (REPLACE displaces
  *    the case-differing row; DO UPDATE keeps the existing spelling;
  *    OR IGNORE skips);
  *  - CREATE [UNIQUE] INDEX accepts per-column COLLATE, defaulting to the
  *    column's own collation, and pre-scans existing rows under it;
  *  - expression-level `expr COLLATE c` works in SELECT/WHERE/ORDER BY
  *    (mapped to Spark's UTF8_LCASE / UTF8_BINARY_RTRIM collations);
  *  - unknown collation names error with SQLite's exact text, at CREATE
  *    TABLE, CREATE INDEX and expression level.
  * Runs at cap 500 (Mem store) and cap 2 (tables spill to Big), so both
  * the sequential and the distributed constraint paths are pinned. */
class CollateSpec extends SparkSpec {

  private def caps = Seq(500L, 2L)

  private def ok(db: GraftDb, sql: String): Long = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
    r.rowsAffected
  }

  private def err(db: GraftDb, sql: String): String = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.nonEmpty, s"expected an error for [$sql]")
    r.error
  }

  private def q(db: GraftDb, sql: String): Seq[Seq[Any]] =
    db.queryStringStmt(sql).fold(e => fail(s"[$sql] $e"), identity).head
      .values.map(_.map {
        case Value.Integer(v) => v; case Value.Text(v) => v
        case Value.Real(v) => v; case Value.Null => null; case v => v
      })

  private def qErr(db: GraftDb, sql: String): String =
    db.queryStringStmt(sql).fold(identity,
      r => fail(s"expected error for [$sql], got $r"))

  private def seeded(cap: Long): GraftDb = {
    val db = GraftDb.openInMemory(spark, cap)
    ok(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, " +
      "name TEXT COLLATE NOCASE UNIQUE, v INTEGER)")
    ok(db, "INSERT INTO t VALUES (1,'Abc',10), (2,'deF',20), (3,'GHI',30)")
    db
  }

  test("NOCASE column UNIQUE collides across case (both caps)") {
    caps.foreach { cap =>
      val db = seeded(cap)
      assert(err(db, "INSERT INTO t(name, v) VALUES ('abc', 1)") ==
        "UNIQUE constraint failed: t.name", s"cap=$cap")
      ok(db, "INSERT INTO t(name, v) VALUES ('ABD', 2)")
      assert(q(db, "SELECT COUNT(*) FROM t") == Seq(Seq(4L)), s"cap=$cap")
    }
  }

  test("NOCASE drives WHERE / IN / range comparison / ORDER BY") {
    caps.foreach { cap =>
      val db = seeded(cap)
      assert(q(db, "SELECT id FROM t WHERE name = 'def'") == Seq(Seq(2L)))
      assert(q(db, "SELECT id FROM t WHERE name IN ('DEF','ghi') " +
        "ORDER BY id") == Seq(Seq(2L), Seq(3L)), s"cap=$cap")
      // probed: NOCASE range compare folds case ('deZ' > 'deF', < 'GHI')
      assert(q(db, "SELECT id FROM t WHERE name < 'deZ' ORDER BY id") ==
        Seq(Seq(1L), Seq(2L)), s"cap=$cap")
      assert(q(db, "SELECT name FROM t ORDER BY name, id") ==
        Seq(Seq("Abc"), Seq("deF"), Seq("GHI")), s"cap=$cap")
    }
  }

  test("UPDATE under NOCASE: cross-row collides, same-row case-change ok") {
    caps.foreach { cap =>
      val db = seeded(cap)
      assert(err(db, "UPDATE t SET name = 'ABC' WHERE id = 2") ==
        "UNIQUE constraint failed: t.name", s"cap=$cap")
      assert(ok(db, "UPDATE t SET name = 'ABC' WHERE id = 1") == 1L)
      assert(ok(db, "UPDATE OR IGNORE t SET name = 'abc' WHERE id = 3") == 0L,
        s"cap=$cap: OR IGNORE must skip the colliding row")
      assert(q(db, "SELECT id, name FROM t ORDER BY id") ==
        Seq(Seq(1L, "ABC"), Seq(2L, "deF"), Seq(3L, "GHI")), s"cap=$cap")
    }
  }

  test("conflict policies fold case: REPLACE displaces, upsert updates, " +
    "IGNORE skips") {
    caps.foreach { cap =>
      val db = seeded(cap)
      // probed: displaced row 1 vanishes, candidate lands as rowid 4
      ok(db, "INSERT OR REPLACE INTO t(name, v) VALUES ('ABC', 99)")
      assert(q(db, "SELECT id, name, v FROM t ORDER BY id") ==
        Seq(Seq(2L, "deF", 20L), Seq(3L, "GHI", 30L), Seq(4L, "ABC", 99L)),
        s"cap=$cap")
      // probed: DO UPDATE keeps the EXISTING spelling, adds excluded.v
      ok(db, "INSERT INTO t(name, v) VALUES ('GHi', 7) " +
        "ON CONFLICT(name) DO UPDATE SET v = v + excluded.v")
      assert(q(db, "SELECT id, name, v FROM t WHERE id = 3") ==
        Seq(Seq(3L, "GHI", 37L)), s"cap=$cap")
      ok(db, "INSERT OR IGNORE INTO t(name, v) VALUES ('def', 0), ('new', 1)")
      assert(q(db, "SELECT id, name, v FROM t ORDER BY id") ==
        Seq(Seq(2L, "deF", 20L), Seq(3L, "GHI", 37L), Seq(4L, "ABC", 99L),
          Seq(5L, "new", 1L)), s"cap=$cap")
    }
  }

  test("NOCASE TEXT PRIMARY KEY folds case") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      ok(db, "CREATE TABLE p (k TEXT COLLATE NOCASE PRIMARY KEY)")
      ok(db, "INSERT INTO p VALUES ('X')")
      if (cap < 500) ok(db, "INSERT INTO p VALUES ('y'), ('z')")
      assert(err(db, "INSERT INTO p VALUES ('x')") ==
        "UNIQUE constraint failed: p.k", s"cap=$cap")
    }
  }

  test("RTRIM ignores trailing spaces in UNIQUE / WHERE / ORDER BY") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      ok(db, "CREATE TABLE r (s TEXT COLLATE RTRIM UNIQUE, v INTEGER)")
      ok(db, "INSERT INTO r VALUES ('ab', 1)")
      assert(err(db, "INSERT INTO r VALUES ('ab  ', 2)") ==
        "UNIQUE constraint failed: r.s", s"cap=$cap")
      ok(db, "INSERT INTO r VALUES (' ab', 3)") // leading spaces differ
      // probed: 'ab' = 'ab ' under RTRIM; ORDER BY sorts ' ab' first
      assert(q(db, "SELECT v FROM r WHERE s = 'ab ' ORDER BY v") ==
        Seq(Seq(1L)), s"cap=$cap")
      assert(q(db, "SELECT v FROM r ORDER BY s, v") ==
        Seq(Seq(3L), Seq(1L)), s"cap=$cap")
    }
  }

  test("CREATE UNIQUE INDEX with COLLATE NOCASE enforces and pre-scans") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      ok(db, "CREATE TABLE i1 (a TEXT)")
      ok(db, "INSERT INTO i1 VALUES ('q'), ('r'), ('s')")
      ok(db, "CREATE UNIQUE INDEX ix ON i1(a COLLATE NOCASE)")
      assert(err(db, "INSERT INTO i1 VALUES ('Q')") ==
        "UNIQUE constraint failed: i1.a", s"cap=$cap")
      ok(db, "DROP INDEX ix")
      ok(db, "INSERT INTO i1 VALUES ('Q')")
      // pre-scan: the case-dup now present must block re-creation
      assert(err(db, "CREATE UNIQUE INDEX ix ON i1(a COLLATE NOCASE)") ==
        "UNIQUE constraint failed: i1.a", s"cap=$cap")
      // a BINARY-collated unique index on the same data is fine
      ok(db, "CREATE UNIQUE INDEX ix2 ON i1(a)")
    }
  }

  test("a unique index inherits the COLUMN's collation by default") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE c2 (a TEXT COLLATE NOCASE)")
    ok(db, "INSERT INTO c2 VALUES ('m')")
    ok(db, "CREATE UNIQUE INDEX cx ON c2(a)")
    assert(err(db, "INSERT INTO c2 VALUES ('M')") ==
      "UNIQUE constraint failed: c2.a")
  }

  test("expression-level COLLATE in SELECT / ORDER BY") {
    val db = seeded(500L)
    // probed: postfix COLLATE binds to the operand, infects the compare;
    // the envelope column name keeps the verbatim SQLite spelling
    val r = db.queryStringStmt("SELECT 'A' = 'a' COLLATE NOCASE")
      .fold(e => fail(e), identity).head
    assert(r.values == Seq(Seq(Value.Integer(1L))))
    assert(r.columns == Seq("'A' = 'a' COLLATE NOCASE"), r.columns)
    assert(q(db, "SELECT 'A' COLLATE NOCASE = 'a'") == Seq(Seq(1L)))
    assert(q(db, "SELECT 'ab' = 'ab   ' COLLATE RTRIM") == Seq(Seq(1L)))
    // probed: BINARY overrides the column's NOCASE in ORDER BY
    assert(q(db, "SELECT name FROM t WHERE id >= 2 " +
      "ORDER BY name COLLATE BINARY") == Seq(Seq("GHI"), Seq("deF")))
    // and NOCASE can be forced onto a BINARY column expression-wise
    assert(q(db, "SELECT count(*) FROM t WHERE 'ABC' = 'abc' COLLATE NOCASE")
      == Seq(Seq(3L)))
  }

  test("unknown collation names error with SQLite's text") {
    val db = GraftDb.openInMemory(spark, 500)
    assert(err(db, "CREATE TABLE bad (z TEXT COLLATE NOSUCH)") ==
      "no such collation sequence: NOSUCH")
    ok(db, "CREATE TABLE g (z TEXT)")
    assert(err(db, "CREATE INDEX gx ON g(z COLLATE NOSUCH)") ==
      "no such collation sequence: NOSUCH")
    assert(qErr(db, "SELECT 'a' = 'b' COLLATE NOSUCH") ==
      "no such collation sequence: NOSUCH")
  }

  test("collation survives persistence and journal recovery") {
    val dir = java.nio.file.Files.createTempDirectory("graft-coll-")
    def open(): GraftDb = GraftDb.open(spark, dir.resolve("db").toString, 500)
      .fold(e => fail(e), identity)
    val db = open()
    ok(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, " +
      "name TEXT COLLATE NOCASE UNIQUE)")
    ok(db, "INSERT INTO t VALUES (1, 'Abc')")
    db.close()
    val db2 = open()
    assert(err(db2, "INSERT INTO t(name) VALUES ('ABC')") ==
      "UNIQUE constraint failed: t.name",
      "the reopened table must keep its NOCASE unique semantics")
    assert(q(db2, "SELECT id FROM t WHERE name = 'abc'") == Seq(Seq(1L)))
    db2.close()
  }
}
