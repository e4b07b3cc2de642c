package graft.engine

import graft.SparkSpec
import graft.command.Value

/** Composite table-level constraints — `PRIMARY KEY (a, b)` and
  * `UNIQUE (a, b)` (previously the parser silently degraded them to
  * first-column / per-column constraints). Probed live on SQLite 3.40:
  *  - a composite PRIMARY KEY on a rowid table is a tuple-level unique
  *    spec in CLAUSE order (the order governs the error text and
  *    table_info pk ordinals), is NOT a rowid alias, and — the historic
  *    rowid-table quirk — allows NULLs;
  *  - tuple keys containing a NULL never conflict;
  *  - ALTER RENAME COLUMN follows into the constraint; dropping a member
  *    column fails with SQLite's texts;
  *  - shape errors: unknown clause column, more than one primary key.
  * Runs at cap 500 (Mem) and cap 4 (spilled Big). */
class CompositeKeySpec extends SparkSpec {

  private def exec(db: GraftDb, sql: String): Long = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
    r.rowsAffected
  }

  private def execErr(db: GraftDb, sql: String): String = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.nonEmpty, s"expected error for [$sql]")
    r.error
  }

  private def q(db: GraftDb, sql: String): Seq[Seq[Any]] =
    db.queryStringStmt(sql).fold(e => fail(s"[$sql] $e"), identity).head
      .values.map(_.map {
        case Value.Integer(v) => v; case Value.Text(v) => v
        case Value.Null => null; case v => v
      })

  private def caps = Seq(500L, 4L)

  test("composite PRIMARY KEY: tuple uniqueness, clause order, NULLs allowed") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "CREATE TABLE t (x INTEGER, y INTEGER, v TEXT, PRIMARY KEY (y, x))")
      exec(db, "INSERT INTO t VALUES (1, 1, 'a'), (1, 2, 'b'), (2, 1, 'c'), " +
        "(2, 2, 'd'), (3, 3, 'e')")
      assert(execErr(db, "INSERT INTO t VALUES (1, 2, 'dup')") ==
        "UNIQUE constraint failed: t.y, t.x", s"cap=$cap")
      // NULLs in a rowid-table composite PK are allowed, twice
      exec(db, "INSERT INTO t VALUES (NULL, 9, 'n1'), (NULL, 9, 'n2')")
      assert(q(db, "SELECT count(*) FROM t") == Seq(Seq(7L)), s"cap=$cap")
      // not a rowid alias: x keeps its own values, auto rowids flow
      assert(q(db, "SELECT x, y FROM t WHERE v = 'a'") == Seq(Seq(1L, 1L)),
        s"cap=$cap")
    }
  }

  test("composite UNIQUE + conflict policies over the tuple") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "CREATE TABLE u (a INTEGER, b INTEGER, c INTEGER, UNIQUE (a, b))")
      exec(db, "INSERT INTO u VALUES (1, 1, 0), (1, 2, 0), (2, 1, 0), " +
        "(2, 2, 0), (3, 3, 0)")
      assert(execErr(db, "INSERT INTO u VALUES (1, 1, 9)") ==
        "UNIQUE constraint failed: u.a, u.b", s"cap=$cap")
      assert(exec(db, "INSERT OR IGNORE INTO u VALUES (1, 1, 9), (4, 4, 9)") ==
        1L, s"cap=$cap")
      // policy UPDATE over the composite spec: (1,2)->(1,1) conflicts and
      // is skipped under IGNORE; no-op key rewrites are not conflicts
      assert(exec(db, "UPDATE OR IGNORE u SET b = 1 WHERE a <= 2") == 2L,
        s"cap=$cap")
      assert(q(db, "SELECT a, b FROM u WHERE a <= 2 ORDER BY a, b") ==
        Seq(Seq(1L, 1L), Seq(1L, 2L), Seq(2L, 1L), Seq(2L, 2L)), s"cap=$cap")
    }
  }

  test("table_info ordinals, ALTER interactions, shape errors") {
    val db = GraftDb.openInMemory(spark, 500)
    exec(db, "CREATE TABLE t (x INTEGER, y INTEGER, v TEXT, PRIMARY KEY (y, x))")
    assert(q(db, "PRAGMA table_info(t)").map(r => (r(1), r(5))) ==
      Seq(("x", 2L), ("y", 1L), ("v", 0L)))
    exec(db, "ALTER TABLE t RENAME COLUMN x TO x2")
    exec(db, "INSERT INTO t VALUES (1, 1, 'a')")
    assert(execErr(db, "INSERT INTO t VALUES (1, 1, 'b')") ==
      "UNIQUE constraint failed: t.y, t.x2")
    assert(execErr(db, "ALTER TABLE t DROP COLUMN x2") ==
      """cannot drop PRIMARY KEY column: "x2"""")
    exec(db, "CREATE TABLE w (a INTEGER, b INTEGER, c INTEGER, UNIQUE (a, b))")
    assert(execErr(db, "ALTER TABLE w DROP COLUMN b") ==
      "error in table w after drop column: no such column: b")
    exec(db, "ALTER TABLE w RENAME COLUMN b TO b2")
    exec(db, "INSERT INTO w VALUES (5, 5, 0)")
    assert(execErr(db, "INSERT INTO w VALUES (5, 5, 1)") ==
      "UNIQUE constraint failed: w.a, w.b2")
    assert(execErr(db, "CREATE TABLE bad (a INTEGER, PRIMARY KEY (zz))") ==
      "no such column: zz")
    assert(execErr(db, "CREATE TABLE bad2 (a INTEGER PRIMARY KEY, " +
      "b INTEGER, PRIMARY KEY (a, b))") ==
      """table "bad2" has more than one primary key""")
    // a composite-PK table survives checkpoint/recovery via renderCreate
    exec(db, "INSERT INTO t VALUES (2, 2, 'z')")
    assert(q(db, "SELECT count(*) FROM t") == Seq(Seq(2L)))
  }

  test("multi-violation reporting follows SQLite's index-list order") {
    // SQLite PREPENDS each new index to the table's index list, so when
    // one row violates several unique constraints the NEWEST one names
    // the error: named indexes newest-first, then table clauses and
    // column constraints in reverse declaration order; the rowid itself
    // always wins (probed live; fuzz V7 caught the old
    // declaration-order reporting)
    val db = GraftDb.openInMemory(spark, 500)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER UNIQUE, b TEXT)")
    exec(db, "CREATE UNIQUE INDEX uidx ON t(b)")
    exec(db, "INSERT INTO t VALUES (1, 5, 'x')")
    assert(execErr(db, "INSERT INTO t VALUES (2, 5, 'x')") ==
      "UNIQUE constraint failed: t.b") // both violated → newest (uidx)
    assert(execErr(db, "INSERT INTO t VALUES (2, 5, 'y')") ==
      "UNIQUE constraint failed: t.a") // only the column constraint
    assert(execErr(db, "INSERT INTO t VALUES (1, 5, 'x')") ==
      "UNIQUE constraint failed: t.id") // the rowid always wins
    val db2 = GraftDb.openInMemory(spark, 500)
    exec(db2, "CREATE TABLE u (id INTEGER PRIMARY KEY, a INTEGER UNIQUE, " +
      "b INTEGER UNIQUE)")
    exec(db2, "INSERT INTO u VALUES (1, 5, 7)")
    assert(execErr(db2, "INSERT INTO u VALUES (2, 5, 7)") ==
      "UNIQUE constraint failed: u.b") // reverse declaration order
    val db3 = GraftDb.openInMemory(spark, 500)
    exec(db3, "CREATE TABLE w (id INTEGER PRIMARY KEY, a INTEGER UNIQUE, " +
      "b INTEGER, UNIQUE (a, b))")
    exec(db3, "INSERT INTO w VALUES (1, 5, 7)")
    assert(execErr(db3, "INSERT INTO w VALUES (2, 5, 7)") ==
      "UNIQUE constraint failed: w.a, w.b") // table clause beats column
  }
}
