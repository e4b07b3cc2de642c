package graft.engine

import graft.SparkSpec
import graft.command.Value

/** `sqlite_master` — the schema catalog every SQLite client introspects
  * (surface the reference delegates to, `db/src/db.rs:176,278`). Probed
  * live on SQLite 3.40:
  *  - one `table` row per table with the ORIGINAL createSql, one `index`
  *    row per named index, `sqlite_autoindex_<t>_<n>` rows (sql NULL) for
  *    every non-rowid-alias unique constraint, `view`/`trigger` rows with
  *    rootpage 0; sqlite_sequence appears once an AUTOINCREMENT table
  *    exists;
  *  - the catalog may not be modified or dropped; ANY `sqlite_`-prefixed
  *    object name is reserved at CREATE / CTAS / CREATE VIEW / RENAME.
  * Rootpage values are deterministic ordinals here (SQLite's are page-
  * allocation accidents); `none`-level reads see data tables only (the
  * committed snapshot carries no catalog) — both documented. */
class SqliteMasterSpec extends SparkSpec {

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

  test("catalog rows: tables, autoindexes, named indexes, views, triggers") {
    val db = GraftDb.openInMemory(spark, 500)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER UNIQUE)")
    exec(db, "CREATE TABLE p (a INTEGER, b INTEGER, UNIQUE (a, b))")
    exec(db, "CREATE INDEX idx ON t(a)")
    exec(db, "CREATE VIEW v AS SELECT id FROM t")
    exec(db, "CREATE TRIGGER trg AFTER INSERT ON t BEGIN " +
      "INSERT INTO t(a) VALUES (NEW.a); END")
    // same (type, name, tbl_name) set as SQLite 3.40 on this DDL
    assert(q(db, "SELECT type, name, tbl_name FROM sqlite_master " +
      "ORDER BY name") == Seq(
      Seq("index", "idx", "t"),
      Seq("table", "p", "p"),
      Seq("index", "sqlite_autoindex_p_1", "p"),
      Seq("index", "sqlite_autoindex_t_1", "t"),
      Seq("table", "t", "t"),
      Seq("trigger", "trg", "t"),
      Seq("view", "v", "v")))
    // original statement text; autoindex sql is NULL
    assert(q(db, "SELECT sql FROM sqlite_master WHERE name = 't'") ==
      Seq(Seq("CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER UNIQUE)")))
    assert(q(db, "SELECT sql FROM sqlite_master " +
      "WHERE name = 'sqlite_autoindex_t_1'") == Seq(Seq(null)))
    // introspection composes with plain SQL (joins, filters)
    assert(q(db, "SELECT count(*) FROM sqlite_master WHERE type = 'index'") ==
      Seq(Seq(3L)))
    // catalog reflects drops immediately
    exec(db, "DROP TRIGGER trg")
    exec(db, "DROP VIEW v")
    assert(q(db, "SELECT count(*) FROM sqlite_master " +
      "WHERE type IN ('view', 'trigger')") == Seq(Seq(0L)))
    // sqlite_sequence joins the catalog with the first AUTOINCREMENT table
    exec(db, "CREATE TABLE u (id INTEGER PRIMARY KEY AUTOINCREMENT, a INTEGER)")
    assert(q(db, "SELECT name FROM sqlite_master WHERE type = 'table' " +
      "ORDER BY name") ==
      Seq(Seq("p"), Seq("sqlite_sequence"), Seq("t"), Seq("u")))
  }

  test("empty catalog; modification and reserved-name guards") {
    val db = GraftDb.openInMemory(spark, 500)
    assert(q(db, "SELECT count(*) FROM sqlite_master") == Seq(Seq(0L)))
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY)")
    assert(execErr(db, "INSERT INTO sqlite_master VALUES " +
      "('x', 'y', 'z', 0, 'w')") == "table sqlite_master may not be modified")
    assert(execErr(db, "UPDATE sqlite_master SET name = 'q'") ==
      "table sqlite_master may not be modified")
    assert(execErr(db, "DELETE FROM sqlite_master") ==
      "table sqlite_master may not be modified")
    assert(execErr(db, "DROP TABLE sqlite_master") ==
      "table sqlite_master may not be dropped")
    assert(execErr(db, "CREATE TABLE sqlite_foo (x INTEGER)") ==
      "object name reserved for internal use: sqlite_foo")
    assert(execErr(db, "CREATE VIEW sqlite_v AS SELECT 1 AS one") ==
      "object name reserved for internal use: sqlite_v")
    assert(execErr(db, "ALTER TABLE t RENAME TO sqlite_t") ==
      "object name reserved for internal use: sqlite_t")
  }
}
