package graft.engine

import graft.SparkSpec
import graft.command.Value

/** PRAGMA index_list / index_info — goldens probed live on SQLite 3.40.1:
  *
  *  - list order is the table's index list, which SQLite PREPENDS to:
  *    named indexes newest-first, then automatic constraint indexes in
  *    reverse declaration order;
  *  - origin: 'c' named, 'u' unique column/clause, 'pk' primary key; a
  *    WITHOUT ROWID PK is listed (origin pk) though sqlite_master hides
  *    it; an INTEGER PRIMARY KEY rowid alias creates no index at all;
  *  - partial=1 only for a WHERE index (an expression index without a
  *    WHERE stays 0);
  *  - index_info cids use the FULL column numbering (a hidden generated
  *    column keeps its slot) and report (-2, NULL) for an expression
  *    position;
  *  - a missing table/index yields the empty envelope. */
class IndexPragmaSpec extends SparkSpec {

  private def ok(db: GraftDb, sql: String): Unit = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
  }

  private def rows(db: GraftDb, sql: String): Seq[Seq[Any]] =
    db.queryStringStmt(sql).fold(e => fail(e), _.head.values).map(_.map {
      case Value.Integer(v) => v
      case Value.Text(v) => v
      case Value.Null => null
      case other => other
    })

  test("list order, origins and partial flags (probed)") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER UNIQUE, " +
      "b TEXT)")
    ok(db, "CREATE INDEX ix ON t(b)")
    ok(db, "CREATE UNIQUE INDEX ux ON t(a, b) WHERE a > 2")
    // probed: [(0,ux,1,c,1), (1,ix,0,c,0), (2,sqlite_autoindex_t_1,1,u,0)]
    assert(rows(db, "PRAGMA index_list(t)") == Seq(
      Seq(0L, "ux", 1L, "c", 1L),
      Seq(1L, "ix", 0L, "c", 0L),
      Seq(2L, "sqlite_autoindex_t_1", 1L, "u", 0L)))
    // composite PK + UNIQUE clause: reverse declaration order, origins
    ok(db, "CREATE TABLE p (a INTEGER, b INTEGER, c TEXT, " +
      "PRIMARY KEY (a, b), UNIQUE (c))")
    assert(rows(db, "PRAGMA index_list(p)") == Seq(
      Seq(0L, "sqlite_autoindex_p_2", 1L, "u", 0L),
      Seq(1L, "sqlite_autoindex_p_1", 1L, "pk", 0L)))
    // WITHOUT ROWID: the PK autoindex IS listed here
    ok(db, "CREATE TABLE w (k TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID")
    assert(rows(db, "PRAGMA index_list(w)") == Seq(
      Seq(0L, "sqlite_autoindex_w_1", 1L, "pk", 0L)))
    // rowid alias: no index; missing table: empty
    ok(db, "CREATE TABLE r (id INTEGER PRIMARY KEY, a INTEGER)")
    assert(rows(db, "PRAGMA index_list(r)").isEmpty)
    assert(rows(db, "PRAGMA index_list(nope)").isEmpty)
  }

  test("index_info cids, expression positions, unknown names (probed)") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE p (a INTEGER, b INTEGER, c TEXT, " +
      "PRIMARY KEY (a, b), UNIQUE (c))")
    assert(rows(db, "PRAGMA index_info(sqlite_autoindex_p_1)") == Seq(
      Seq(0L, 0L, "a"), Seq(1L, 1L, "b")))
    assert(rows(db, "PRAGMA index_info(sqlite_autoindex_p_2)") == Seq(
      Seq(0L, 2L, "c")))
    // expression position → (-2, NULL); partial flag stays 0 without a
    // WHERE even for an expression index
    ok(db, "CREATE TABLE e (x INTEGER, y TEXT)")
    ok(db, "CREATE INDEX e1 ON e(lower(y))")
    assert(rows(db, "PRAGMA index_list(e)") == Seq(
      Seq(0L, "e1", 0L, "c", 0L)))
    assert(rows(db, "PRAGMA index_info(e1)") == Seq(Seq(0L, -2L, null)))
    // hidden generated column keeps its cid slot (probed: gx reports 3)
    val db2 = GraftDb.openInMemory(spark, 500)
    ok(db2, "CREATE TABLE g (id INTEGER PRIMARY KEY, a INTEGER, " +
      "b TEXT GENERATED ALWAYS AS (a + 1) VIRTUAL, d TEXT)")
    ok(db2, "CREATE INDEX gx ON g(d)")
    assert(rows(db2, "PRAGMA index_info(gx)") == Seq(Seq(0L, 3L, "d")))
    assert(rows(db2, "PRAGMA index_info(nope)").isEmpty)
  }

  test("table_xinfo, integrity_check, database_list (probed)") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE g (id INTEGER PRIMARY KEY, " +
      "a INTEGER NOT NULL DEFAULT 7, " +
      "b TEXT GENERATED ALWAYS AS (a + 1) VIRTUAL, " +
      "s TEXT GENERATED ALWAYS AS (a * 2) STORED, d TEXT)")
    // probed: xinfo keeps generated columns, hidden 2=VIRTUAL 3=STORED,
    // full cid numbering; table_info hides them and renumbers
    assert(rows(db, "PRAGMA table_xinfo(g)") == Seq(
      Seq(0L, "id", "INTEGER", 0L, null, 1L, 0L),
      Seq(1L, "a", "INTEGER", 1L, "7", 0L, 0L),
      Seq(2L, "b", "TEXT", 0L, null, 0L, 2L),
      Seq(3L, "s", "TEXT", 0L, null, 0L, 3L),
      Seq(4L, "d", "TEXT", 0L, null, 0L, 0L)))
    assert(rows(db, "PRAGMA table_info(g)").map(_(1)) ==
      Seq("id", "a", "d"))
    assert(rows(db, "PRAGMA table_xinfo(nope)").isEmpty)
    assert(rows(db, "PRAGMA integrity_check") == Seq(Seq("ok")))
    assert(rows(db, "PRAGMA quick_check") == Seq(Seq("ok")))
    // memory database: file is '' (probed)
    assert(rows(db, "PRAGMA database_list") == Seq(Seq(0L, "main", "")))
  }

  test("sqlite_schema alias and collation_list (probed)") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE t (a INTEGER)")
    // SQLite 3.33+: sqlite_schema is the same catalog as sqlite_master
    assert(rows(db, "SELECT name FROM sqlite_schema WHERE type = 'table'")
      == Seq(Seq("t")))
    // writes through the alias echo the CANONICAL name (probed)
    val r = db.executeStringStmt("DELETE FROM sqlite_schema")
      .fold(e => fail(e), identity).head
    assert(r.error == "table sqlite_master may not be modified")
    val d = db.executeStringStmt("DROP TABLE sqlite_schema")
      .fold(e => fail(e), identity).head
    assert(d.error == "table sqlite_master may not be dropped")
    // absent sqlite_sequence: `no such table`, not the drop guard
    val s2 = db.executeStringStmt("DROP TABLE sqlite_sequence")
      .fold(e => fail(e), identity).head
    assert(s2.error == "no such table: sqlite_sequence")
    assert(rows(db, "PRAGMA collation_list") == Seq(
      Seq(0L, "RTRIM"), Seq(1L, "NOCASE"), Seq(2L, "BINARY")))
  }

  test("uncommitted DDL is visible inside the open transaction") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER)")
    ok(db, "BEGIN")
    ok(db, "CREATE UNIQUE INDEX tx_ix ON t(a)")
    assert(rows(db, "PRAGMA index_list(t)") == Seq(
      Seq(0L, "tx_ix", 1L, "c", 0L)))
    ok(db, "ROLLBACK")
    assert(rows(db, "PRAGMA index_list(t)").isEmpty)
  }

  test("autoindex numbering follows source order: UNIQUE column before " +
    "a table-level PK clause (probed 3.40.1, ADVICE r13)") {
    val db = GraftDb.openInMemory(spark, 500)
    // probed: sqlite_autoindex_p_1 = u(y), sqlite_autoindex_p_2 = pk(x,z)
    ok(db, "CREATE TABLE p (x INTEGER, y INTEGER UNIQUE, z INTEGER, " +
      "PRIMARY KEY (x, z))")
    assert(rows(db, "PRAGMA index_list(p)") == Seq(
      Seq(0L, "sqlite_autoindex_p_2", 1L, "pk", 0L),
      Seq(1L, "sqlite_autoindex_p_1", 1L, "u", 0L)))
    assert(rows(db, "PRAGMA index_info(sqlite_autoindex_p_1)") ==
      Seq(Seq(0L, 1L, "y")))
    assert(rows(db, "PRAGMA index_info(sqlite_autoindex_p_2)") ==
      Seq(Seq(0L, 0L, "x"), Seq(1L, 2L, "z")))
    // declared clause order among table-level constraints (probed:
    // UNIQUE(x,z) then PRIMARY KEY(x,y) then UNIQUE(y,z) → _2, _3, _4)
    ok(db, "CREATE TABLE p2 (x INTEGER, y INTEGER UNIQUE, z INTEGER, " +
      "UNIQUE (x, z), PRIMARY KEY (x, y), UNIQUE (y, z))")
    assert(rows(db, "PRAGMA index_list(p2)").map(r => (r(1), r(3))) == Seq(
      ("sqlite_autoindex_p2_4", "u"), ("sqlite_autoindex_p2_3", "pk"),
      ("sqlite_autoindex_p2_2", "u"), ("sqlite_autoindex_p2_1", "u")))
    assert(rows(db, "PRAGMA index_info(sqlite_autoindex_p2_3)")
      .map(_(2)) == Seq("x", "y"))
    // sqlite_master shows the same ordinals
    assert(rows(db,
      "SELECT name FROM sqlite_master WHERE tbl_name = 'p' " +
        "AND type = 'index' ORDER BY name").flatten ==
      Seq("sqlite_autoindex_p_1", "sqlite_autoindex_p_2"))
    db.close()
  }
}
