package graft.engine

import graft.SparkSpec
import graft.command.Value

/** WITHOUT ROWID tables (VERDICT r12 #3), probed live on SQLite 3.40.1:
  *  - the PRIMARY KEY is required, implicitly NOT NULL, and is the
  *    clustered storage key — unqualified scans return PK order, not
  *    insertion order;
  *  - there is no rowid: `SELECT rowid` fails, INTEGER PRIMARY KEY is
  *    NOT an alias (NULL rejected, nothing auto-assigned), inserts never
  *    advance last_insert_rowid, and AUTOINCREMENT is a CREATE error;
  *  - sqlite_master carries no autoindex entry for the PK (it still
  *    consumes its ordinal — `w5(k PK, u UNIQUE) WITHOUT ROWID` lists
  *    only sqlite_autoindex_w5_2).
  * Runs at cap 500 (Mem) and cap 2 (spilled) where applicable. */
class WithoutRowidSpec extends SparkSpec {

  private def caps = Seq(500L, 2L)

  private def ok(db: GraftDb, sql: String): Long = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
    r.rowsAffected
  }

  private def lid(db: GraftDb, sql: String): Long = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
    r.lastInsertId
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
        case Value.Null => null; case v => v
      })

  test("CREATE shape errors: PK required, AUTOINCREMENT rejected") {
    val db = GraftDb.openInMemory(spark, 500)
    assert(err(db, "CREATE TABLE w2 (a INT) WITHOUT ROWID") ==
      "PRIMARY KEY missing on table w2")
    assert(err(db, "CREATE TABLE w4 (id INTEGER PRIMARY KEY AUTOINCREMENT)" +
      " WITHOUT ROWID") == "AUTOINCREMENT not allowed on WITHOUT ROWID tables")
  }

  test("PK enforcement, PK-order scans, no last_insert_rowid advance") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      ok(db, "CREATE TABLE w (k TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID")
      ok(db, "CREATE TABLE norm (id INTEGER PRIMARY KEY, v INTEGER)")
      assert(lid(db, "INSERT INTO norm VALUES (7, 0)") == 7L)
      // probed: a WITHOUT ROWID insert leaves the counter at 7
      assert(lid(db, "INSERT INTO w VALUES ('b', 2)") == 7L, s"cap=$cap")
      assert(lid(db, "INSERT INTO w VALUES ('a', 1)") == 7L, s"cap=$cap")
      assert(err(db, "INSERT INTO w VALUES ('a', 9)") ==
        "UNIQUE constraint failed: w.k", s"cap=$cap")
      ok(db, "INSERT INTO w VALUES ('A', 3)")
      // probed scan order: clustered PK (binary): 'A' < 'a' < 'b'
      assert(q(db, "SELECT k, v FROM w") ==
        Seq(Seq("A", 3L), Seq("a", 1L), Seq("b", 2L)), s"cap=$cap")
      // implicit NOT NULL on the PK
      assert(err(db, "INSERT INTO w VALUES (NULL, 5)") ==
        "NOT NULL constraint failed: w.k", s"cap=$cap")
    }
  }

  test("composite PK WITHOUT ROWID: implicit NOT NULL on every key column") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      ok(db, "CREATE TABLE w3 (a INTEGER, b INTEGER, v TEXT, " +
        "PRIMARY KEY (a, b)) WITHOUT ROWID")
      ok(db, "INSERT INTO w3 VALUES (1, 2, 'x')")
      assert(err(db, "INSERT INTO w3 VALUES (NULL, 1, 'y')") ==
        "NOT NULL constraint failed: w3.a", s"cap=$cap")
      assert(err(db, "INSERT INTO w3 VALUES (1, 2, 'dup')") ==
        "UNIQUE constraint failed: w3.a, w3.b", s"cap=$cap")
      ok(db, "INSERT INTO w3 VALUES (1, 1, 'z')")
      assert(q(db, "SELECT a, b, v FROM w3") ==
        Seq(Seq(1L, 1L, "z"), Seq(1L, 2L, "x")), s"cap=$cap")
    }
  }

  test("INTEGER PRIMARY KEY is not a rowid alias in WITHOUT ROWID") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE wi (id INTEGER PRIMARY KEY, v TEXT) WITHOUT ROWID")
    // probed: NULL is rejected, nothing auto-assigns
    assert(err(db, "INSERT INTO wi(v) VALUES ('x')") ==
      "NOT NULL constraint failed: wi.id")
    ok(db, "INSERT INTO wi VALUES (5, 'y')")
    assert(q(db, "SELECT id, v FROM wi") == Seq(Seq(5L, "y")))
  }

  test("UPDATE and DELETE through the PK work; scan stays PK-ordered") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      ok(db, "CREATE TABLE w (k TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID")
      ok(db, "INSERT INTO w VALUES ('b', 2), ('a', 1), ('c', 3)")
      ok(db, "UPDATE w SET k = 'zz' WHERE k = 'b'")
      assert(q(db, "SELECT k FROM w") ==
        Seq(Seq("a"), Seq("c"), Seq("zz")), s"cap=$cap")
      assert(ok(db, "DELETE FROM w WHERE v = 1") == 1L)
      assert(q(db, "SELECT k FROM w") == Seq(Seq("c"), Seq("zz")), s"cap=$cap")
    }
  }

  test("sqlite_master: the PK consumes its autoindex ordinal, emits none") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE w5 (k TEXT PRIMARY KEY, u TEXT UNIQUE) " +
      "WITHOUT ROWID")
    ok(db, "CREATE TABLE n5 (k TEXT PRIMARY KEY, u TEXT UNIQUE)")
    assert(q(db, "SELECT name FROM sqlite_master WHERE type = 'index' " +
      "ORDER BY name") == Seq(Seq("sqlite_autoindex_n5_1"),
        Seq("sqlite_autoindex_n5_2"), Seq("sqlite_autoindex_w5_2")))
  }

  test("table_info reports the implicit NOT NULL; persistence round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wr-")
    def open(): GraftDb = GraftDb.open(spark, dir.resolve("db").toString, 500)
      .fold(e => fail(e), identity)
    val db = open()
    ok(db, "CREATE TABLE w (k TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID")
    // probed: (0, k, TEXT, notnull=1, None, pk=1)
    assert(q(db, "PRAGMA table_info(w)").map(r => (r(1), r(3), r(5))) ==
      Seq(("k", 1L, 1L), ("v", 0L, 0L)))
    ok(db, "INSERT INTO w VALUES ('m', 1)")
    db.close()
    val db2 = open()
    assert(err(db2, "INSERT INTO w VALUES ('m', 2)") ==
      "UNIQUE constraint failed: w.k")
    assert(err(db2, "INSERT INTO w VALUES (NULL, 3)") ==
      "NOT NULL constraint failed: w.k",
      "implicit PK NOT NULL must survive reopen")
    db2.close()
  }
}
