package graft.engine

import graft.SparkSpec
import graft.command.Value

/** AUTOINCREMENT + sqlite_sequence + INSERT ... DEFAULT VALUES goldens
  * (SQLite surface the reference delegates to — `db/src/db.rs:176,278`).
  * Every expected value probed live on SQLite 3.40:
  *  - next auto rowid on an AUTOINCREMENT table = max(seq, current max
  *    rowid) + 1 — freed top rowids are never reused;
  *  - sqlite_sequence materializes (empty) with the first AUTOINCREMENT
  *    table; its row appears on first insert with seq = max(0, largest
  *    rowid inserted), advances on INSERT only (explicit ids below the
  *    mark and skipped OR IGNORE candidates leave it untouched), follows
  *    RENAME, disappears with DROP TABLE, rolls back with the tx, and is
  *    user-writable (UPDATE ... SET seq = 0 resets numbering);
  *  - reserved-name and shape errors use SQLite's exact texts;
  *  - INSERT INTO t DEFAULT VALUES inserts one all-defaults row.
  * Runs at cap 500 (Mem) and cap 4 (5-row tables spill to Big). */
class AutoincrementSpec extends SparkSpec {

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

  test("monotonic rowids: freed top rowids are never reused") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "CREATE TABLE u (id INTEGER PRIMARY KEY AUTOINCREMENT, a INTEGER)")
      // exists but empty before the first insert
      assert(q(db, "SELECT count(*) FROM sqlite_sequence") == Seq(Seq(0L)),
        s"cap=$cap")
      exec(db, "INSERT INTO u(a) VALUES (1), (2), (3), (4), (5)")
      assert(q(db, "SELECT name, seq FROM sqlite_sequence") ==
        Seq(Seq("u", 5L)), s"cap=$cap")
      exec(db, "DELETE FROM u WHERE id >= 4")
      exec(db, "INSERT INTO u(a) VALUES (6)")
      // plain rowid tables would reuse 4; AUTOINCREMENT continues at 6
      assert(q(db, "SELECT id FROM u ORDER BY id") ==
        Seq(Seq(1L), Seq(2L), Seq(3L), Seq(6L)), s"cap=$cap")
      // explicit id above the mark bumps seq; below leaves it
      exec(db, "INSERT INTO u VALUES (30, 7)")
      exec(db, "INSERT INTO u VALUES (9, 8)")
      assert(q(db, "SELECT seq FROM sqlite_sequence") == Seq(Seq(30L)),
        s"cap=$cap")
      exec(db, "INSERT INTO u(a) VALUES (9)")
      assert(q(db, "SELECT max(id) FROM u") == Seq(Seq(31L)), s"cap=$cap")
    }
  }

  test("seq follows UPDATE of the pk only via the table max; user reset works") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "CREATE TABLE u (id INTEGER PRIMARY KEY AUTOINCREMENT, a INTEGER)")
      exec(db, "INSERT INTO u(a) VALUES (1), (2), (3), (4), (5)")
      // rekey above the mark: seq unchanged, next auto = max(seq, max)+1
      exec(db, "UPDATE u SET id = 50 WHERE id = 5")
      assert(q(db, "SELECT seq FROM sqlite_sequence") == Seq(Seq(5L)),
        s"cap=$cap")
      exec(db, "INSERT INTO u(a) VALUES (6)")
      assert(q(db, "SELECT max(id) FROM u") == Seq(Seq(51L)), s"cap=$cap")
      // user reset: numbering restarts from the table max
      exec(db, "DELETE FROM u")
      exec(db, "UPDATE sqlite_sequence SET seq = 0 WHERE name = 'u'")
      exec(db, "INSERT INTO u(a) VALUES (9)")
      assert(q(db, "SELECT id FROM u") == Seq(Seq(1L)), s"cap=$cap")
    }
  }

  test("IGNORE skips and failed statements leave seq untouched; tx rolls it back") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "CREATE TABLE u (id INTEGER PRIMARY KEY AUTOINCREMENT, a INTEGER)")
      exec(db, "INSERT INTO u(a) VALUES (1)")
      exec(db, "INSERT OR IGNORE INTO u VALUES (1, 9), (30, 9)")
      assert(q(db, "SELECT seq FROM sqlite_sequence") == Seq(Seq(30L)),
        s"cap=$cap")
      exec(db, "INSERT OR IGNORE INTO u VALUES (1, 9)") // all skipped
      assert(q(db, "SELECT seq FROM sqlite_sequence") == Seq(Seq(30L)),
        s"cap=$cap")
      execErr(db, "INSERT INTO u VALUES (40, 1), (40, 2)") // aborted
      assert(q(db, "SELECT seq FROM sqlite_sequence") == Seq(Seq(30L)),
        s"cap=$cap")
      exec(db, "BEGIN")
      exec(db, "INSERT INTO u(a) VALUES (2)")
      assert(q(db, "SELECT seq FROM sqlite_sequence") == Seq(Seq(31L)),
        s"cap=$cap")
      exec(db, "ROLLBACK")
      assert(q(db, "SELECT seq FROM sqlite_sequence") == Seq(Seq(30L)),
        s"cap=$cap")
      exec(db, "INSERT INTO u(a) VALUES (3)")
      assert(q(db, "SELECT max(id) FROM u") == Seq(Seq(31L)), s"cap=$cap")
      // an OR FAIL prefix is KEPT but does NOT advance the sequence (seq
      // updates on statement SUCCESS only — probed live; the divergence
      // the OLTP fuzzer found at seed 97149): next auto still covers the
      // prefix through max(seq, max rowid) + 1
      val db2 = GraftDb.openInMemory(spark, cap)
      exec(db2, "CREATE TABLE w (id INTEGER PRIMARY KEY AUTOINCREMENT, a INTEGER)")
      exec(db2, "INSERT INTO w VALUES (1, 1), (2, 2), (5, 5)")
      execErr(db2, "INSERT OR FAIL INTO w VALUES (14, 0), (10, -2), (5, 9)")
      assert(q(db2, "SELECT id FROM w ORDER BY id") ==
        Seq(Seq(1L), Seq(2L), Seq(5L), Seq(10L), Seq(14L)), s"cap=$cap")
      assert(q(db2, "SELECT seq FROM sqlite_sequence") == Seq(Seq(5L)),
        s"cap=$cap")
      exec(db2, "INSERT INTO w(a) VALUES (7)")
      assert(q(db2, "SELECT max(id) FROM w") == Seq(Seq(15L)), s"cap=$cap")

      // the sequence takes the statement's final rowid REGISTER on
      // success — every candidate feeds it, skipped and upsert-hit ones
      // included, and on an AUTOINCREMENT table even a skipped AUTO
      // candidate consumes its register slot (probed live; fuzz V7
      // seed 102266)
      val db3 = GraftDb.openInMemory(spark, cap)
      exec(db3, "CREATE TABLE v (id INTEGER PRIMARY KEY AUTOINCREMENT, " +
        "a INTEGER UNIQUE)")
      exec(db3, "INSERT INTO v VALUES (1, 1)")
      assert(exec(db3, "INSERT OR IGNORE INTO v VALUES (12, 1)") == 0L,
        s"cap=$cap") // skipped, yet seq = 12
      assert(q(db3, "SELECT seq FROM sqlite_sequence") == Seq(Seq(12L)),
        s"cap=$cap")
      exec(db3, "INSERT INTO v VALUES (15, 1) ON CONFLICT(a) DO NOTHING")
      assert(q(db3, "SELECT seq FROM sqlite_sequence") == Seq(Seq(15L)),
        s"cap=$cap")
      // skipped AUTO candidate consumes: (NULL,1) takes 16, (NULL,7) 17
      assert(exec(db3, "INSERT OR IGNORE INTO v VALUES (NULL, 1), (NULL, 7)")
        == 1L, s"cap=$cap")
      assert(q(db3, "SELECT id FROM v WHERE a = 7") == Seq(Seq(17L)),
        s"cap=$cap")
      assert(q(db3, "SELECT seq FROM sqlite_sequence") == Seq(Seq(17L)),
        s"cap=$cap")
      // a skipped HIGH explicit id feeds the register for a later auto
      // in the SAME statement: skip 30, then auto lands on 31
      assert(exec(db3, "INSERT OR IGNORE INTO v VALUES (30, 1), (NULL, 9)")
        == 1L, s"cap=$cap")
      assert(q(db3, "SELECT id FROM v WHERE a = 9") == Seq(Seq(31L)),
        s"cap=$cap")
    }
  }

  test("sequence rows follow DROP and RENAME; reserved-name guards") {
    val db = GraftDb.openInMemory(spark, 500)
    exec(db, "CREATE TABLE u (id INTEGER PRIMARY KEY AUTOINCREMENT, a INTEGER)")
    exec(db, "CREATE TABLE v (id INTEGER PRIMARY KEY AUTOINCREMENT, a INTEGER)")
    exec(db, "INSERT INTO u(a) VALUES (1)")
    exec(db, "INSERT INTO v(a) VALUES (1)")
    exec(db, "DROP TABLE u")
    assert(q(db, "SELECT name, seq FROM sqlite_sequence") == Seq(Seq("v", 1L)))
    exec(db, "ALTER TABLE v RENAME TO w")
    assert(q(db, "SELECT name, seq FROM sqlite_sequence") == Seq(Seq("w", 1L)))
    assert(execErr(db, "CREATE TABLE sqlite_sequence (x INTEGER)") ==
      "object name reserved for internal use: sqlite_sequence")
    assert(execErr(db, "DROP TABLE sqlite_sequence") ==
      "table sqlite_sequence may not be dropped")
    assert(execErr(db, "CREATE TABLE bad (x TEXT AUTOINCREMENT)") ==
      "near \"AUTOINCREMENT\": syntax error")
    assert(execErr(db, "CREATE TABLE bad2 (id INTEGER AUTOINCREMENT, a INTEGER)") ==
      "near \"AUTOINCREMENT\": syntax error")
    // no AUTOINCREMENT tables ever created → no sqlite_sequence
    val db2 = GraftDb.openInMemory(spark, 500)
    exec(db2, "CREATE TABLE t (id INTEGER PRIMARY KEY)")
    assert(db2.queryStringStmt("SELECT * FROM sqlite_sequence").fold(
      e => e, r => s"unexpected: $r").contains("no such table"))
  }

  test("INSERT ... DEFAULT VALUES inserts one all-defaults row") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER DEFAULT 7, " +
        "b TEXT DEFAULT 'x', c INTEGER)")
      assert(exec(db, "INSERT INTO t DEFAULT VALUES") == 1L, s"cap=$cap")
      assert(exec(db, "INSERT INTO t DEFAULT VALUES") == 1L, s"cap=$cap")
      assert(q(db, "SELECT * FROM t ORDER BY id") ==
        Seq(Seq(1L, 7L, "x", null), Seq(2L, 7L, "x", null)), s"cap=$cap")
      // expression defaults evaluate; AUTOINCREMENT composes
      val db2 = GraftDb.openInMemory(spark, cap)
      exec(db2, "CREATE TABLE d (id INTEGER PRIMARY KEY AUTOINCREMENT, " +
        "a INTEGER DEFAULT (3*4))")
      exec(db2, "INSERT INTO d DEFAULT VALUES")
      assert(q(db2, "SELECT * FROM d") == Seq(Seq(1L, 12L)), s"cap=$cap")
      assert(q(db2, "SELECT seq FROM sqlite_sequence") == Seq(Seq(1L)),
        s"cap=$cap")
      // NOT NULL without default fails with SQLite's text
      exec(db2, "CREATE TABLE n (id INTEGER PRIMARY KEY, a INTEGER NOT NULL)")
      assert(execErr(db2, "INSERT INTO n DEFAULT VALUES") ==
        "NOT NULL constraint failed: n.a", s"cap=$cap")
    }
  }
}
