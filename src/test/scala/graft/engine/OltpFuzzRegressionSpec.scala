package graft.engine

import graft.SparkSpec
import graft.command.Value

/** Regressions surfaced by the OLTP differential fuzzer
  * (graft.OltpFuzzRun / tools/check_oltp.py) — each test replays a
  * shrunk statement sequence that diverged from real SQLite and pins the
  * SQLite-verified outcome. */
class OltpFuzzRegressionSpec extends SparkSpec {

  private def ok(db: GraftDb, sql: String): Unit = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
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

  private def longOf(db: GraftDb, sql: String): Long =
    db.queryStringStmt(sql).fold(e => fail(e), _.head.values)
      .head.head.asInstanceOf[Value.Integer].v

  test("rowid assignment is max(current)+1: freed top rowids are reused") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE t (id INTEGER NOT NULL PRIMARY KEY, a INTEGER)")
    ok(db, "INSERT INTO t(a) VALUES (1)") // rid 1
    ok(db, "INSERT INTO t VALUES (10, 2)")
    ok(db, "DELETE FROM t WHERE id = 10")
    assert(lid(db, "INSERT INTO t(a) VALUES (3)") == 2L,
      "after deleting the max rowid, SQLite assigns max(remaining)+1")
    ok(db, "DELETE FROM t")
    assert(lid(db, "INSERT INTO t(a) VALUES (4)") == 1L,
      "an emptied table restarts at rowid 1")
  }

  test("aborted INSERT still advances last_insert_rowid for its good prefix") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE t (id INTEGER NOT NULL PRIMARY KEY, a INTEGER)")
    ok(db, "INSERT INTO t VALUES (1, 0)")
    // rows 10, 11 insert (then are undone); the third row's PK dup aborts
    val e = err(db, "INSERT INTO t VALUES (10, 1), (11, 2), (10, 3)")
    assert(e == "UNIQUE constraint failed: t.id", e)
    assert(longOf(db, "SELECT COUNT(*) FROM t") == 1L, "statement undone")
    // SQLite (probed live, 3.40): last_insert_rowid() == 11 — the last row
    // successfully inserted before the failure, even though it was undone
    assert(lid(db, "INSERT INTO t(a) VALUES (9)") == 2L &&
      longOf(db, "SELECT COUNT(*) FROM t") == 2L)
  }

  test("DO UPDATE SET accepts expressions over excluded.*") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE t (id INTEGER NOT NULL PRIMARY KEY, a INTEGER)")
    ok(db, "INSERT INTO t VALUES (1, 5)")
    ok(db, "INSERT INTO t VALUES (1, 7) " +
      "ON CONFLICT(id) DO UPDATE SET a = excluded.a + 1")
    assert(longOf(db, "SELECT a FROM t WHERE id = 1") == 8L)
  }

  test("UPDATE trigger fires per MATCHED row (no-op SETs included), rowid order") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE t (id INTEGER NOT NULL PRIMARY KEY, a INTEGER)")
    ok(db, "CREATE TABLE log (lid INTEGER NOT NULL PRIMARY KEY, tag TEXT)")
    ok(db, "CREATE TRIGGER tu AFTER UPDATE ON t BEGIN " +
      "INSERT INTO log(tag) VALUES ('U:' || OLD.id); END")
    ok(db, "INSERT INTO t VALUES (5, 0), (1, 0), (9, 0)")
    ok(db, "UPDATE t SET a = 0") // writes identical values everywhere
    val tags = db.queryStringStmt("SELECT tag FROM log ORDER BY lid")
      .fold(e => fail(e), _.head.values)
      .map(_.head.asInstanceOf[Value.Text].v)
    assert(tags == Seq("U:1", "U:5", "U:9"),
      s"matched rows fire in rowid order even when values are unchanged: $tags")
  }

  test("no-op upsert DO UPDATE fires the UPDATE trigger") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE t (id INTEGER NOT NULL PRIMARY KEY, a INTEGER)")
    ok(db, "CREATE TABLE log (lid INTEGER NOT NULL PRIMARY KEY, tag TEXT)")
    ok(db, "CREATE TRIGGER tu AFTER UPDATE ON t BEGIN " +
      "INSERT INTO log(tag) VALUES ('U:' || OLD.id); END")
    ok(db, "INSERT INTO t VALUES (7, 1)")
    ok(db, "INSERT INTO t VALUES (7, 5) ON CONFLICT(id) DO UPDATE SET a = a")
    assert(longOf(db, "SELECT COUNT(*) FROM log") == 1L)
  }

  test("UPDATE uniqueness is LIVE-state, scan-order (transient collisions)") {
    // probed live on sqlite 3.40 (fuzz seed 5002): UPDATE checks UNIQUE
    // per row against already-updated NEW keys, not-yet-updated OLD keys
    // and unmatched keys — a final-state check accepts all of these
    def fresh(cap: Long, vals: (Long, Long)*): GraftDb = {
      val db = GraftDb.openInMemory(spark, cap)
      ok(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER UNIQUE)")
      vals.foreach { case (i, a) => ok(db, s"INSERT INTO t VALUES ($i, $a)") }
      db
    }
    Seq(500L, 1L).foreach { cap => // driver Mem AND spilled Big paths
      val inc = fresh(cap, (1L, 1L), (2L, 2L))
      assert(err(inc, "UPDATE t SET a = a + 1") ==
        "UNIQUE constraint failed: t.a", s"cap=$cap inc-asc must fail")
      assert(longOf(inc, "SELECT SUM(a) FROM t") == 3L, "undone")
      val desc = fresh(cap, (1L, 2L), (2L, 1L))
      ok(desc, "UPDATE t SET a = a + 1") // row1 2->3 first, then 1->2: fine
      assert(longOf(desc, "SELECT SUM(a) FROM t") == 5L)
      val swap = fresh(cap, (1L, 1L), (2L, 2L))
      assert(err(swap, "UPDATE t SET a = 3 - a") ==
        "UNIQUE constraint failed: t.a", s"cap=$cap swap must fail")
      val vsUnmatched = fresh(cap, (1L, 1L), (2L, 5L))
      assert(err(vsUnmatched, "UPDATE t SET a = 5 WHERE id = 1") ==
        "UNIQUE constraint failed: t.a")
      val noop = fresh(cap, (1L, 1L))
      ok(noop, "UPDATE t SET a = 1") // self-collision is not a collision
    }
  }

  test("fuzz seed 85: spilled-table mixed traffic stays executable") {
    val db = GraftDb.openInMemory(spark, 8) // tiny cap: spills immediately
    val ops = Seq(
      "CREATE TABLE t0 (id INTEGER NOT NULL PRIMARY KEY, a INTEGER, b TEXT, CHECK (a >= -5))",
      "CREATE TABLE log (lid INTEGER NOT NULL PRIMARY KEY, tag TEXT)",
      "CREATE TRIGGER trg AFTER UPDATE ON t0 BEGIN INSERT INTO log(tag) VALUES ('U:' || OLD.id || ':' || NEW.a); END",
      "CREATE INDEX idx_a ON t0(a)",
      "INSERT INTO t0(a, b) VALUES (2, 'ada')",
      "INSERT INTO t0(a, b) VALUES (-1, 'dee')",
      "INSERT INTO t0(a, b) VALUES (2, 'bo')",
      "INSERT INTO t0(a, b) VALUES (5, 'cy')",
      "INSERT INTO t0(a, b) VALUES (6, 'eli')",
      "INSERT INTO t0(a, b) VALUES (1, 'gus')",
      "INSERT INTO t0 VALUES (10, 8, 'dee') ON CONFLICT(id) DO UPDATE SET a = excluded.a + 1",
      "UPDATE t0 SET b = b || 'x' WHERE id = 11",
      "INSERT INTO t0(a, b) VALUES (-4, 'fi')",
      "INSERT INTO t0 VALUES (9, 0, 'cy')",
      "UPDATE t0 SET a = a + 2 WHERE b = 'ada'",
      "UPDATE t0 SET a = a + 1 WHERE id BETWEEN 5 AND 12",
      "INSERT INTO t0(a, b) VALUES (1, 'dee')",
      "INSERT OR REPLACE INTO t0 VALUES (5, 1, 'gus')",
      "DELETE FROM t0 WHERE a % 3 = 0",
      "INSERT INTO t0 VALUES (2, 8, 'dee'), (5, 4, 'fi')",
      "DELETE FROM t0 WHERE id BETWEEN 3 AND 6",
      "UPDATE t0 SET b = 'z' WHERE id = 1",
      "UPDATE t0 SET b = 'z' WHERE a % 2 = 0",
      "DELETE FROM t0 WHERE id BETWEEN 1 AND 7",
      "DELETE FROM t0 WHERE id = 4",
      "UPDATE t0 SET a = a + 1 WHERE a % 3 = 0",
      "UPDATE t0 SET a = a + 1 WHERE a % 2 = 0",
      // pre-fix: Catalyst "key not found: id#NL" on this statement
      "INSERT INTO t0 VALUES (3, 9, 'cy')")
    // legitimate SQLite-shaped constraint errors are fine (intermediate
    // state differs from the originally recorded fuzz path); INTERNAL
    // engine errors (unresolved attributes, Catalyst key-not-found) never
    ops.foreach { sql =>
      val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
      assert(!r.error.contains("key not found") &&
        !r.error.contains("UNRESOLVED") && !r.error.contains("#"),
        s"internal engine error for [$sql] -> ${r.error}")
    }
    assert(longOf(db, "SELECT COUNT(*) FROM t0") > 0L)
  }
}
