package graft.engine

import graft.SparkSpec
import graft.command.{Request, Statement}

/** UPDATE ... FROM goldens (SQLite 3.33+ surface; the reference reaches it
  * through its delegated SQLite handle, db/src/db.rs:176,278). Every
  * outcome below was probed live on SQLite 3.40:
  *  - changes() counts DISTINCT matched target rows (a target row matched
  *    by several join rows updates, fires, and RETURNs exactly once);
  *  - the winning join row for a multi-match is last-in-scan-order — for
  *    a plain-table source the greatest source rowid (stable under source
  *    indexes: equal-key index entries keep rowid order);
  *  - matched-but-unchanged rows still fire AFTER UPDATE triggers and
  *    appear in RETURNING (NEW images, target-rowid order);
  *  - no WHERE = cross join (any non-empty source matches every row);
  *    an empty source matches nothing;
  *  - constraint failures carry plain-UPDATE semantics and texts.
  * Each scenario runs at cap 500 (driver Mem store) AND cap 1 (spilled
  * Big store) so both mutation paths pin the same semantics. */
class UpdateFromSpec extends SparkSpec {

  private def fresh(cap: Long): GraftDb = {
    val db = GraftDb.openInMemory(spark, cap)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER, b TEXT)")
    exec(db, "INSERT INTO t VALUES (1, 10, 'x'), (2, 20, 'y'), (3, 30, 'z')")
    exec(db, "CREATE TABLE s (k INTEGER, v INTEGER)")
    exec(db, "INSERT INTO s VALUES (1, 100), (2, 200), (1, 111)")
    db
  }

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
        case graft.command.Value.Integer(v) => v
        case graft.command.Value.Text(v) => v
        case graft.command.Value.Null => null
        case v => v
      })

  private def caps = Seq(500L, 1L)

  test("plain-table source: distinct-match count, max-src-rowid winner") {
    caps.foreach { cap =>
      val db = fresh(cap)
      // t.id=1 matches s rows (1,100) and (1,111): last-scanned (rowid 3,
      // v=111) wins; changes() = 2 distinct target rows (probed live)
      val n = exec(db, "UPDATE t SET a = s.v FROM s WHERE t.id = s.k")
      assert(n == 2, s"cap=$cap rows_affected=$n")
      assert(q(db, "SELECT id, a FROM t ORDER BY id") ==
        Seq(Seq(1L, 111L), Seq(2L, 200L), Seq(3L, 30L)), s"cap=$cap")
    }
  }

  test("RETURNING: one row per matched target, winning NEW images, rowid order") {
    val db = fresh(500)
    val rows = db.queryStringStmt(
      "UPDATE t SET a = s.v FROM s WHERE t.id = s.k RETURNING id, a")
      .fold(e => fail(e), identity).head.values.map(_.map {
        case graft.command.Value.Integer(v) => v; case v => v
      })
    assert(rows == Seq(Seq(1L, 111L), Seq(2L, 200L)), s"got $rows")
  }

  test("triggers: fire once per distinct matched row, no-op SETs included") {
    val db = fresh(500)
    exec(db, "CREATE TABLE log (id INTEGER PRIMARY KEY, m TEXT)")
    exec(db, "CREATE TRIGGER trg AFTER UPDATE ON t BEGIN " +
      "INSERT INTO log(m) VALUES ('u:' || NEW.id || ':' || OLD.a || '->' || NEW.a); END")
    exec(db, "UPDATE t SET a = s.v FROM s WHERE t.id = s.k")
    assert(q(db, "SELECT m FROM log ORDER BY id") ==
      Seq(Seq("u:1:10->111"), Seq("u:2:20->200")))
    exec(db, "DELETE FROM log")
    // matched no-op writes still fire (probed live)
    val n = exec(db, "UPDATE t SET a = a FROM s WHERE t.id = s.k")
    assert(n == 2)
    assert(q(db, "SELECT m FROM log ORDER BY id") ==
      Seq(Seq("u:1:111->111"), Seq("u:2:200->200")))
  }

  test("spilled store: single-match capture works; driver caps stay loud") {
    val db = fresh(1) // Big store from row 2 on
    // single-row capture fits the cap on the Big path
    val rows = db.queryStringStmt(
      "UPDATE t SET a = s.v FROM s WHERE t.id = s.k AND t.id = 2 RETURNING id, a")
      .fold(e => fail(e), identity).head.values.map(_.map {
        case graft.command.Value.Integer(v) => v; case v => v
      })
    assert(rows == Seq(Seq(2L, 200L)), s"got $rows")
    // a 2-row RETURNING capture at cap 1 fails loudly, applying nothing
    val e = db.queryStringStmt(
      "UPDATE t SET a = 0 FROM s WHERE t.id = s.k RETURNING id")
      .fold(identity, r => fail(s"expected cap error, got $r"))
    assert(e.startsWith("too many rows for RETURNING processing on t"), e)
    assert(q(db, "SELECT id, a FROM t ORDER BY id") ==
      Seq(Seq(1L, 10L), Seq(2L, 200L), Seq(3L, 30L)), "capped stmt must not apply")
    // same boundary for row triggers (the documented deviation class)
    exec(db, "CREATE TABLE log (id INTEGER PRIMARY KEY, m TEXT)")
    exec(db, "CREATE TRIGGER trg AFTER UPDATE ON t BEGIN " +
      "INSERT INTO log(m) VALUES ('u:' || NEW.id); END")
    val e2 = execErr(db, "UPDATE t SET a = -5 FROM s WHERE t.id = s.k")
    assert(e2.startsWith("too many rows for row-trigger processing on t"), e2)
    assert(q(db, "SELECT COUNT(*) FROM log") == Seq(Seq(0L)))
    assert(q(db, "SELECT id, a FROM t ORDER BY id") ==
      Seq(Seq(1L, 10L), Seq(2L, 200L), Seq(3L, 30L)), "trigger-capped stmt must undo")
  }

  test("no WHERE = cross join; empty source matches nothing") {
    caps.foreach { cap =>
      val db = fresh(cap)
      assert(exec(db, "UPDATE t SET a = -1 FROM s") == 3, s"cap=$cap")
      assert(q(db, "SELECT DISTINCT a FROM t") == Seq(Seq(-1L)), s"cap=$cap")
      exec(db, "DELETE FROM s")
      assert(exec(db, "UPDATE t SET a = 0 FROM s") == 0, s"cap=$cap")
      assert(q(db, "SELECT DISTINCT a FROM t") == Seq(Seq(-1L)), s"cap=$cap")
    }
  }

  test("subquery and view sources resolve; aliases scope the join") {
    caps.foreach { cap =>
      val db = fresh(cap)
      val n = exec(db, "UPDATE t SET a = q.m FROM " +
        "(SELECT k, MAX(v) AS m FROM s GROUP BY k) AS q WHERE t.id = q.k")
      assert(n == 2, s"cap=$cap")
      assert(q(db, "SELECT id, a FROM t ORDER BY id") ==
        Seq(Seq(1L, 111L), Seq(2L, 200L), Seq(3L, 30L)), s"cap=$cap")
      exec(db, "CREATE VIEW sv AS SELECT k, v FROM s WHERE v > 150")
      val n2 = exec(db, "UPDATE t SET b = 'big:' || sv.v FROM sv WHERE t.id = sv.k")
      assert(n2 == 1, s"cap=$cap")
      assert(q(db, "SELECT b FROM t WHERE id = 2") == Seq(Seq("big:200")),
        s"cap=$cap")
    }
  }

  test("self-join with target alias (probed live: shifted-by-one update)") {
    caps.foreach { cap =>
      val db = fresh(cap)
      if (cap > 1) {
        val rows = db.queryStringStmt(
          "UPDATE t AS tgt SET a = src.a + 1 FROM t AS src " +
            "WHERE tgt.id = src.id + 1 RETURNING id, a")
          .fold(e => fail(e), identity).head.values.map(_.map {
            case graft.command.Value.Integer(v) => v; case v => v
          })
        assert(rows == Seq(Seq(2L, 11L), Seq(3L, 21L)), s"cap=$cap got $rows")
      } else assert(exec(db, "UPDATE t AS tgt SET a = src.a + 1 FROM t AS src " +
        "WHERE tgt.id = src.id + 1") == 2, s"cap=$cap")
      // the source reads the BEFORE state throughout (no cascade)
      assert(q(db, "SELECT id, a FROM t ORDER BY id") ==
        Seq(Seq(1L, 10L), Seq(2L, 11L), Seq(3L, 21L)), s"cap=$cap")
    }
  }

  test("constraints: UNIQUE failure text, statement atomicity") {
    caps.foreach { cap =>
      val db = fresh(cap)
      exec(db, "CREATE TABLE u (id INTEGER PRIMARY KEY, a INTEGER UNIQUE)")
      exec(db, "INSERT INTO u VALUES (1, 1), (2, 2)")
      val e = execErr(db,
        "UPDATE u SET a = s2.v FROM (SELECT 1 AS k, 2 AS v) AS s2 WHERE u.id = s2.k")
      assert(e == "UNIQUE constraint failed: u.a", s"cap=$cap got [$e]")
      assert(q(db, "SELECT id, a FROM u ORDER BY id") ==
        Seq(Seq(1L, 1L), Seq(2L, 2L)), s"cap=$cap: must not apply")
    }
  }

  test("tx batch + journal: FROM updates replay like any DML") {
    val dir = java.nio.file.Files.createTempDirectory("graft-updfrom-")
    val db = GraftDb.open(spark, dir.resolve("db").toString, 500)
      .fold(e => fail(e), identity)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER)")
    exec(db, "INSERT INTO t VALUES (1, 10), (2, 20)")
    exec(db, "CREATE TABLE s (k INTEGER, v INTEGER)")
    exec(db, "INSERT INTO s VALUES (2, 99)")
    val r = db.execute(Request(transaction = true, Seq(
      Statement("UPDATE t SET a = s.v FROM s WHERE t.id = s.k"))))
      .fold(e => fail(e), identity)
    assert(r.head.error.isEmpty && r.head.rowsAffected == 1)
    db.close()
    val db2 = GraftDb.open(spark, dir.resolve("db").toString, 500)
      .fold(e => fail(e), identity)
    assert(q(db2, "SELECT a FROM t ORDER BY id") == Seq(Seq(10L), Seq(99L)),
      "journal replay must reproduce the FROM update")
    db2.close()
  }
}
