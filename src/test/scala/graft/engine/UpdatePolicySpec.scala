package graft.engine

import graft.SparkSpec
import graft.command.Value

/** UPDATE conflict-clause goldens (`UPDATE OR ABORT|FAIL|IGNORE|REPLACE|
  * ROLLBACK`, the SQLite surface the reference delegates to —
  * `db/src/db.rs:176,278`). Every expected value below was probed live on
  * SQLite 3.40:
  *  - the statement precollects WHERE-matched ROWIDs from the before
  *    state and processes them ascending against the CURRENT occupant —
  *    a rekeyed row moving onto a later matched rowid is processed again
  *    with its current values, with no WHERE re-check;
  *  - IGNORE skips conflicting rows (their old values stay visible to
  *    later checks), FAIL keeps the applied prefix AND reports the error,
  *    REPLACE deletes displaced rows (an earlier-applied row can be
  *    displaced — its update still counted/fired/RETURNed), substitutes
  *    declared defaults for NOT NULL NULLs, and aborts on CHECK;
  *  - FOREIGN KEY violations are never policy-resolved (statement aborts,
  *    prefix included; OR ROLLBACK on an FK leaves the tx open);
  *  - ROLLBACK additionally aborts the enclosing connection tx on a
  *    constraint (not FK) violation.
  * Runs at cap 500 (Mem store) AND cap 4 (tables seeded with 5 rows spill
  * to the Big store; matched sets stay within the documented driver cap —
  * inert filler rows sit outside the 10..99 key space). */
class UpdatePolicySpec extends SparkSpec {

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
        case Value.Real(v) => v; case Value.Null => null; case v => v
      })

  private def caps = Seq(500L, 4L)

  private def fresh(cap: Long): GraftDb = {
    val db = GraftDb.openInMemory(spark, cap)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER UNIQUE, b TEXT)")
    exec(db, "INSERT INTO t VALUES (1, 10, 'x'), (2, 20, 'y'), (3, 30, 'z'), " +
      "(8, 800, 'f'), (9, 900, 'g')")
    db
  }

  test("OR IGNORE skips conflicting rows sequentially; skipped keep old keys") {
    caps.foreach { cap =>
      val db = fresh(cap)
      // row1 →20 conflicts with row2's still-old 20; row2 →30 with row3;
      // row3 →40 applies. changes() counts applied rows only.
      assert(exec(db, "UPDATE OR IGNORE t SET a = a + 10 WHERE id <= 3") == 1L,
        s"cap=$cap")
      assert(q(db, "SELECT id, a FROM t WHERE id <= 3 ORDER BY id") ==
        Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 40L)), s"cap=$cap")
      // the plain sequential-freeing case still applies everything
      assert(exec(db, "UPDATE OR IGNORE t SET a = a - 10 WHERE id <= 3") == 3L,
        s"cap=$cap")
      assert(q(db, "SELECT a FROM t WHERE id <= 3 ORDER BY id") ==
        Seq(Seq(0L), Seq(10L), Seq(30L)), s"cap=$cap")
      // filler rows untouched
      assert(q(db, "SELECT a FROM t WHERE id > 3 ORDER BY id") ==
        Seq(Seq(800L), Seq(900L)), s"cap=$cap")
    }
  }

  test("OR REPLACE displaces conflicting rows; an applied row can be displaced") {
    caps.foreach { cap =>
      val db = fresh(cap)
      assert(exec(db, "UPDATE OR REPLACE t SET a = 20 WHERE id = 1") == 1L,
        s"cap=$cap")
      assert(q(db, "SELECT id, a, b FROM t WHERE id <= 3 ORDER BY id") ==
        Seq(Seq(1L, 20L, "x"), Seq(3L, 30L, "z")), s"cap=$cap")

      val db2 = fresh(cap)
      // row1 →20 displaces row2, applies; row3 →20 displaces the
      // UPDATED row1; changes() still counts row1's update (probed: 2)
      assert(exec(db2, "UPDATE OR REPLACE t SET a = 20 WHERE id <= 3") == 2L,
        s"cap=$cap")
      assert(q(db2, "SELECT id, a FROM t WHERE id <= 3 ORDER BY id") ==
        Seq(Seq(3L, 20L)), s"cap=$cap")

      val db3 = fresh(cap)
      assert(exec(db3, "UPDATE OR REPLACE t SET a = a + 10 WHERE id <= 3") == 2L,
        s"cap=$cap")
      assert(q(db3, "SELECT id, a FROM t WHERE id <= 3 ORDER BY id") ==
        Seq(Seq(1L, 20L), Seq(3L, 40L)), s"cap=$cap")
    }
  }

  test("OR FAIL keeps the applied prefix and reports the error") {
    caps.foreach { cap =>
      val db = fresh(cap)
      // row2 →5 applies; row3 →10 conflicts with row1 — error, row2 kept;
      // rows 8/9 (a = NULL under the CASE) are never reached
      assert(execErr(db, "UPDATE OR FAIL t SET a = CASE id WHEN 2 THEN 5 " +
        "WHEN 3 THEN 10 END WHERE id >= 2") ==
        "UNIQUE constraint failed: t.a", s"cap=$cap")
      assert(q(db, "SELECT id, a FROM t ORDER BY id") ==
        Seq(Seq(1L, 10L), Seq(2L, 5L), Seq(3L, 30L),
          Seq(8L, 800L), Seq(9L, 900L)), s"cap=$cap")
      // first row failing: nothing applied
      val db2 = fresh(cap)
      assert(execErr(db2, "UPDATE OR FAIL t SET a = a + 10 WHERE id <= 3") ==
        "UNIQUE constraint failed: t.a", s"cap=$cap")
      assert(q(db2, "SELECT a FROM t WHERE id <= 3 ORDER BY id") ==
        Seq(Seq(10L), Seq(20L), Seq(30L)), s"cap=$cap")
    }
  }

  test("OR ROLLBACK aborts the enclosing tx on constraint (not FK) failure") {
    caps.foreach { cap =>
      // outside any tx: behaves like ABORT
      val db = fresh(cap)
      assert(execErr(db, "UPDATE OR ROLLBACK t SET a = 20 WHERE id = 1") ==
        "UNIQUE constraint failed: t.a", s"cap=$cap")
      assert(q(db, "SELECT a FROM t WHERE id <= 3 ORDER BY id") ==
        Seq(Seq(10L), Seq(20L), Seq(30L)), s"cap=$cap")
      // inside BEGIN: the whole tx rolls back and closes
      exec(db, "BEGIN")
      exec(db, "INSERT INTO t VALUES (4, 40, 'w')")
      assert(execErr(db, "UPDATE OR ROLLBACK t SET a = 20 WHERE id = 1") ==
        "UNIQUE constraint failed: t.a", s"cap=$cap")
      assert(execErr(db, "COMMIT") ==
        "cannot commit - no transaction is active", s"cap=$cap")
      assert(q(db, "SELECT count(*) FROM t") == Seq(Seq(5L)), s"cap=$cap")
      // FK violations are not subject to conflict resolution: tx survives
      val db2 = GraftDb.openInMemory(spark, cap)
      exec(db2, "PRAGMA foreign_keys = ON")
      exec(db2, "CREATE TABLE p (id INTEGER PRIMARY KEY)")
      exec(db2, "INSERT INTO p VALUES (1)")
      exec(db2, "CREATE TABLE ch (id INTEGER PRIMARY KEY, pid INTEGER REFERENCES p(id))")
      exec(db2, "INSERT INTO ch VALUES (1, 1)")
      exec(db2, "BEGIN")
      exec(db2, "INSERT INTO p VALUES (5)")
      assert(execErr(db2, "UPDATE OR ROLLBACK ch SET pid = 99 WHERE id = 1") ==
        "FOREIGN KEY constraint failed", s"cap=$cap")
      exec(db2, "COMMIT")
      assert(q(db2, "SELECT id FROM p ORDER BY id") ==
        Seq(Seq(1L), Seq(5L)), s"cap=$cap")
    }
  }

  test("CHECK and NOT NULL under the policies") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "CREATE TABLE u (id INTEGER PRIMARY KEY, a INTEGER CHECK (a < 1000))")
      exec(db, "INSERT INTO u VALUES (1, 950), (2, 990), (3, 1), (4, 2), (5, 3)")
      // row1 →970 passes; row2 →1010 fails the CHECK and is skipped
      assert(exec(db, "UPDATE OR IGNORE u SET a = a + 20 WHERE id <= 2") == 1L,
        s"cap=$cap")
      assert(q(db, "SELECT a FROM u WHERE id <= 2 ORDER BY id") ==
        Seq(Seq(970L), Seq(990L)), s"cap=$cap")
      // REPLACE treats CHECK like ABORT
      assert(execErr(db, "UPDATE OR REPLACE u SET a = 2000 WHERE id = 1")
        .startsWith("CHECK constraint failed"), s"cap=$cap")
      assert(q(db, "SELECT a FROM u WHERE id = 1") == Seq(Seq(970L)), s"cap=$cap")

      val db2 = GraftDb.openInMemory(spark, cap)
      exec(db2, "CREATE TABLE v (id INTEGER PRIMARY KEY, a INTEGER NOT NULL)")
      exec(db2, "INSERT INTO v VALUES (1, 5), (2, 6), (3, 7), (4, 8), (5, 9)")
      assert(exec(db2, "UPDATE OR IGNORE v SET a = " +
        "CASE WHEN id = 1 THEN NULL ELSE 70 END WHERE id <= 2") == 1L,
        s"cap=$cap")
      assert(q(db2, "SELECT a FROM v WHERE id <= 2 ORDER BY id") ==
        Seq(Seq(5L), Seq(70L)), s"cap=$cap")
      // REPLACE substitutes the declared default (expressions evaluate),
      // and aborts when the column has none
      val db3 = GraftDb.openInMemory(spark, cap)
      exec(db3, "CREATE TABLE w (id INTEGER PRIMARY KEY, " +
        "a INTEGER NOT NULL DEFAULT (3*4), b INTEGER NOT NULL)")
      exec(db3, "INSERT INTO w VALUES (1, 5, 6), (2, 1, 1), (3, 2, 2), " +
        "(4, 3, 3), (5, 4, 4)")
      assert(exec(db3, "UPDATE OR REPLACE w SET a = NULL WHERE id = 1") == 1L,
        s"cap=$cap")
      assert(q(db3, "SELECT a, b FROM w WHERE id = 1") == Seq(Seq(12L, 6L)),
        s"cap=$cap")
      assert(execErr(db3, "UPDATE OR REPLACE w SET b = NULL WHERE id = 1") ==
        "NOT NULL constraint failed: w.b", s"cap=$cap")
    }
  }

  test("FOREIGN KEY violations are never policy-resolved") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "PRAGMA foreign_keys = ON")
      exec(db, "CREATE TABLE p (id INTEGER PRIMARY KEY, u INTEGER UNIQUE)")
      exec(db, "INSERT INTO p VALUES (1, 10), (2, 20), (8, 800), (9, 900), (10, 1000)")
      exec(db, "CREATE TABLE ch (id INTEGER PRIMARY KEY, pid INTEGER REFERENCES p(id))")
      exec(db, "INSERT INTO ch VALUES (1, 1), (2, 2), (8, 1), (9, 2), (10, 1)")
      // IGNORE: the dangling row is NOT skipped — the statement aborts
      assert(execErr(db, "UPDATE OR IGNORE ch SET pid = pid + 90 WHERE id <= 2") ==
        "FOREIGN KEY constraint failed", s"cap=$cap")
      assert(q(db, "SELECT pid FROM ch WHERE id <= 2 ORDER BY id") ==
        Seq(Seq(1L), Seq(2L)), s"cap=$cap")
      // FAIL: the prefix is NOT kept on an FK abort (probed live)
      assert(execErr(db, "UPDATE OR FAIL ch SET pid = " +
        "CASE id WHEN 1 THEN 2 WHEN 2 THEN 99 END WHERE id <= 2") ==
        "FOREIGN KEY constraint failed", s"cap=$cap")
      assert(q(db, "SELECT pid FROM ch WHERE id <= 2 ORDER BY id") ==
        Seq(Seq(1L), Seq(2L)), s"cap=$cap")
      // REPLACE displacement deleting a referenced parent row aborts
      assert(execErr(db, "UPDATE OR REPLACE p SET u = 20 WHERE id = 1") ==
        "FOREIGN KEY constraint failed", s"cap=$cap")
      assert(q(db, "SELECT id, u FROM p WHERE id <= 2 ORDER BY id") ==
        Seq(Seq(1L, 10L), Seq(2L, 20L)), s"cap=$cap")

      // OR REPLACE loses referenced keys two ways with different
      // semantics (probed live; fuzz seed 101128):
      val db2 = GraftDb.openInMemory(spark, cap)
      exec(db2, "PRAGMA foreign_keys = ON")
      exec(db2, "CREATE TABLE p (id INTEGER PRIMARY KEY, u INTEGER UNIQUE)")
      exec(db2, "INSERT INTO p VALUES (1, 10), (2, 20), (8, 800), (9, 900), (10, 1000)")
      exec(db2, "CREATE TABLE ch (id INTEGER PRIMARY KEY, " +
        "pid INTEGER REFERENCES p(id) ON DELETE CASCADE)")
      exec(db2, "INSERT INTO ch VALUES (1, 2)")
      // (a) a DISPLACED row is a true delete: ON DELETE CASCADE runs
      assert(exec(db2, "UPDATE OR REPLACE p SET u = 20 WHERE id = 1") == 1L,
        s"cap=$cap")
      assert(q(db2, "SELECT count(*) FROM ch") == Seq(Seq(0L)), s"cap=$cap")
      // (b) a REWRITTEN-away key is governed by ON UPDATE: fails for
      // every child, CASCADE included
      exec(db2, "INSERT INTO ch VALUES (2, 1)")
      assert(execErr(db2, "UPDATE OR REPLACE p SET id = id + 2, " +
        "u = u + 2 WHERE id <= 2") == "FOREIGN KEY constraint failed",
        s"cap=$cap")
      assert(q(db2, "SELECT id FROM p WHERE id <= 2 ORDER BY id") ==
        Seq(Seq(1L)), s"cap=$cap")
      // (c) a rewrite-lost key with NO referencing child just applies
      exec(db2, "DELETE FROM ch")
      assert(exec(db2, "UPDATE OR REPLACE p SET id = id + 30, u = u + 1 " +
        "WHERE id = 1") == 1L, s"cap=$cap")
    }
  }

  test("rowid rekey chains: moved rows re-process against current values") {
    caps.foreach { cap =>
      def seed(): GraftDb = {
        val db = GraftDb.openInMemory(spark, cap)
        exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER)")
        exec(db, "INSERT INTO t VALUES (1, 10), (2, 20), (3, 30), " +
          "(8, 80), (9, 90)")
        db
      }
      // IGNORE: each move-up conflicts with the next still-present row
      val db = seed()
      assert(exec(db, "UPDATE OR IGNORE t SET id = id + 1 WHERE id <= 3") == 1L,
        s"cap=$cap")
      assert(q(db, "SELECT id, a FROM t ORDER BY id") ==
        Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(4L, 30L),
          Seq(8L, 80L), Seq(9L, 90L)), s"cap=$cap")

      // REPLACE: row1 displaces row2 and lands on matched rowid 2, gets
      // re-processed there, displaces row3, re-processes at 3 → (4, 10);
      // changes() counted every application (probed: 3)
      val db2 = seed()
      assert(exec(db2, "UPDATE OR REPLACE t SET id = id + 1 WHERE id <= 3") == 3L,
        s"cap=$cap")
      assert(q(db2, "SELECT id, a FROM t ORDER BY id") ==
        Seq(Seq(4L, 10L), Seq(8L, 80L), Seq(9L, 90L)), s"cap=$cap")

      // the WHERE is NOT re-checked on re-visit: the moved row (a=110)
      // no longer satisfies a<=20 yet still updates (probed: (3, 210))
      val db3 = seed()
      assert(exec(db3, "UPDATE OR REPLACE t SET id = id + 1, a = a + 100 " +
        "WHERE a <= 20") == 2L, s"cap=$cap")
      assert(q(db3, "SELECT id, a FROM t ORDER BY id") ==
        Seq(Seq(3L, 210L), Seq(8L, 80L), Seq(9L, 90L)), s"cap=$cap")

      // a re-evaluated key can collide with a row OUTSIDE the precomputed
      // candidate set: (1,10),(2,20),(3,15),(4,12) with id+1, a+1 —
      // row2's re-visit computes a=12, displacing untracked row4
      // (probed live: affected 2, final (3,12),(100,16))
      val db4 = GraftDb.openInMemory(spark, cap)
      exec(db4, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER UNIQUE)")
      exec(db4, "INSERT INTO t VALUES (1, 10), (2, 20), (3, 15), (4, 12), " +
        "(100, 16)")
      assert(exec(db4, "UPDATE OR REPLACE t SET id = id + 1, a = a + 1 " +
        "WHERE id <= 2") == 2L, s"cap=$cap")
      assert(q(db4, "SELECT id, a FROM t ORDER BY id") ==
        Seq(Seq(3L, 12L), Seq(100L, 16L)), s"cap=$cap")
    }
  }

  test("triggers fire for applied rows only, in processing order") {
    caps.foreach { cap =>
      val db = fresh(cap)
      exec(db, "CREATE TABLE log (i INTEGER PRIMARY KEY, ev TEXT, v INTEGER)")
      exec(db, "CREATE TRIGGER tu AFTER UPDATE ON t BEGIN " +
        "INSERT INTO log(ev, v) VALUES ('U', NEW.id); END")
      exec(db, "CREATE TRIGGER td AFTER DELETE ON t BEGIN " +
        "INSERT INTO log(ev, v) VALUES ('D', OLD.id); END")
      // IGNORE: only the applied row fires
      assert(exec(db, "UPDATE OR IGNORE t SET a = a + 10 WHERE id <= 3") == 1L,
        s"cap=$cap")
      assert(q(db, "SELECT ev, v FROM log ORDER BY i") ==
        Seq(Seq("U", 3L)), s"cap=$cap")
      exec(db, "DELETE FROM log")
      // REPLACE displacement fires no DELETE trigger (recursive OFF)
      assert(exec(db, "UPDATE OR REPLACE t SET a = 20 WHERE id = 1") == 1L,
        s"cap=$cap")
      assert(q(db, "SELECT ev, v FROM log ORDER BY i") ==
        Seq(Seq("U", 1L)), s"cap=$cap")
      exec(db, "DELETE FROM log")
      // FAIL: the applied prefix fired before the error; both persist
      // (t is (1,20),(3,40) here — row1 →99 applies+fires, row3 →99
      // conflicts with row1's NEW key; probed live on this sequence)
      val err = execErr(db, "UPDATE OR FAIL t SET a = CASE id " +
        "WHEN 1 THEN 99 WHEN 3 THEN 99 END WHERE id IN (1, 3)")
      assert(err == "UNIQUE constraint failed: t.a", s"cap=$cap")
      assert(q(db, "SELECT ev, v FROM log ORDER BY i") ==
        Seq(Seq("U", 1L)), s"cap=$cap")
      assert(q(db, "SELECT id, a FROM t WHERE id <= 3 ORDER BY id") ==
        Seq(Seq(1L, 99L), Seq(3L, 40L)), s"cap=$cap")
    }
  }

  test("RETURNING reports applied rows in processing order") {
    caps.foreach { cap =>
      val db = fresh(cap)
      assert(q(db, "UPDATE OR IGNORE t SET a = a + 10 WHERE id <= 3 " +
        "RETURNING id, a") == Seq(Seq(3L, 40L)), s"cap=$cap")
      val db2 = fresh(cap)
      // the displaced-after-apply row still appears (probed)
      assert(q(db2, "UPDATE OR REPLACE t SET a = 20 WHERE id <= 3 " +
        "RETURNING id, a") == Seq(Seq(1L, 20L), Seq(3L, 20L)), s"cap=$cap")
    }
  }

  test("OR ABORT parses; sequential policies with FROM reject loudly") {
    caps.foreach { cap =>
      val db = fresh(cap)
      assert(execErr(db, "UPDATE OR ABORT t SET a = 20 WHERE id = 1") ==
        "UNIQUE constraint failed: t.a", s"cap=$cap")
      assert(exec(db, "UPDATE OR ABORT t SET a = 11 WHERE id = 1") == 1L,
        s"cap=$cap")
      exec(db, "CREATE TABLE s (k INTEGER, v INTEGER)")
      exec(db, "INSERT INTO s VALUES (1, 77)")
      assert(execErr(db, "UPDATE OR IGNORE t SET a = s.v FROM s WHERE t.id = s.k")
        .contains("not supported"), s"cap=$cap")
      // a policy over a table where nothing can conflict takes the plain
      // set-based path: no driver materialization, no cap — a 5-row
      // no-WHERE statement exceeds cap 4 and still just applies
      exec(db, "CREATE TABLE nc (x INTEGER, y TEXT)")
      exec(db, "INSERT INTO nc VALUES (1, 'a'), (2, 'b'), (3, 'c'), " +
        "(4, 'd'), (5, 'e')")
      assert(exec(db, "UPDATE OR IGNORE nc SET x = 77") == 5L, s"cap=$cap")
    }
  }
}
