package graft.engine

import graft.SparkSpec
import graft.command.Value

/** INSERT OR FAIL / OR ROLLBACK goldens (completing the SQLite conflict-
  * clause surface next to OR IGNORE / OR REPLACE / upserts — previously
  * both folded to ABORT). Probed live on SQLite 3.40:
  *  - OR FAIL keeps the rows inserted BEFORE the first failing candidate
  *    and still reports the constraint error; last_insert_rowid reflects
  *    the last kept row; prefix rows fire their INSERT triggers;
  *  - FOREIGN KEY violations are never policy-resolved: full statement
  *    undo under FAIL, and ROLLBACK leaves the enclosing tx open;
  *  - OR ROLLBACK aborts the enclosing connection tx on a constraint
  *    (not FK) failure, exactly like UPDATE OR ROLLBACK.
  * Runs at cap 500 (Mem store) and cap 4 (5-row tables spill to Big). */
class InsertPolicySpec extends SparkSpec {

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

  private def fresh(cap: Long): GraftDb = {
    val db = GraftDb.openInMemory(spark, cap)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER UNIQUE)")
    exec(db, "INSERT INTO t VALUES (1, 10), (2, 20), (8, 800), (9, 900), " +
      "(10, 1000)")
    db
  }

  test("OR FAIL keeps the prefix before the first failing candidate") {
    caps.foreach { cap =>
      val db = fresh(cap)
      assert(execErr(db, "INSERT OR FAIL INTO t VALUES (5, 50), (6, 20), " +
        "(7, 70)") == "UNIQUE constraint failed: t.a", s"cap=$cap")
      assert(q(db, "SELECT id, a FROM t WHERE id BETWEEN 3 AND 7 ORDER BY id")
        == Seq(Seq(5L, 50L)), s"cap=$cap")
      // last_insert_rowid reflects the last KEPT row
      exec(db, "INSERT INTO t(a) VALUES (11)")
      assert(q(db, "SELECT max(id) FROM t") == Seq(Seq(11L)), s"cap=$cap")
      // intra-batch PK dup: the LATER duplicate fails, the first lands
      val db2 = fresh(cap)
      assert(execErr(db2, "INSERT OR FAIL INTO t VALUES (5, 51), (5, 52), " +
        "(6, 53)") == "UNIQUE constraint failed: t.id", s"cap=$cap")
      assert(q(db2, "SELECT id, a FROM t WHERE id = 5") == Seq(Seq(5L, 51L)),
        s"cap=$cap")
      // NOT NULL mid-batch
      val db3 = GraftDb.openInMemory(spark, cap)
      exec(db3, "CREATE TABLE u (id INTEGER PRIMARY KEY, a INTEGER NOT NULL)")
      assert(execErr(db3, "INSERT OR FAIL INTO u(a) VALUES (1), (NULL), (3)") ==
        "NOT NULL constraint failed: u.a", s"cap=$cap")
      assert(q(db3, "SELECT id, a FROM u ORDER BY id") == Seq(Seq(1L, 1L)),
        s"cap=$cap")
      // no conflict: plain success
      val db4 = fresh(cap)
      assert(exec(db4, "INSERT OR FAIL INTO t VALUES (5, 50), (6, 60)") == 2L,
        s"cap=$cap")
    }
  }

  test("OR FAIL prefix fires its INSERT triggers; the error still surfaces") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "CREATE TABLE u (id INTEGER PRIMARY KEY, a INTEGER CHECK (a < 100))")
      exec(db, "CREATE TABLE log (i INTEGER PRIMARY KEY, v INTEGER)")
      exec(db, "CREATE TRIGGER ti AFTER INSERT ON u BEGIN " +
        "INSERT INTO log(v) VALUES (NEW.id); END")
      assert(execErr(db, "INSERT OR FAIL INTO u VALUES (1, 5), (2, 500), " +
        "(3, 6)").startsWith("CHECK constraint failed"), s"cap=$cap")
      assert(q(db, "SELECT id, a FROM u") == Seq(Seq(1L, 5L)), s"cap=$cap")
      assert(q(db, "SELECT v FROM log ORDER BY i") == Seq(Seq(1L)), s"cap=$cap")
    }
  }

  test("FK violations abort wholesale under FAIL; ROLLBACK leaves the tx open") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "PRAGMA foreign_keys = ON")
      exec(db, "CREATE TABLE p (id INTEGER PRIMARY KEY)")
      exec(db, "INSERT INTO p VALUES (1)")
      exec(db, "CREATE TABLE ch (id INTEGER PRIMARY KEY, pid INTEGER REFERENCES p(id))")
      assert(execErr(db, "INSERT OR FAIL INTO ch VALUES (1, 1), (2, 99), " +
        "(3, 1)") == "FOREIGN KEY constraint failed", s"cap=$cap")
      assert(q(db, "SELECT count(*) FROM ch") == Seq(Seq(0L)), s"cap=$cap")
      exec(db, "BEGIN")
      exec(db, "INSERT INTO p VALUES (7)")
      assert(execErr(db, "INSERT OR ROLLBACK INTO ch VALUES (1, 99)") ==
        "FOREIGN KEY constraint failed", s"cap=$cap")
      exec(db, "COMMIT") // FK is not policy-resolved: the tx survived
      assert(q(db, "SELECT id FROM p ORDER BY id") ==
        Seq(Seq(1L), Seq(7L)), s"cap=$cap")
    }
  }

  test("OR ROLLBACK aborts the enclosing tx on a constraint failure") {
    caps.foreach { cap =>
      val db = fresh(cap)
      exec(db, "BEGIN")
      exec(db, "INSERT INTO t VALUES (5, 50)")
      assert(execErr(db, "INSERT OR ROLLBACK INTO t VALUES (6, 20)") ==
        "UNIQUE constraint failed: t.a", s"cap=$cap")
      assert(execErr(db, "COMMIT") ==
        "cannot commit - no transaction is active", s"cap=$cap")
      assert(q(db, "SELECT count(*) FROM t") == Seq(Seq(5L)), s"cap=$cap")
      // outside a tx: plain abort
      assert(execErr(db, "INSERT OR ROLLBACK INTO t VALUES (6, 20)") ==
        "UNIQUE constraint failed: t.a", s"cap=$cap")
      assert(q(db, "SELECT count(*) FROM t") == Seq(Seq(5L)), s"cap=$cap")
    }
  }
}
