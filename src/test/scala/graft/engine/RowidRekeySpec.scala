package graft.engine

import graft.SparkSpec
import graft.command.Value

/** Rowid-alias rekeying goldens (probed live on SQLite 3.40): writing the
  * INTEGER PRIMARY KEY via UPDATE, UPDATE..FROM or upsert DO UPDATE moves
  * the ROWID with the column — observable through the next auto-assigned
  * rowid, which derives from the new maximum. The engine's one documented
  * boundary: rekeying with armed UPDATE row triggers rejects loudly (the
  * firing tape pairs rows by rowid, which a rekey breaks). Runs at both
  * caps so the Mem and Big stores pin the same behavior. */
class RowidRekeySpec extends SparkSpec {

  private def exec(db: GraftDb, sql: String): Long = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
    r.rowsAffected
  }

  private def q(db: GraftDb, sql: String): Seq[Seq[Any]] =
    db.queryStringStmt(sql).fold(e => fail(s"[$sql] $e"), identity).head
      .values.map(_.map {
        case Value.Integer(v) => v; case Value.Text(v) => v
        case Value.Null => null; case v => v
      })

  private def caps = Seq(500L, 1L)

  test("UPDATE / UPDATE..FROM / upsert rekey; next rowid follows the max") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER)")
      exec(db, "INSERT INTO t VALUES (1, 5), (2, 6)")
      exec(db, "UPDATE t SET id = 40 WHERE id = 2")
      exec(db, "INSERT INTO t(a) VALUES (7)")
      assert(q(db, "SELECT id, a FROM t ORDER BY id") ==
        Seq(Seq(1L, 5L), Seq(40L, 6L), Seq(41L, 7L)), s"cap=$cap")
      exec(db, "CREATE TABLE s (k INTEGER, v INTEGER)")
      exec(db, "INSERT INTO s VALUES (1, 90)")
      exec(db, "UPDATE t SET id = s.v FROM s WHERE t.id = s.k")
      exec(db, "INSERT INTO t(a) VALUES (8)")
      assert(q(db, "SELECT id FROM t ORDER BY id") ==
        Seq(Seq(40L), Seq(41L), Seq(90L), Seq(91L)), s"cap=$cap")
      exec(db, "CREATE TABLE u (id INTEGER PRIMARY KEY, a INTEGER UNIQUE)")
      exec(db, "INSERT INTO u VALUES (1, 1), (2, 2)")
      exec(db, "INSERT INTO u VALUES (2, 9) ON CONFLICT(id) DO UPDATE SET id = 70")
      exec(db, "INSERT INTO u(a) VALUES (5)")
      assert(q(db, "SELECT id, a FROM u ORDER BY id") ==
        Seq(Seq(1L, 1L), Seq(70L, 2L), Seq(71L, 5L)), s"cap=$cap")
    }
  }

  test("rekeying with armed UPDATE triggers rejects loudly, applies nothing") {
    val db = GraftDb.openInMemory(spark, 500)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER)")
    exec(db, "INSERT INTO t VALUES (1, 5)")
    exec(db, "CREATE TABLE log (i INTEGER PRIMARY KEY, m TEXT)")
    exec(db, "CREATE TRIGGER trg AFTER UPDATE ON t BEGIN " +
      "INSERT INTO log(m) VALUES ('u'); END")
    val r = db.executeStringStmt("UPDATE t SET id = 9 WHERE id = 1")
      .fold(e => fail(e), identity).head
    assert(r.error.startsWith(
      "UPDATE of the INTEGER PRIMARY KEY with UPDATE row triggers"), r.error)
    assert(q(db, "SELECT id FROM t") == Seq(Seq(1L)))
    // non-rekeying updates keep firing
    exec(db, "UPDATE t SET a = 6 WHERE id = 1")
    assert(q(db, "SELECT COUNT(*) FROM log") == Seq(Seq(1L)))
  }
}
