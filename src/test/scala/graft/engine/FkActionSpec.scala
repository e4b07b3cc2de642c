package graft.engine

import graft.SparkSpec
import graft.command.Value

/** FK ON DELETE action goldens (SQLite foreign_key_actions surface).
  * Every outcome probed live on SQLite 3.40:
  *  - CASCADE deletes referencing child rows (recursing through further
  *    cascades), SET NULL / SET DEFAULT rewrite the referencing column;
  *  - child-table actions run in REVERSE creation order, per doomed
  *    parent row; cascaded child triggers fire BEFORE the parent's own
  *    AFTER DELETE trigger; changes() counts only the parent rows;
  *  - REPLACE displacement is a delete: actions run for lost keys, a
  *    plain (NO ACTION) child fails the statement, a displaced key
  *    re-inserted under the same value is NOT lost, and
  *    last_insert_rowid still advances on the failed statement;
  *  - rewriting a referenced key via UPDATE or upsert DO UPDATE fails
  *    for every child — the governing action there is ON UPDATE, which
  *    this engine accepts only as NO ACTION/RESTRICT (others reject at
  *    CREATE with a loud engine error);
  *  - everything is inert while PRAGMA foreign_keys is OFF (the default).
  * Runs at cap 500 (Mem) and cap 1 (spilled Big) like the other specs. */
class FkActionSpec extends SparkSpec {

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
        case Value.Integer(v) => v
        case Value.Text(v) => v
        case Value.Null => null
        case v => v
      })

  private def caps = Seq(500L, 1L)

  test("CASCADE deletes children and recurses to grandchildren") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "PRAGMA foreign_keys=ON")
      exec(db, "CREATE TABLE p (id INTEGER PRIMARY KEY, n TEXT)")
      exec(db, "CREATE TABLE ch (id INTEGER PRIMARY KEY, " +
        "pid INTEGER REFERENCES p(id) ON DELETE CASCADE, v INTEGER)")
      exec(db, "CREATE TABLE gc (id INTEGER PRIMARY KEY, " +
        "cid INTEGER REFERENCES ch(id) ON DELETE CASCADE)")
      exec(db, "CREATE TABLE sn (id INTEGER PRIMARY KEY, " +
        "pid INTEGER REFERENCES p(id) ON DELETE SET NULL)")
      exec(db, "INSERT INTO p VALUES (1,'a'), (2,'b')")
      // at cap 1 every multi-row driver materialization trips the loud
      // boundary (that's the cap working); keep one cascaded row per step
      if (cap > 1) exec(db, "INSERT INTO ch VALUES (10,1,5), (11,1,6), (12,2,7)")
      else exec(db, "INSERT INTO ch VALUES (10,1,5), (12,2,7)")
      exec(db, "INSERT INTO gc VALUES (100,10), (101,12)")
      exec(db, "INSERT INTO sn VALUES (20,1), (21,2)")
      val n = exec(db, "DELETE FROM p WHERE id = 1")
      assert(n == 1, s"cap=$cap: changes() counts parent rows only, got $n")
      assert(q(db, "SELECT * FROM ch") == Seq(Seq(12L, 2L, 7L)), s"cap=$cap")
      assert(q(db, "SELECT * FROM gc") == Seq(Seq(101L, 12L)), s"cap=$cap")
      assert(q(db, "SELECT id, pid FROM sn ORDER BY id") ==
        Seq(Seq(20L, null), Seq(21L, 2L)), s"cap=$cap")
    }
  }

  test("trigger tape: reverse-creation child order, child before parent") {
    val db = GraftDb.openInMemory(spark, 500)
    exec(db, "PRAGMA foreign_keys=ON")
    exec(db, "CREATE TABLE p (id INTEGER PRIMARY KEY)")
    exec(db, "CREATE TABLE c1 (id INTEGER PRIMARY KEY, " +
      "pid INTEGER REFERENCES p(id) ON DELETE CASCADE)")
    exec(db, "CREATE TABLE c2 (id INTEGER PRIMARY KEY, " +
      "pid INTEGER REFERENCES p(id) ON DELETE SET NULL)")
    exec(db, "CREATE TABLE c3 (id INTEGER PRIMARY KEY, " +
      "pid INTEGER REFERENCES p(id) ON DELETE CASCADE)")
    exec(db, "CREATE TABLE log (i INTEGER PRIMARY KEY, m TEXT)")
    exec(db, "CREATE TRIGGER t1 AFTER DELETE ON c1 BEGIN " +
      "INSERT INTO log(m) VALUES ('c1:' || OLD.id); END")
    exec(db, "CREATE TRIGGER t2 AFTER UPDATE ON c2 BEGIN " +
      "INSERT INTO log(m) VALUES ('c2:' || NEW.id); END")
    exec(db, "CREATE TRIGGER t3 AFTER DELETE ON c3 BEGIN " +
      "INSERT INTO log(m) VALUES ('c3:' || OLD.id); END")
    exec(db, "CREATE TRIGGER tp AFTER DELETE ON p BEGIN " +
      "INSERT INTO log(m) VALUES ('p:' || OLD.id); END")
    exec(db, "INSERT INTO p VALUES (1), (2)")
    exec(db, "INSERT INTO c1 VALUES (10,1), (11,2), (12,1)")
    exec(db, "INSERT INTO c2 VALUES (20,1)")
    exec(db, "INSERT INTO c3 VALUES (30,1)")
    exec(db, "DELETE FROM p WHERE id = 1")
    assert(q(db, "SELECT m FROM log ORDER BY i") ==
      Seq(Seq("c3:30"), Seq("c2:20"), Seq("c1:10"), Seq("c1:12"), Seq("p:1")))
  }

  test("SET DEFAULT rewrites to the declared default") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "PRAGMA foreign_keys=ON")
      exec(db, "CREATE TABLE p (id INTEGER PRIMARY KEY)")
      exec(db, "CREATE TABLE c4 (id INTEGER PRIMARY KEY, " +
        "pid INTEGER DEFAULT 9 REFERENCES p(id) ON DELETE SET DEFAULT)")
      exec(db, "INSERT INTO p VALUES (1), (9)")
      exec(db, "INSERT INTO c4 VALUES (40, 1)")
      exec(db, "DELETE FROM p WHERE id = 1")
      assert(q(db, "SELECT * FROM c4") == Seq(Seq(40L, 9L)), s"cap=$cap")
      // SET DEFAULT pointing at a doomed key still fails (delta guard
      // runs after the actions)
      val e = execErr(db, "DELETE FROM p WHERE id = 9")
      assert(e == "FOREIGN KEY constraint failed", s"cap=$cap got [$e]")
      assert(q(db, "SELECT COUNT(*) FROM p") == Seq(Seq(1L)), s"cap=$cap")
    }
  }

  test("REPLACE displacement: guard fails, CASCADE/SET NULL act, same-key ok") {
    caps.foreach { cap =>
      def mk(action: String): GraftDb = {
        val db = GraftDb.openInMemory(spark, cap)
        exec(db, "PRAGMA foreign_keys=ON")
        exec(db, "CREATE TABLE p (id INTEGER PRIMARY KEY, a INTEGER UNIQUE, b TEXT)")
        exec(db, s"CREATE TABLE ch (id INTEGER PRIMARY KEY, " +
          s"pid INTEGER REFERENCES p(id) $action)")
        exec(db, "INSERT INTO p VALUES (3, 7, 'x'), (4, 5, 'y')")
        exec(db, "INSERT INTO ch VALUES (1, 3)")
        db
      }
      // plain child: the displaced referenced row fails the statement,
      // nothing applies (the r12-campaign divergence seed 20166)
      val g = mk("")
      val e = execErr(g, "INSERT OR REPLACE INTO p VALUES (4, 7, 'dee')")
      assert(e == "FOREIGN KEY constraint failed", s"cap=$cap got [$e]")
      assert(q(g, "SELECT * FROM p ORDER BY id") ==
        Seq(Seq(3L, 7L, "x"), Seq(4L, 5L, "y")), s"cap=$cap: must not apply")
      // CASCADE: the displaced row's children go with it
      val cdb = mk("ON DELETE CASCADE")
      exec(cdb, "INSERT OR REPLACE INTO p VALUES (4, 7, 'dee')")
      assert(q(cdb, "SELECT COUNT(*) FROM ch") == Seq(Seq(0L)), s"cap=$cap")
      assert(q(cdb, "SELECT * FROM p ORDER BY id") ==
        Seq(Seq(4L, 7L, "dee")), s"cap=$cap")
      // SET NULL
      val sdb = mk("ON DELETE SET NULL")
      exec(sdb, "INSERT OR REPLACE INTO p VALUES (4, 7, 'dee')")
      assert(q(sdb, "SELECT * FROM ch") == Seq(Seq(1L, null)), s"cap=$cap")
      // displacing the referenced row but re-inserting the SAME key: the
      // reference survives, no failure
      val kdb = mk("")
      exec(kdb, "INSERT OR REPLACE INTO p VALUES (3, 9, 'z')")
      assert(q(kdb, "SELECT * FROM p ORDER BY id") ==
        Seq(Seq(3L, 9L, "z"), Seq(4L, 5L, "y")), s"cap=$cap")
    }
  }

  test("displaced victims run ON DELETE actions even when the key survives") {
    // probed live (OLTP-fuzz seed 320869): REPLACE displacement is a
    // per-ROW delete — SET NULL / CASCADE fire for the displaced row's
    // key even though the displacing row immediately re-occupies it; the
    // plain-REFERENCES guard stays final-state (the surviving key
    // satisfies it, earlier golden above).
    caps.foreach { cap =>
      def mk(act: String): GraftDb = {
        val db = GraftDb.openInMemory(spark, cap)
        exec(db, "PRAGMA foreign_keys=ON")
        exec(db, "CREATE TABLE t0 (id INTEGER NOT NULL PRIMARY KEY, " +
          "a INTEGER)")
        exec(db, "CREATE TABLE t1 (id INTEGER NOT NULL PRIMARY KEY, " +
          s"t0_id INTEGER REFERENCES t0(id) $act, c INTEGER)")
        exec(db, "INSERT INTO t0 VALUES (3, 1), (5, 2)")
        exec(db, "INSERT INTO t1(t0_id, c) VALUES (5, 2)")
        db
      }
      // INSERT OR REPLACE re-inserting the SAME key: action still fires
      val i1 = mk("ON DELETE SET NULL")
      exec(i1, "INSERT OR REPLACE INTO t0 VALUES (5, 99)")
      assert(q(i1, "SELECT id, t0_id, c FROM t1") ==
        Seq(Seq(1L, null, 2L)), s"cap=$cap ins setnull")
      val i2 = mk("ON DELETE CASCADE")
      exec(i2, "INSERT OR REPLACE INTO t0 VALUES (5, 99)")
      assert(q(i2, "SELECT count(*) FROM t1") == Seq(Seq(0L)),
        s"cap=$cap ins cascade")
      // UPDATE OR REPLACE rekey 3→5 displacing the referenced victim
      val u1 = mk("ON DELETE SET NULL")
      exec(u1, "UPDATE OR REPLACE t0 SET id = id + 2 WHERE id <= 4")
      assert(q(u1, "SELECT id, t0_id, c FROM t1") ==
        Seq(Seq(1L, null, 2L)), s"cap=$cap upd setnull")
      assert(q(u1, "SELECT id, a FROM t0 ORDER BY id") ==
        Seq(Seq(5L, 1L)), s"cap=$cap upd setnull t0")
      val u2 = mk("ON DELETE CASCADE")
      exec(u2, "UPDATE OR REPLACE t0 SET id = id + 2 WHERE id <= 4")
      assert(q(u2, "SELECT count(*) FROM t1") == Seq(Seq(0L)),
        s"cap=$cap upd cascade")
      // plain REFERENCES: the surviving key satisfies the guard
      val u3 = mk("")
      exec(u3, "UPDATE OR REPLACE t0 SET id = id + 2 WHERE id <= 4")
      assert(q(u3, "SELECT id, t0_id, c FROM t1") ==
        Seq(Seq(1L, 5L, 2L)), s"cap=$cap upd guard")
    }
  }

  test("key rewrites fail for every child; ON UPDATE actions reject at CREATE") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "PRAGMA foreign_keys=ON")
      exec(db, "CREATE TABLE p (id INTEGER PRIMARY KEY, a INTEGER UNIQUE)")
      exec(db, "CREATE TABLE ch (id INTEGER PRIMARY KEY, " +
        "pid INTEGER REFERENCES p(id) ON DELETE CASCADE)")
      exec(db, "INSERT INTO p VALUES (3, 7)")
      exec(db, "INSERT INTO ch VALUES (1, 3)")
      // upsert DO UPDATE on the referenced key: fails even though the
      // child declares ON DELETE CASCADE (probed — ON UPDATE governs)
      assert(execErr(db, "INSERT INTO p VALUES (3, 9) " +
        "ON CONFLICT(id) DO UPDATE SET id = 30") ==
        "FOREIGN KEY constraint failed", s"cap=$cap")
      assert(execErr(db, "UPDATE p SET id = 31 WHERE id = 3") ==
        "FOREIGN KEY constraint failed", s"cap=$cap")
      assert(q(db, "SELECT id FROM p") == Seq(Seq(3L)), s"cap=$cap")
      // updating a NON-referenced column stays free
      exec(db, "UPDATE p SET a = 8 WHERE id = 3")
      // ON UPDATE actions beyond NO ACTION/RESTRICT reject loudly
      assert(execErr(db, "CREATE TABLE bad (id INTEGER PRIMARY KEY, " +
        "pid INTEGER REFERENCES p(id) ON UPDATE CASCADE)") ==
        "ON UPDATE CASCADE is not supported (ON DELETE actions are)",
        s"cap=$cap")
    }
  }

  test("inert while foreign_keys is OFF (the default)") {
    val db = GraftDb.openInMemory(spark, 500)
    exec(db, "CREATE TABLE p (id INTEGER PRIMARY KEY)")
    exec(db, "CREATE TABLE ch (id INTEGER PRIMARY KEY, " +
      "pid INTEGER REFERENCES p(id) ON DELETE CASCADE)")
    exec(db, "INSERT INTO p VALUES (1)")
    exec(db, "INSERT INTO ch VALUES (10, 1)")
    exec(db, "DELETE FROM p WHERE id = 1")
    assert(q(db, "SELECT * FROM ch") == Seq(Seq(10L, 1L)),
      "no cascade while the pragma is off")
  }

  test("persistence: actions survive close + reopen (createSql round-trip)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fkact-")
    val db = GraftDb.open(spark, dir.resolve("db").toString, 500)
      .fold(e => fail(e), identity)
    exec(db, "PRAGMA foreign_keys=ON")
    exec(db, "CREATE TABLE p (id INTEGER PRIMARY KEY)")
    exec(db, "CREATE TABLE ch (id INTEGER PRIMARY KEY, " +
      "pid INTEGER REFERENCES p(id) ON DELETE CASCADE)")
    exec(db, "INSERT INTO p VALUES (1), (2)")
    exec(db, "INSERT INTO ch VALUES (10, 1), (11, 2)")
    db.close()
    val db2 = GraftDb.open(spark, dir.resolve("db").toString, 500)
      .fold(e => fail(e), identity)
    exec(db2, "PRAGMA foreign_keys=ON")
    exec(db2, "DELETE FROM p WHERE id = 1")
    assert(q(db2, "SELECT * FROM ch") == Seq(Seq(11L, 2L)),
      "the reopened definition must still cascade")
    db2.close()
  }
}
