package graft.engine

import graft.SparkSpec
import graft.command.Value

/** Generated-column goldens (SQLite 3.31 surface; the reference reaches it
  * through its delegated SQLite handle). Every outcome probed live on
  * SQLite 3.40:
  *  - values compute on INSERT and recompute when an UPDATE (or upsert DO
  *    UPDATE) writes a referenced base column;
  *  - the positional VALUES list covers only non-generated columns; an
  *    explicit generated column in an INSERT list / UPDATE SET is
  *    `cannot INSERT into|UPDATE generated column "x"`;
  *  - generated columns may reference each other in either declaration
  *    direction (dependency-ordered evaluation);
  *  - UNIQUE / NOT NULL constraints on generated columns enforce with the
  *    standard texts; they cannot be PK or carry DEFAULT;
  *  - PRAGMA table_info HIDES generated columns;
  *  - ALTER ADD a VIRTUAL generated column backfills from existing rows,
  *    STORED is rejected, and dropping a referenced base column fails.
  * Runs at cap 500 (Mem) and cap 1 (spilled Big) like the other specs. */
class GeneratedColsSpec extends SparkSpec {

  private def fresh(cap: Long): GraftDb = {
    val db = GraftDb.openInMemory(spark, cap)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER, " +
      "d INTEGER GENERATED ALWAYS AS (a * 2), " +
      "s TEXT AS ('v:' || a) STORED)")
    exec(db, "INSERT INTO t(a) VALUES (3), (5)")
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
        case Value.Integer(v) => v
        case Value.Text(v) => v
        case Value.Null => null
        case v => v
      })

  private def caps = Seq(500L, 1L)

  test("compute on INSERT; SELECT * shows them; bare VALUES arity") {
    caps.foreach { cap =>
      val db = fresh(cap)
      assert(q(db, "SELECT * FROM t ORDER BY id") ==
        Seq(Seq(1L, 3L, 6L, "v:3"), Seq(2L, 5L, 10L, "v:5")), s"cap=$cap")
      // bare VALUES targets only the stored columns (probed)
      exec(db, "INSERT INTO t VALUES (7, 7)")
      assert(q(db, "SELECT * FROM t WHERE id = 7") ==
        Seq(Seq(7L, 7L, 14L, "v:7")), s"cap=$cap")
      assert(execErr(db, "INSERT INTO t VALUES (1, 2, 3)") ==
        "table t has 2 columns but 3 values were supplied", s"cap=$cap")
    }
  }

  test("write rejection: INSERT list, UPDATE SET, upsert DO UPDATE SET") {
    caps.foreach { cap =>
      val db = fresh(cap)
      assert(execErr(db, "INSERT INTO t(a, d) VALUES (1, 99)") ==
        """cannot INSERT into generated column "d"""", s"cap=$cap")
      assert(execErr(db, "UPDATE t SET d = 5") ==
        """cannot UPDATE generated column "d"""", s"cap=$cap")
      assert(execErr(db, "INSERT INTO t(id, a) VALUES (1, 9) " +
        "ON CONFLICT(id) DO UPDATE SET d = 9") ==
        """cannot UPDATE generated column "d"""", s"cap=$cap")
      // nothing mutated by the rejected statements
      assert(q(db, "SELECT COUNT(*) FROM t") == Seq(Seq(2L)), s"cap=$cap")
    }
  }

  test("UPDATE of a base column recomputes; upsert DO UPDATE recomputes") {
    caps.foreach { cap =>
      val db = fresh(cap)
      exec(db, "UPDATE t SET a = 10 WHERE id = 1")
      assert(q(db, "SELECT * FROM t ORDER BY id") ==
        Seq(Seq(1L, 10L, 20L, "v:10"), Seq(2L, 5L, 10L, "v:5")), s"cap=$cap")
      exec(db, "INSERT INTO t(id, a) VALUES (1, 7) " +
        "ON CONFLICT(id) DO UPDATE SET a = excluded.a")
      assert(q(db, "SELECT * FROM t WHERE id = 1") ==
        Seq(Seq(1L, 7L, 14L, "v:7")), s"cap=$cap")
    }
  }

  test("UPDATE ... FROM on a generated table recomputes through the join") {
    caps.foreach { cap =>
      val db = fresh(cap)
      exec(db, "CREATE TABLE src (k INTEGER, v INTEGER)")
      exec(db, "INSERT INTO src VALUES (2, 40)")
      exec(db, "UPDATE t SET a = src.v FROM src WHERE t.id = src.k")
      assert(q(db, "SELECT * FROM t WHERE id = 2") ==
        Seq(Seq(2L, 40L, 80L, "v:40")), s"cap=$cap")
    }
  }

  test("dependency-ordered evaluation: forward references compute (probed)") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "CREATE TABLE g4 (a INTEGER, b INTEGER AS (c + 1), " +
        "c INTEGER AS (a + 1))")
      exec(db, "INSERT INTO g4(a) VALUES (1)")
      assert(q(db, "SELECT * FROM g4") == Seq(Seq(1L, 3L, 2L)), s"cap=$cap")
    }
  }

  test("constraints on generated columns: UNIQUE and NOT NULL enforce") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      exec(db, "CREATE TABLE g (a INTEGER, u INTEGER AS (a % 3) UNIQUE)")
      exec(db, "INSERT INTO g(a) VALUES (1), (2)")
      assert(execErr(db, "INSERT INTO g(a) VALUES (4)") ==
        "UNIQUE constraint failed: g.u", s"cap=$cap")
      exec(db, "CREATE TABLE g3 (a INTEGER, " +
        "d INTEGER NOT NULL GENERATED ALWAYS AS (NULL))")
      assert(execErr(db, "INSERT INTO g3(a) VALUES (1)") ==
        "NOT NULL constraint failed: g3.d", s"cap=$cap")
    }
  }

  test("DDL guards: PK, DEFAULT; table_info hides generated columns") {
    val db = fresh(500)
    assert(execErr(db, "CREATE TABLE bad1 (a INTEGER, " +
      "d INTEGER PRIMARY KEY GENERATED ALWAYS AS (a + 1))") ==
      "generated columns cannot be part of the PRIMARY KEY")
    assert(execErr(db, "CREATE TABLE bad2 (a INTEGER, " +
      "d INTEGER GENERATED ALWAYS AS (a + 1) DEFAULT 5)") ==
      "cannot use DEFAULT on a generated column")
    val info = q(db, "PRAGMA table_info(t)")
    assert(info.map(_(1)) == Seq("id", "a"),
      s"generated columns must hide from table_info: $info")
    assert(info.map(_(0)) == Seq(0L, 1L), "cids renumber over visible cols")
  }

  test("ALTER: ADD virtual backfills, STORED rejected, DROP referenced fails") {
    caps.foreach { cap =>
      val db = fresh(cap)
      exec(db, "ALTER TABLE t ADD COLUMN e INTEGER GENERATED ALWAYS AS (a + 3)")
      assert(q(db, "SELECT e FROM t ORDER BY id") ==
        Seq(Seq(6L), Seq(8L)), s"cap=$cap")
      // new rows compute the added column too
      exec(db, "INSERT INTO t(a) VALUES (9)")
      assert(q(db, "SELECT e FROM t WHERE a = 9") == Seq(Seq(12L)), s"cap=$cap")
      assert(execErr(db,
        "ALTER TABLE t ADD COLUMN f INTEGER GENERATED ALWAYS AS (a) STORED") ==
        "cannot add a STORED column", s"cap=$cap")
      assert(execErr(db, "ALTER TABLE t DROP COLUMN a") ==
        "error in table t after drop column: no such column: a", s"cap=$cap")
    }
  }

  test("RETURNING and triggers observe computed values") {
    val db = fresh(500)
    val ret = q(db, "INSERT INTO t(a) VALUES (8) RETURNING id, d, s")
    assert(ret == Seq(Seq(3L, 16L, "v:8")), s"got $ret")
    exec(db, "CREATE TABLE log (id INTEGER PRIMARY KEY, m TEXT)")
    exec(db, "CREATE TRIGGER trg AFTER UPDATE ON t BEGIN " +
      "INSERT INTO log(m) VALUES ('d=' || NEW.d); END")
    exec(db, "UPDATE t SET a = 6 WHERE id = 1")
    assert(q(db, "SELECT m FROM log") == Seq(Seq("d=12")))
  }

  test("bulk INSERT..SELECT over the cap computes distributed") {
    val db = fresh(1) // probeCap 1: a 2-row SELECT source takes bulkInsertBig
    exec(db, "INSERT INTO t(a) SELECT a + 20 FROM t ORDER BY id")
    assert(q(db, "SELECT a, d, s FROM t WHERE a > 20 ORDER BY a") ==
      Seq(Seq(23L, 46L, "v:23"), Seq(25L, 50L, "v:25")))
  }

  test("persistence: createSql round-trips gens; journal replay recomputes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gencol-")
    val db = GraftDb.open(spark, dir.resolve("db").toString, 500)
      .fold(e => fail(e), identity)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER, " +
      "d INTEGER GENERATED ALWAYS AS (a * 2))")
    exec(db, "INSERT INTO t(a) VALUES (4)")
    db.close()
    val db2 = GraftDb.open(spark, dir.resolve("db").toString, 500)
      .fold(e => fail(e), identity)
    assert(q(db2, "SELECT * FROM t") == Seq(Seq(1L, 4L, 8L)))
    // the reopened definition still computes and still rejects writes
    exec(db2, "INSERT INTO t(a) VALUES (6)")
    assert(q(db2, "SELECT d FROM t ORDER BY id") == Seq(Seq(8L), Seq(12L)))
    assert(execErr(db2, "UPDATE t SET d = 1") ==
      """cannot UPDATE generated column "d"""")
    db2.close()
  }
}
