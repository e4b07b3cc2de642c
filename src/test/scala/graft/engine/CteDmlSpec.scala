package graft.engine

import graft.SparkSpec
import graft.command.Value

/** CTE-prefixed DML goldens (`WITH [RECURSIVE] ... INSERT/UPDATE/DELETE`,
  * SQLite surface since 3.8.3; the reference reaches it through its
  * delegated SQLite handle). Every outcome probed live on SQLite 3.40:
  *  - CTEs are statement-scoped and SHADOW same-named tables;
  *  - rows_affected is the underlying DML's changes();
  *  - RETURNING composes (the clause splits off the DML tail);
  *  - recursive CTEs and chained CTE references work in DML position;
  *  - WITH..SELECT remains a plain query on the query path and rusqlite's
  *    ExecuteReturnedResults on the execute path.
  * Runs at cap 500 (Mem) and cap 1 (spilled Big) like the other DML specs. */
class CteDmlSpec extends SparkSpec {

  private def fresh(cap: Long): GraftDb = {
    val db = GraftDb.openInMemory(spark, cap)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER)")
    exec(db, "INSERT INTO t VALUES (1, 10), (2, 20), (3, 30)")
    exec(db, "CREATE TABLE s (k INTEGER, v INTEGER)")
    exec(db, "INSERT INTO s VALUES (2, 99)")
    db
  }

  private def exec(db: GraftDb, sql: String): Long = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
    r.rowsAffected
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

  test("WITH .. UPDATE: scalar-subquery read of the CTE, changes() parity") {
    caps.foreach { cap =>
      val db = fresh(cap)
      val n = exec(db, "WITH m AS (SELECT avg(a) AS av FROM t) " +
        "UPDATE t SET a = 0 WHERE a > (SELECT av FROM m)")
      assert(n == 1, s"cap=$cap ra=$n")
      assert(q(db, "SELECT id, a FROM t ORDER BY id") ==
        Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 0L)), s"cap=$cap")
    }
  }

  test("CTE shadows a same-named table (probed: resolution order)") {
    caps.foreach { cap =>
      val db = fresh(cap)
      // table s holds (2, 99); the CTE s supplies (1, 77) and WINS
      val n = exec(db, "WITH s AS (SELECT 1 AS k, 77 AS v) " +
        "UPDATE t SET a = s.v FROM s WHERE t.id = s.k")
      assert(n == 1, s"cap=$cap")
      assert(q(db, "SELECT id, a FROM t ORDER BY id") ==
        Seq(Seq(1L, 77L), Seq(2L, 20L), Seq(3L, 30L)), s"cap=$cap")
      assert(q(db, "SELECT k, v FROM s") == Seq(Seq(2L, 99L)),
        s"cap=$cap: the table itself is untouched")
    }
  }

  test("WITH .. DELETE .. RETURNING composes (query path)") {
    caps.foreach { cap =>
      val db = fresh(cap)
      val rows = q(db, "WITH d AS (SELECT 2 AS k) " +
        "DELETE FROM t WHERE id IN (SELECT k FROM d) RETURNING id, a")
      assert(rows == Seq(Seq(2L, 20L)), s"cap=$cap got $rows")
      assert(q(db, "SELECT id FROM t ORDER BY id") ==
        Seq(Seq(1L), Seq(3L)), s"cap=$cap")
    }
  }

  test("WITH .. INSERT SELECT: CTE as the source, rowids in source order") {
    caps.foreach { cap =>
      val db = fresh(cap)
      val n = exec(db, "WITH src AS (SELECT a + 100 AS a FROM t) " +
        "INSERT INTO t(a) SELECT a FROM src ORDER BY a")
      assert(n == 3, s"cap=$cap ra=$n")
      assert(q(db, "SELECT id, a FROM t WHERE id > 3 ORDER BY id") ==
        Seq(Seq(4L, 110L), Seq(5L, 120L), Seq(6L, 130L)), s"cap=$cap")
    }
  }

  test("chained and recursive CTEs in DML position") {
    caps.foreach { cap =>
      val db = fresh(cap)
      val n = exec(db, "WITH one AS (SELECT 1 AS x), " +
        "two AS (SELECT x + 2 AS y FROM one) " +
        "UPDATE t SET a = a + (SELECT y FROM two) WHERE id = 1")
      assert(n == 1, s"cap=$cap")
      assert(q(db, "SELECT a FROM t WHERE id = 1") == Seq(Seq(13L)), s"cap=$cap")
      val n2 = exec(db, "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL " +
        "SELECT n + 1 FROM r WHERE n < 3) " +
        "DELETE FROM t WHERE id IN (SELECT n FROM r)")
      assert(n2 == 3, s"cap=$cap")
      assert(q(db, "SELECT COUNT(*) FROM t") == Seq(Seq(0L)), s"cap=$cap")
    }
  }

  test("CTE names die with their statement (no catalog leak)") {
    val db = fresh(500)
    exec(db, "WITH m AS (SELECT 2 AS k) " +
      "UPDATE t SET a = -1 WHERE id IN (SELECT k FROM m)")
    val e = db.queryStringStmt("SELECT * FROM m")
      .fold(identity, r => fail(s"dead CTE must not resolve, got $r"))
    assert(e == "no such table: m", e)
    // a shadowed table resolves back to the TABLE after the statement
    exec(db, "WITH s AS (SELECT 9 AS k, 9 AS v) " +
      "UPDATE t SET a = 0 WHERE id = (SELECT k FROM s)")
    assert(q(db, "SELECT k, v FROM s") == Seq(Seq(2L, 99L)),
      "the real table s must be visible again")
  }

  test("plain WITH..SELECT routing is unchanged") {
    val db = fresh(500)
    assert(q(db, "WITH m AS (SELECT MAX(a) AS mx FROM t) SELECT mx FROM m") ==
      Seq(Seq(30L)))
    // execute path: a row-yielding query is rusqlite's refusal
    val r = db.executeStringStmt("WITH m AS (SELECT 1 AS x) SELECT x FROM m")
      .fold(e => fail(e), identity).head
    assert(r.error == "Execute returned results - did you mean to call query?")
  }

  test("journal replay reproduces CTE-DML effects") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ctedml-")
    val db = GraftDb.open(spark, dir.resolve("db").toString, 500)
      .fold(e => fail(e), identity)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER)")
    exec(db, "INSERT INTO t VALUES (1, 10), (2, 20)")
    exec(db, "WITH m AS (SELECT MIN(a) AS mn FROM t) " +
      "UPDATE t SET a = -1 WHERE a = (SELECT mn FROM m)")
    db.close()
    val db2 = GraftDb.open(spark, dir.resolve("db").toString, 500)
      .fold(e => fail(e), identity)
    assert(q(db2, "SELECT id, a FROM t ORDER BY id") ==
      Seq(Seq(1L, -1L), Seq(2L, 20L)))
    db2.close()
  }
}
