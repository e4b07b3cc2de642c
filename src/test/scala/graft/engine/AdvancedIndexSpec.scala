package graft.engine

import graft.SparkSpec
import graft.command.Value

/** Partial (`WHERE pred`) and expression unique indexes (VERDICT r12 #2),
  * probed live on SQLite 3.40.1:
  *  - a partial UNIQUE index constrains only rows satisfying its
  *    predicate ('(1,0)' and '(1,0)' coexist under `WHERE b > 0`; the
  *    second b>0 row collides), and an UPDATE moving a row INTO the
  *    partial set collides too;
  *  - expression indexes key computed values; a violation reports
  *    SQLite's `index 'name'` text (plain-column partial ones keep the
  *    column list);
  *  - CREATE resolves expressions immediately: unknown columns and
  *    nondeterministic functions are rejected with SQLite's texts, and a
  *    UNIQUE creation pre-scans existing rows under the index semantics;
  *  - conflict POLICIES over an advanced index are a loud documented
  *    engine boundary (the sequential resolution loops have no computed
  *    keys for them) — never a silent divergence.
  * Runs at cap 500 (Mem) and cap 2 (spilled) where applicable. */
class AdvancedIndexSpec extends SparkSpec {

  private def caps = Seq(500L, 2L)

  private def ok(db: GraftDb, sql: String): Long = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
    r.rowsAffected
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

  test("partial UNIQUE constrains only rows matching the predicate") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      ok(db, "CREATE TABLE t (a INTEGER, b INTEGER, s TEXT)")
      ok(db, "CREATE UNIQUE INDEX pi ON t(a) WHERE b > 0")
      ok(db, "INSERT INTO t VALUES (1, 0, 'x')")
      ok(db, "INSERT INTO t VALUES (1, 0, 'y')") // both outside the set
      ok(db, "INSERT INTO t VALUES (1, 1, 'z')") // first inside: fine
      assert(err(db, "INSERT INTO t VALUES (1, 2, 'w')") ==
        "UNIQUE constraint failed: t.a", s"cap=$cap")
      // probed: UPDATE moving (1,0,'y') into the b>0 set collides with
      // the (1,1,'z') row already there
      assert(err(db, "UPDATE t SET b = 9 WHERE s = 'y'") ==
        "UNIQUE constraint failed: t.a", s"cap=$cap")
      assert(q(db, "SELECT count(*) FROM t") == Seq(Seq(3L)), s"cap=$cap")
      // and an UPDATE moving the indexed row OUT frees the key
      ok(db, "UPDATE t SET b = -1 WHERE s = 'z'")
      ok(db, "INSERT INTO t VALUES (1, 3, 'w2')")
    }
  }

  test("expression UNIQUE keys computed values; error names the index") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      ok(db, "CREATE TABLE t (a INTEGER, b INTEGER, s TEXT)")
      ok(db, "CREATE UNIQUE INDEX ei ON t(lower(s))")
      ok(db, "INSERT INTO t VALUES (9, 0, 'Q')")
      assert(err(db, "INSERT INTO t VALUES (8, 1, 'q')") ==
        "UNIQUE constraint failed: index 'ei'", s"cap=$cap")
      ok(db, "INSERT INTO t VALUES (8, 1, 'r')")
      assert(err(db, "UPDATE t SET s = 'q' WHERE s = 'r'") ==
        "UNIQUE constraint failed: index 'ei'", s"cap=$cap")
    }
  }

  test("mixed expression + partial index (probed golden)") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE t (a INTEGER, b INTEGER, s TEXT)")
    ok(db, "CREATE UNIQUE INDEX combo ON t(a, lower(s)) WHERE b >= 5")
    ok(db, "INSERT INTO t VALUES (3, 5, 'mm')")
    assert(err(db, "INSERT INTO t VALUES (3, 6, 'MM')") ==
      "UNIQUE constraint failed: index 'combo'")
    ok(db, "INSERT INTO t VALUES (3, 4, 'MM')") // below the predicate
  }

  test("non-unique advanced indexes are accepted and cataloged") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE t (a INTEGER, b INTEGER, s TEXT)")
    ok(db, "CREATE INDEX plain_expr ON t(a + b)")
    ok(db, "CREATE INDEX part ON t(a) WHERE b IS NOT NULL")
    assert(q(db, "SELECT name FROM sqlite_master WHERE type = 'index' " +
      "ORDER BY name") == Seq(Seq("part"), Seq("plain_expr")))
    ok(db, "DROP INDEX plain_expr")
    assert(q(db, "SELECT count(*) FROM sqlite_master WHERE type = 'index'")
      == Seq(Seq(1L)))
  }

  test("CREATE-time resolution: unknown column, nondeterminism, pre-scan") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE t (a INTEGER, b INTEGER, s TEXT)")
    assert(err(db, "CREATE UNIQUE INDEX badcol ON t(lower(nosuch))") ==
      "no such column: nosuch")
    // the engine's GLOBAL determinism guard rejects random() at the API
    // level before the index-specific check (statement-log replication
    // contract) — loud either way, matching SQLite's refusal in spirit
    def apiErr(sql: String): String =
      db.executeStringStmt(sql).fold(identity,
        rs => rs.head.error match {
          case e if e.nonEmpty => e
          case _ => fail(s"expected an error for [$sql]")
        })
    assert(apiErr("CREATE INDEX baddet ON t(random())")
      .contains("non-deterministic function"))
    assert(apiErr("CREATE INDEX badw ON t(a) WHERE random() > 0")
      .contains("non-deterministic function"))
    // pre-scan under the index's own semantics
    ok(db, "INSERT INTO t VALUES (1, 1, 'Q'), (2, 2, 'q')")
    assert(err(db, "CREATE UNIQUE INDEX ei ON t(lower(s))") ==
      "UNIQUE constraint failed: index 'ei'")
    ok(db, "CREATE UNIQUE INDEX pi2 ON t(a) WHERE b > 1") // only (2,2) in set
  }

  test("conflict policies over an advanced index fail loudly") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE t (a INTEGER, b INTEGER, s TEXT)")
    ok(db, "CREATE UNIQUE INDEX pi ON t(a) WHERE b > 0")
    ok(db, "INSERT INTO t VALUES (1, 1, 'x')")
    val e = err(db, "INSERT OR IGNORE INTO t VALUES (1, 2, 'y')")
    assert(e.contains("partial or expression index is not supported"), e)
    val e2 = err(db, "UPDATE OR REPLACE t SET a = 1 WHERE b > 0")
    assert(e2.contains("partial or expression index is not supported"), e2)
    // plain INSERT/UPDATE keep working (exact enforcement)
    ok(db, "INSERT INTO t VALUES (2, 1, 'z')")
    assert(q(db, "SELECT count(*) FROM t") == Seq(Seq(2L)))
  }
}
