package graft.engine

import graft.SparkSpec
import graft.command.Value

/** Multi-clause UPSERT (SQLite 3.35+, VERDICT r12 #6) — every golden in
  * this spec was probed live on SQLite 3.40.1:
  *
  *  - per candidate, the FIRST clause in statement order whose target
  *    constraint the candidate actually violates applies (NOT the
  *    constraint-check order: clause order (a,b) vs (b,a) flips which
  *    action runs when a row violates both);
  *  - a clause without a target is the catch-all and is only valid LAST
  *    (`near "ON": syntax error` otherwise);
  *  - a violation no clause targets aborts with the normal constraint
  *    error text;
  *  - target validation runs for ALL clauses (clause order) before any
  *    SET list resolves: unknown target column → `no such column: X`,
  *    existing-but-unconstrained target → the `{1st,2nd,…} ON CONFLICT
  *    clause does not match any PRIMARY KEY or UNIQUE constraint` text
  *    (ordinal only when there are ≥2 clauses);
  *  - a DO UPDATE whose write violates another constraint fails even
  *    when a later clause targets that constraint (clauses fire at most
  *    once per candidate). */
class MultiUpsertSpec extends SparkSpec {

  private def caps = Seq(500L, 2L)

  private def ok(db: GraftDb, sql: String): Unit = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
  }

  private def err(db: GraftDb, sql: String): String = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.nonEmpty, s"expected an error for [$sql]")
    r.error
  }

  private def affected(db: GraftDb, sql: String): Long = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
    r.rowsAffected
  }

  private def dump(db: GraftDb, tbl: String): Seq[Seq[Value]] =
    db.queryStringStmt(s"SELECT * FROM $tbl ORDER BY 1")
      .fold(e => fail(e), _.head.values)

  private def mk(cap: Long): GraftDb = {
    val db = GraftDb.openInMemory(spark, cap)
    ok(db, "CREATE TABLE t (a INTEGER UNIQUE, b INTEGER UNIQUE, c TEXT)")
    ok(db, "INSERT INTO t VALUES (1, 10, 'x'), (2, 20, 'y')")
    db
  }

  private def text(v: Value): String = v.asInstanceOf[Value.Text].v

  test("first matching target wins; non-matching clause is inert") {
    caps.foreach { cap =>
      val db = mk(cap)
      // probed: conflict on a → clause 1 DO UPDATE; final c='hitA', ch=1
      assert(affected(db, "INSERT INTO t VALUES (1, 99, 'A') " +
        "ON CONFLICT(a) DO UPDATE SET c = 'hitA' " +
        "ON CONFLICT(b) DO NOTHING") == 1L)
      // probed: conflict on b → clause 2 DO NOTHING; ch=0
      assert(affected(db, "INSERT INTO t VALUES (9, 20, 'B') " +
        "ON CONFLICT(a) DO UPDATE SET c = 'hitA' " +
        "ON CONFLICT(b) DO NOTHING") == 0L)
      val rows = dump(db, "t")
      assert(rows.size == 2, s"cap=$cap")
      assert(text(rows.head(2)) == "hitA")
      assert(text(rows(1)(2)) == "y")
    }
  }

  test("row violating both constraints follows CLAUSE order, not check order") {
    caps.foreach { cap =>
      val db = mk(cap)
      // probed: (1,10) violates a AND b on row 1; clause order (a,b) → hitA
      ok(db, "INSERT INTO t VALUES (1, 10, 'B') " +
        "ON CONFLICT(a) DO UPDATE SET c = 'hitA' " +
        "ON CONFLICT(b) DO UPDATE SET c = 'hitB'")
      assert(text(dump(db, "t").head(2)) == "hitA", s"cap=$cap")
      // probed: same candidate, clause order (b,a) → hitB
      ok(db, "INSERT INTO t VALUES (1, 10, 'B') " +
        "ON CONFLICT(b) DO UPDATE SET c = 'hitB' " +
        "ON CONFLICT(a) DO UPDATE SET c = 'hitA'")
      assert(text(dump(db, "t").head(2)) == "hitB", s"cap=$cap")
    }
  }

  test("violation no clause targets aborts with the constraint error") {
    caps.foreach { cap =>
      val db = mk(cap)
      // probed: candidate hits only b; sole clause targets a
      assert(err(db, "INSERT INTO t VALUES (5, 10, 'B') " +
        "ON CONFLICT(a) DO NOTHING") == "UNIQUE constraint failed: t.b",
        s"cap=$cap")
      // probed: a targetless catch-all absorbs it
      assert(affected(db, "INSERT INTO t VALUES (5, 10, 'B') " +
        "ON CONFLICT(a) DO UPDATE SET c = 'hitA' " +
        "ON CONFLICT DO NOTHING") == 0L)
      assert(dump(db, "t").size == 2)
    }
  }

  test("targetless clause in a non-last position is a syntax error") {
    val db = mk(500L)
    assert(err(db, "INSERT INTO t VALUES (5, 10, 'B') " +
      "ON CONFLICT DO NOTHING ON CONFLICT(b) DO NOTHING") ==
      "near \"ON\": syntax error")
  }

  test("duplicate targets: the first clause wins") {
    caps.foreach { cap =>
      val db = mk(cap)
      // probed: DO NOTHING (first) wins over the later DO UPDATE
      assert(affected(db, "INSERT INTO t VALUES (1, 99, 'B') " +
        "ON CONFLICT(a) DO NOTHING " +
        "ON CONFLICT(a) DO UPDATE SET c = 'second'") == 0L)
      assert(text(dump(db, "t").head(2)) == "x", s"cap=$cap")
    }
  }

  test("DO UPDATE violating another constraint fails despite a later clause") {
    caps.foreach { cap =>
      val db = mk(cap)
      // probed: clause a's write b=20 collides with row 2; the ON
      // CONFLICT(b) DO NOTHING clause does NOT rescue it
      assert(err(db, "INSERT INTO t VALUES (1, 99, 'B') " +
        "ON CONFLICT(a) DO UPDATE SET b = 20 " +
        "ON CONFLICT(b) DO NOTHING") == "UNIQUE constraint failed: t.b",
        s"cap=$cap")
      val rows = dump(db, "t")
      assert(rows.map(r => text(r(2))) == Seq("x", "y"))
    }
  }

  test("target validation order and error texts (probed)") {
    val db = mk(500L)
    // unknown target column reports from its clause position
    assert(err(db, "INSERT INTO t VALUES (7, 70, 'B') " +
      "ON CONFLICT(zz) DO NOTHING") == "no such column: zz")
    assert(err(db, "INSERT INTO t VALUES (7, 70, 'B') " +
      "ON CONFLICT(zz) DO NOTHING ON CONFLICT(c) DO NOTHING") ==
      "no such column: zz")
    // unmatched target: no ordinal single-clause, ordinal multi-clause —
    // and clause 1's target error beats clause 2's unknown column
    assert(err(db, "INSERT INTO t VALUES (7, 70, 'B') " +
      "ON CONFLICT(c) DO NOTHING") ==
      "ON CONFLICT clause does not match any PRIMARY KEY or UNIQUE " +
        "constraint")
    assert(err(db, "INSERT INTO t VALUES (7, 70, 'B') " +
      "ON CONFLICT(c) DO NOTHING ON CONFLICT(zz) DO NOTHING") ==
      "1st ON CONFLICT clause does not match any PRIMARY KEY or UNIQUE " +
        "constraint")
    assert(err(db, "INSERT INTO t VALUES (7, 70, 'B') " +
      "ON CONFLICT(a) DO NOTHING ON CONFLICT(b) DO NOTHING " +
      "ON CONFLICT(c) DO NOTHING") ==
      "3rd ON CONFLICT clause does not match any PRIMARY KEY or UNIQUE " +
        "constraint")
    // all targets validate BEFORE any SET list resolves: clause 2's
    // unmatched target beats clause 1's unknown SET column
    assert(err(db, "INSERT INTO t VALUES (7, 70, 'B') " +
      "ON CONFLICT(a) DO UPDATE SET qq = 1 ON CONFLICT(c) DO NOTHING") ==
      "2nd ON CONFLICT clause does not match any PRIMARY KEY or UNIQUE " +
        "constraint")
  }

  test("excluded.* in a later clause; three-clause scan; RETURNING tape") {
    caps.foreach { cap =>
      val db = mk(cap)
      // probed: conflict on b → clause 2's excluded expression
      ok(db, "INSERT INTO t VALUES (5, 10, 'E') " +
        "ON CONFLICT(a) DO NOTHING " +
        "ON CONFLICT(b) DO UPDATE SET c = excluded.c || '!'")
      assert(text(dump(db, "t").head(2)) == "E!", s"cap=$cap")
      // probed: violates a+b; first clause in order with a violated
      // target is (b) → DO NOTHING, even with a 3rd catch-all
      assert(affected(db, "INSERT INTO t VALUES (1, 10, 'z') " +
        "ON CONFLICT(b) DO NOTHING " +
        "ON CONFLICT(a) DO UPDATE SET c = '3rd-a' " +
        "ON CONFLICT DO NOTHING") == 0L)
      assert(text(dump(db, "t").head(2)) == "E!", s"cap=$cap")
    }
    // probed RETURNING tape: hitA row 1 NEW image, skip for DO NOTHING,
    // plain insert row 3 → [(1,'hitA'), (3,'C')]
    val db = mk(500L)
    val r = db.queryStringStmt("INSERT INTO t VALUES " +
      "(1, 99, 'A'), (9, 20, 'B'), (7, 70, 'C') " +
      "ON CONFLICT(a) DO UPDATE SET c = 'hitA' " +
      "ON CONFLICT(b) DO NOTHING RETURNING rowid, c")
      .fold(e => fail(e), _.head)
    assert(r.values.map(row => (row.head.asInstanceOf[Value.Integer].v,
      text(row(1)))) == Seq((1L, "hitA"), (3L, "C")))
  }

  test("DO UPDATE ... WHERE gates per candidate (probed)") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      ok(db, "CREATE TABLE w (id INTEGER PRIMARY KEY, a INTEGER, c TEXT)")
      ok(db, "INSERT INTO w VALUES (1, 5, 'x'), (2, 3, 'y')")
      // probed: excluded.a=2 > a=5 false → no update, ch=0
      assert(affected(db, "INSERT INTO w VALUES (1, 2, 'z') " +
        "ON CONFLICT(id) DO UPDATE SET a = excluded.a " +
        "WHERE excluded.a > a") == 0L, s"cap=$cap")
      // probed: 9 > 5 true → a=9, ch=1
      assert(affected(db, "INSERT INTO w VALUES (1, 9, 'z') " +
        "ON CONFLICT(id) DO UPDATE SET a = excluded.a " +
        "WHERE excluded.a > a") == 1L)
      // probed: qualified target-table ref works (w.a < excluded.a)
      ok(db, "INSERT INTO w VALUES (2, 7, 'q') ON CONFLICT(id) " +
        "DO UPDATE SET a = excluded.a WHERE w.a < excluded.a")
      val rows = dump(db, "w")
      assert(rows.map(_(1).asInstanceOf[Value.Integer].v) == Seq(9L, 7L),
        s"cap=$cap")
      // probed: NULL comparison → NULL → skip like false
      assert(affected(db, "INSERT INTO w VALUES (1, NULL, 'z') " +
        "ON CONFLICT(id) DO UPDATE SET a = excluded.a " +
        "WHERE excluded.a > a") == 0L)
      // probed: WHERE-false on a matching clause does NOT fall through
      // to a later clause
      ok(db, "CREATE TABLE u (a INTEGER UNIQUE, b INTEGER UNIQUE, c TEXT)")
      ok(db, "INSERT INTO u VALUES (1, 10, 'x')")
      assert(affected(db, "INSERT INTO u VALUES (1, 10, 'B') " +
        "ON CONFLICT(a) DO UPDATE SET c = 'A' WHERE excluded.c = 'zz' " +
        "ON CONFLICT(b) DO UPDATE SET c = 'B2' WHERE 1") == 0L)
      assert(text(dump(db, "u").head(2)) == "x", s"cap=$cap")
      // probed error texts: DO NOTHING takes no WHERE; a bad WHERE
      // column errors at prepare even with no conflict
      assert(err(db, "INSERT INTO w VALUES (1, 2, 'z') " +
        "ON CONFLICT(id) DO NOTHING WHERE a > 1") ==
        "near \"WHERE\": syntax error")
      assert(err(db, "INSERT INTO w VALUES (50, 2, 'z') " +
        "ON CONFLICT(id) DO UPDATE SET a = 9 WHERE qq > 0") ==
        "no such column: qq")
    }
  }

  test("per-candidate immediate checks: later updates can't mask violations") {
    // probed live (fuzz seed 360810): cand2 inserts a=2 colliding with an
    // existing row; cand3's DO UPDATE then rewrites row 10's a to 5 — a
    // FINAL-state scan sees no duplicate, but SQLite checks row-at-a-time
    // and fails the statement at cand2.
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      ok(db, "CREATE TABLE m (id INTEGER PRIMARY KEY, a INTEGER UNIQUE, " +
        "b TEXT)")
      ok(db, "INSERT INTO m VALUES (11, 5, 'eli'), (12, 2, 'dee')")
      assert(err(db, "INSERT INTO m VALUES " +
        "(11, 9, 'BO'), (10, 2, 'eli2'), (10, 5, 'cy') " +
        "ON CONFLICT(id) DO UPDATE SET a = excluded.a " +
        "WHERE excluded.a > a") == "UNIQUE constraint failed: m.a",
        s"cap=$cap")
      // statement undone wholesale
      assert(dump(db, "m").map(_(1).asInstanceOf[Value.Integer].v) ==
        Seq(5L, 2L), s"cap=$cap")
      // the same masking through two DO UPDATEs of one row: cand2 writes
      // NULL into a NOT NULL column, cand3 repairs it — SQLite reports
      // the NOT NULL failure at cand2 (probed)
      ok(db, "CREATE TABLE n (id INTEGER PRIMARY KEY, a INTEGER NOT NULL)")
      ok(db, "INSERT INTO n VALUES (1, 5)")
      assert(err(db, "INSERT INTO n VALUES (1, 7), (1, 8) " +
        "ON CONFLICT(id) DO UPDATE SET a = " +
        "CASE WHEN excluded.a = 7 THEN NULL ELSE excluded.a END") ==
        "NOT NULL constraint failed: n.a", s"cap=$cap")
    }
  }

  test("PK + UNIQUE multi-clause and composite targets") {
    caps.foreach { cap =>
      val db = GraftDb.openInMemory(spark, cap)
      ok(db, "CREATE TABLE p (id INTEGER PRIMARY KEY, a INTEGER UNIQUE, " +
        "c TEXT)")
      ok(db, "INSERT INTO p VALUES (1, 10, 'x')")
      // probed: violates id+a; clause order decides
      ok(db, "INSERT INTO p VALUES (1, 10, 'B') " +
        "ON CONFLICT(id) DO UPDATE SET c = 'hitPK' " +
        "ON CONFLICT(a) DO UPDATE SET c = 'hitA'")
      assert(text(dump(db, "p").head(2)) == "hitPK", s"cap=$cap")
      ok(db, "CREATE TABLE q (a INTEGER, b INTEGER, c TEXT, UNIQUE(a, b))")
      ok(db, "INSERT INTO q VALUES (1, 10, 'x')")
      ok(db, "INSERT INTO q VALUES (1, 10, 'B') " +
        "ON CONFLICT(a, b) DO UPDATE SET c = 'hit' ON CONFLICT DO NOTHING")
      assert(text(dump(db, "q").head(2)) == "hit", s"cap=$cap")
    }
  }
}
