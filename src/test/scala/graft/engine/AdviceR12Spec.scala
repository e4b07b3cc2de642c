package graft.engine

import graft.SparkSpec
import graft.command.Value

/** Regressions from the round-12 advisor review (ADVICE.md r12) — each
  * test pins the SQLite-verified behavior (probed live on 3.40.1):
  *  1. keyword detection uses SQL identifier boundaries ('_' is a word
  *     char), so `last_update` / `col_returning` never misclassify a
  *     statement;
  *  2. journal replay only advances the streaming watermark for stamped
  *     transactions that APPLIED (a failed micro-batch must stay
  *     re-deliverable);
  *  3. RETURNING accepts the scalar two-plus-argument min/max overloads;
  *  4. date('NOW') is rejected case-insensitively;
  *  5. REPLACE on a spilled table fires INSERT triggers in candidate
  *     order even when fresh and overwritten rowids interleave. */
class AdviceR12Spec extends SparkSpec {

  private def ok(db: GraftDb, sql: String): Unit = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
  }

  private def err(db: GraftDb, sql: String): String = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.nonEmpty, s"expected an error for [$sql]")
    r.error
  }

  private def rows(db: GraftDb, sql: String): Seq[Seq[Value]] =
    db.queryStringStmt(sql).fold(e => fail(e), _.head.values)

  private def longOf(db: GraftDb, sql: String): Long =
    rows(db, sql).head.head.asInstanceOf[Value.Integer].v

  private def texts(db: GraftDb, sql: String): Seq[String] =
    rows(db, sql).map(_.head.asInstanceOf[Value.Text].v)

  test("identifiers containing DML keywords don't misclassify WITH queries") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE t (x INTEGER, last_update INTEGER)")
    ok(db, "INSERT INTO t VALUES (1, 5), (2, 3)")
    // probed: SQLite → [(2,), (1,)]; before the fix this was misread as
    // CTE-prefixed DML and failed with 'near \"UPDATE\": syntax error'
    val r = db.queryStringStmt("WITH c AS (SELECT x, last_update FROM t) " +
      "SELECT x AS last_update FROM c ORDER BY last_update DESC")
      .fold(e => fail(e), _.head)
    assert(r.values.map(_.head.asInstanceOf[Value.Integer].v) == Seq(2L, 1L))
    // a to_delete identifier must not read as a DELETE tail either
    ok(db, "CREATE TABLE d (to_delete INTEGER)")
    ok(db, "INSERT INTO d VALUES (7)")
    assert(longOf(db, "WITH c AS (SELECT to_delete FROM d) " +
      "SELECT to_delete FROM c") == 7L)
  }

  test("identifiers containing RETURNING don't split mid-identifier") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE r (col_returning INTEGER, returning_flag INTEGER)")
    ok(db, "INSERT INTO r VALUES (1, 2)")
    ok(db, "UPDATE r SET col_returning = 9 WHERE returning_flag = 2")
    assert(longOf(db, "SELECT col_returning FROM r") == 9L)
    // a REAL RETURNING clause after such identifiers still splits
    val ret = db.queryStringStmt("INSERT INTO r(col_returning, " +
      "returning_flag) VALUES (3, 4) RETURNING col_returning")
      .fold(e => fail(e), _.head)
    assert(ret.values == Seq(Seq(Value.Integer(3L))))
  }

  test("RETURNING accepts scalar multi-arg min/max, rejects aggregates") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE t (a INTEGER, b INTEGER)")
    // probed 3.40.1: RETURNING max(a,b) → 2; max(a,b,7) → 7
    val r1 = db.queryStringStmt(
      "INSERT INTO t VALUES (1, 2) RETURNING max(a, b)")
      .fold(e => fail(e), _.head)
    assert(r1.values == Seq(Seq(Value.Integer(2L))))
    val r2 = db.queryStringStmt(
      "INSERT INTO t VALUES (1, 2) RETURNING max(a, b, 7)")
      .fold(e => fail(e), _.head)
    assert(r2.values == Seq(Seq(Value.Integer(7L))))
    // the one-argument form stays the aggregate and is still rejected,
    // including when a scalar form appears earlier in the list
    val e1 = db.queryStringStmt("INSERT INTO t VALUES (1, 2) RETURNING min(a)")
      .fold(identity, r => fail(s"expected rejection, got $r"))
    assert(e1.contains("misuse of aggregate function min()"), e1)
    val e2 = db.queryStringStmt(
      "INSERT INTO t VALUES (1, 2) RETURNING min(a, b), max(b)")
      .fold(identity, r => fail(s"expected rejection, got $r"))
    assert(e2.contains("misuse of aggregate function max()"), e2)
  }

  test("date('NOW') is rejected case-insensitively") {
    val db = GraftDb.openInMemory(spark, 500)
    for (v <- Seq("NOW", "Now", "nOw")) {
      val e = db.queryStringStmt(s"SELECT date('$v')")
        .fold(identity, r => fail(s"expected rejection for '$v', got $r"))
      assert(e.contains("non-deterministic time value 'now'"), s"'$v' → $e")
    }
  }

  test("spilled REPLACE fires INSERT triggers in candidate order") {
    val db = GraftDb.openInMemory(spark, 200)
    ok(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    ok(db, "INSERT INTO t SELECT id + 1, 'r' || CAST(id AS STRING) " +
      "FROM range(300)")
    assert(db.isSpilled("t"))
    ok(db, "CREATE TABLE audit (s TEXT)")
    ok(db, "CREATE TRIGGER ti AFTER INSERT ON t BEGIN " +
      "INSERT INTO audit VALUES ('i' || NEW.id || NEW.v); END")
    // candidates interleave fresh rowids (1000, 1001) with overwrites of
    // existing ones (2, 1): probed 3.40.1 firing order is candidate order
    ok(db, "INSERT OR REPLACE INTO t VALUES " +
      "(1000, 'w'), (2, 'x'), (1001, 'y'), (1, 'z')")
    assert(texts(db, "SELECT s FROM audit") ==
      Seq("i1000w", "i2x", "i1001y", "i1z"))
    assert(longOf(db, "SELECT COUNT(*) FROM t") == 302L)
    assert(texts(db, "SELECT v FROM t WHERE id IN (1, 2) ORDER BY id") ==
      Seq("z", "x"))
  }

  test("journal replay does not advance the watermark for a failed batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-adv-")
    def open(): GraftDb = GraftDb.open(spark, dir.resolve("db").toString, 500)
      .fold(e => fail(e), identity)
    val db = open()
    ok(db, "CREATE TABLE ev (k INTEGER PRIMARY KEY, tag TEXT)")
    assert(db.ingestBatch("ev", 0L, Seq(Seq(1L, "a"))) == Right(1L))
    // batch 1 violates the PK: the journal line is stamped (append happens
    // before execution) but the tx fails — the watermark must NOT advance
    assert(db.ingestBatch("ev", 1L, Seq(Seq(1L, "dup"))).isLeft)
    assert(db.streamBatchWatermark == 0L)
    db.close()
    // recovery replays the stamped-but-failed line; before the fix it
    // advanced the watermark anyway, silently swallowing the source's
    // re-delivery of batch 1
    val db2 = open()
    assert(db2.streamBatchWatermark == 0L,
      "a failed stamped batch must stay re-deliverable after recovery")
    assert(db2.ingestBatch("ev", 1L, Seq(Seq(2L, "fixed"))) == Right(1L))
    assert(longOf(db2, "SELECT COUNT(*) FROM ev") == 2L)
    assert(db2.streamBatchWatermark == 1L)
    db2.close()
  }
}
