package graft.engine

import graft.SparkSpec
import graft.command._

/** Golden-parity tests for explicit transactions, AFTER ROW triggers and
  * value-returning PRAGMAs. Every expected value and error string below was
  * captured live from SQLite 3.40.1 (python3 sqlite3, isolation_level=None)
  * — the same ground-truth method as GoldenParitySpec.
  */
class TriggerTxSpec extends SparkSpec {

  private def memDb: GraftDb = GraftDb.openInMemory(spark)

  private def exec(db: GraftDb, sql: String): String =
    Json.responses(db.executeStringStmt(sql).fold(e => fail(e), identity))
  private def query(db: GraftDb, sql: String): String =
    Json.rowsSeq(db.queryStringStmt(sql).fold(e => fail(e), identity))
  private def execErr(db: GraftDb, sql: String): String = {
    val rs = db.executeStringStmt(sql).fold(e => fail(e), identity)
    rs.head.error

  }

  // ---------- explicit BEGIN/COMMIT/ROLLBACK --------------------------------

  test("BEGIN/COMMIT commits; mid-tx statement errors don't abort the tx (sqlite)") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    exec(db, "BEGIN")
    exec(db, "INSERT INTO t VALUES (6, 'y')")
    assert(execErr(db, "INSERT INTO t VALUES (6, 'dup')") ==
      "UNIQUE constraint failed: t.id")
    exec(db, "INSERT INTO t VALUES (7, 'z')")
    exec(db, "COMMIT")
    assert(query(db, "SELECT id FROM t ORDER BY id") ==
      """[{"columns":["id"],"types":["integer"],"values":[[6],[7]]}]""")
  }

  test("ROLLBACK discards; uncommitted state visible to same-connection reads") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY)")
    exec(db, "BEGIN")
    exec(db, "INSERT INTO t VALUES (8)")
    // SQLite: the connection's own reads see the open tx
    assert(query(db, "SELECT COUNT(*) AS n FROM t").contains("[[1]]"))
    exec(db, "ROLLBACK")
    assert(query(db, "SELECT COUNT(*) AS n FROM t").contains("[[0]]"))
  }

  test("transaction statement error strings (sqlite 3.40)") {
    val db = memDb
    exec(db, "BEGIN")
    assert(execErr(db, "BEGIN") ==
      "cannot start a transaction within a transaction")
    assert(execErr(db, "BEGIN TRANSACTION") ==
      "cannot start a transaction within a transaction")
    exec(db, "COMMIT")
    assert(execErr(db, "COMMIT") == "cannot commit - no transaction is active")
    assert(execErr(db, "END") == "cannot commit - no transaction is active")
    assert(execErr(db, "ROLLBACK") ==
      "cannot rollback - no transaction is active")
    exec(db, "BEGIN IMMEDIATE") // deferred/immediate/exclusive all accepted
    exec(db, "END")             // END == COMMIT
    assert(execErr(db, "ROLLBACK TO sp1") == "no such savepoint: sp1")
  }

  test("explicit tx spans execute batches; request-level tx inside it is nested-BEGIN") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY)")
    exec(db, "BEGIN")           // batch 1
    exec(db, "INSERT INTO t VALUES (1)") // batch 2 joins the open tx
    assert(db.execute(Request(transaction = true,
      Seq(Statement("INSERT INTO t VALUES (2)")))) ==
      Left("cannot start a transaction within a transaction"))
    exec(db, "COMMIT")
    assert(query(db, "SELECT id FROM t").contains("[[1]]"))
  }

  test("open tx rolls back on restart (crash semantics)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-tx").toString
    val db = GraftDb.open(spark, s"$tmp/d.db").fold(e => fail(e), identity)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY)")
    exec(db, "INSERT INTO t VALUES (1)")
    exec(db, "BEGIN")
    exec(db, "INSERT INTO t VALUES (2)")
    db.close()
    val db2 = GraftDb.open(spark, s"$tmp/d.db").fold(e => fail(e), identity)
    // the dead connection's tx is gone; committed state survives
    assert(query(db2, "SELECT id FROM t ORDER BY id").contains("[[1]]"))
    assert(execErr(db2, "COMMIT") == "cannot commit - no transaction is active")
  }

  test("savepoints: implicit tx, nested rollback-to/release semantics (sqlite 3.40)") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY)")
    // captured live: SAVEPOINT a; INSERT 1; SAVEPOINT b; INSERT 2;
    // ROLLBACK TO b; INSERT 3; RELEASE b; RELEASE a  ->  t = [1, 3]
    exec(db, "SAVEPOINT a")
    exec(db, "INSERT INTO t VALUES (1)")
    exec(db, "SAVEPOINT b")
    exec(db, "INSERT INTO t VALUES (2)")
    exec(db, "ROLLBACK TO b")
    exec(db, "INSERT INTO t VALUES (3)")
    exec(db, "RELEASE b")
    assert(execErr(db, "ROLLBACK TO b") == "no such savepoint: b")
    exec(db, "RELEASE a") // outermost release of a savepoint-started tx commits
    assert(query(db, "SELECT id FROM t ORDER BY id").contains("[[1],[3]]"))
    assert(execErr(db, "ROLLBACK") ==
      "cannot rollback - no transaction is active")
  }

  test("savepoints inside explicit BEGIN; full ROLLBACK discards them (sqlite 3.40)") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY)")
    exec(db, "BEGIN")
    exec(db, "SAVEPOINT s1")
    exec(db, "INSERT INTO t VALUES (10)")
    exec(db, "ROLLBACK TO s1")
    exec(db, "RELEASE s1") // does NOT commit the explicit tx
    exec(db, "INSERT INTO t VALUES (11)")
    exec(db, "COMMIT")
    assert(query(db, "SELECT id FROM t").contains("[[11]]"))
    assert(execErr(db, "ROLLBACK TO nope") == "no such savepoint: nope")
    assert(execErr(db, "RELEASE nope") == "no such savepoint: nope")
    // full ROLLBACK of a savepoint-started tx discards everything
    exec(db, "SAVEPOINT x")
    exec(db, "INSERT INTO t VALUES (20)")
    exec(db, "ROLLBACK")
    assert(query(db, "SELECT COUNT(*) AS n FROM t WHERE id = 20").contains("[[0]]"))
    assert(execErr(db, "RELEASE x") == "no such savepoint: x")
  }

  test("duplicate savepoint names: most recent wins (sqlite 3.40)") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY)")
    exec(db, "SAVEPOINT d")
    exec(db, "INSERT INTO t VALUES (30)")
    exec(db, "SAVEPOINT d")
    exec(db, "INSERT INTO t VALUES (31)")
    exec(db, "ROLLBACK TO d") // rolls to the INNER d: 30 stays, 31 gone
    assert(query(db, "SELECT id FROM t WHERE id >= 30").contains("[[30]]"))
    exec(db, "ROLLBACK")
  }

  // ---------- AFTER ROW triggers --------------------------------------------

  test("audit-log trigger parity: insert/update/delete with NEW/OLD (sqlite 3.40)") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, name TEXT, qty INTEGER)")
    exec(db, "CREATE TABLE audit (op TEXT, id INTEGER, info TEXT)")
    exec(db, "CREATE TRIGGER tr_ins AFTER INSERT ON t BEGIN INSERT INTO audit VALUES ('I', NEW.id, NEW.name); END")
    exec(db, "CREATE TRIGGER tr_upd AFTER UPDATE ON t BEGIN INSERT INTO audit VALUES ('U', OLD.id, OLD.name || '->' || NEW.name); END")
    exec(db, "CREATE TRIGGER tr_del AFTER DELETE ON t BEGIN INSERT INTO audit VALUES ('D', OLD.id, OLD.name); END")
    exec(db, "INSERT INTO t VALUES (1, 'a', 10), (2, 'b', 20)")
    exec(db, "UPDATE t SET name = 'bb' WHERE id = 2")
    exec(db, "DELETE FROM t WHERE id = 1")
    // captured live: [('I',1,'a'),('I',2,'b'),('U',2,'b->bb'),('D',1,'a')]
    assert(query(db, "SELECT * FROM audit") ==
      """[{"columns":["op","id","info"],"types":["text","integer","text"],""" +
        """"values":[["I",1,"a"],["I",2,"b"],["U",2,"b->bb"],["D",1,"a"]]}]""")
  }

  test("trigger DDL error strings + DROP TRIGGER (sqlite 3.40)") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY)")
    exec(db, "CREATE TRIGGER tr1 AFTER INSERT ON t BEGIN SELECT 1; END")
    assert(execErr(db, "CREATE TRIGGER tr1 AFTER INSERT ON t BEGIN SELECT 1; END") ==
      "trigger tr1 already exists")
    assert(!exec(db, "CREATE TRIGGER IF NOT EXISTS tr1 AFTER INSERT ON t BEGIN SELECT 1; END")
      .contains("error"))
    assert(execErr(db, "CREATE TRIGGER tr2 AFTER INSERT ON missing BEGIN SELECT 1; END") ==
      "no such table: main.missing")
    exec(db, "DROP TRIGGER tr1")
    assert(execErr(db, "DROP TRIGGER tr1") == "no such trigger: tr1")
    assert(!exec(db, "DROP TRIGGER IF EXISTS tr1").contains("error"))
    // explicit refusals for the unsupported subset (clearer than a parse error)
    assert(execErr(db, "CREATE TRIGGER tb BEFORE INSERT ON t BEGIN SELECT 1; END") ==
      "only AFTER triggers are supported")
  }

  test("multi-row + multi-trigger firing order: row-outer, reverse creation (sqlite 3.40)") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    exec(db, "CREATE TABLE log (seq INTEGER PRIMARY KEY, tag TEXT)")
    exec(db, "CREATE TRIGGER trA AFTER INSERT ON t BEGIN INSERT INTO log(tag) VALUES ('A:' || NEW.id); END")
    exec(db, "CREATE TRIGGER trB AFTER INSERT ON t BEGIN INSERT INTO log(tag) VALUES ('B:' || NEW.id); END")
    exec(db, "INSERT INTO t VALUES (1, 'x'), (2, 'y')")
    // captured live: B:1, A:1, B:2, A:2
    assert(query(db, "SELECT tag FROM log ORDER BY seq").contains(
      """[["B:1"],["A:1"],["B:2"],["A:2"]]"""))
    // upsert's DO UPDATE path fires the UPDATE trigger (captured live)
    exec(db, "CREATE TRIGGER trU AFTER UPDATE ON t BEGIN INSERT INTO log(tag) VALUES ('U:' || OLD.v || '>' || NEW.v); END")
    exec(db, "INSERT INTO t VALUES (1, 'z') ON CONFLICT(id) DO UPDATE SET v = 'zz'")
    assert(query(db, "SELECT tag FROM log ORDER BY seq").contains("U:x>zz"))
    // OR REPLACE fires INSERT triggers for the replaced row, never DELETE
    exec(db, "CREATE TRIGGER trD AFTER DELETE ON t BEGIN INSERT INTO log(tag) VALUES ('D:' || OLD.id); END")
    exec(db, "INSERT OR REPLACE INTO t VALUES (2, 'r')")
    val tail = query(db, "SELECT tag FROM log ORDER BY seq")
    assert(tail.contains("""["B:2"],["A:2"]]""") && !tail.contains("D:2"), tail)
  }

  test("trigger-body error rolls back the outer statement (sqlite 3.40)") {
    val db = memDb
    exec(db, "CREATE TABLE u (id INTEGER PRIMARY KEY)")
    exec(db, "CREATE TRIGGER tr_err AFTER INSERT ON u BEGIN INSERT INTO missing VALUES (1); END")
    // SQLite says "no such table: main.missing" here (trigger-program
    // context adds the schema prefix); the engine reports its regular
    // unprefixed form — same failure, same rollback
    assert(execErr(db, "INSERT INTO u VALUES (1)") == "no such table: missing")
    assert(query(db, "SELECT COUNT(*) AS n FROM u").contains("[[0]]"))
  }

  test("outer last_insert_id survives trigger-body inserts (sqlite 3.40)") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    exec(db, "CREATE TABLE log (lid INTEGER PRIMARY KEY, tid INTEGER)")
    exec(db, "INSERT INTO log VALUES (100, 0)")
    exec(db, "CREATE TRIGGER tr AFTER INSERT ON t BEGIN INSERT INTO log(tid) VALUES (NEW.id); END")
    // captured live: last_insert_rowid = 5 (outer), log gains (101, 5)
    assert(exec(db, "INSERT INTO t VALUES (5, 'x')") ==
      """[{"last_insert_id":5,"rows_affected":1}]""")
    assert(query(db, "SELECT * FROM log ORDER BY lid").contains("[101,5]"))
  }

  test("a trigger's DML fires other tables' triggers but never itself (sqlite 3.40)") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER)")
    exec(db, "CREATE TABLE a (id INTEGER)")
    exec(db, "CREATE TABLE b (id INTEGER)")
    exec(db, "CREATE TRIGGER tr1 AFTER INSERT ON t BEGIN INSERT INTO a VALUES (NEW.id); END")
    exec(db, "CREATE TRIGGER tr2 AFTER INSERT ON a BEGIN INSERT INTO b VALUES (NEW.id * 10); END")
    exec(db, "INSERT INTO t VALUES (1)")
    // captured live: a=[1], b=[10] even with recursive_triggers=0
    assert(query(db, "SELECT * FROM a").contains("[[1]]"))
    assert(query(db, "SELECT * FROM b").contains("[[10]]"))
    // self-recursion is suppressed (SQLite recursive_triggers=OFF default)
    exec(db, "CREATE TABLE c (id INTEGER)")
    exec(db, "CREATE TRIGGER tr3 AFTER INSERT ON c BEGIN INSERT INTO c VALUES (NEW.id + 1); END")
    exec(db, "INSERT INTO c VALUES (1)")
    assert(query(db, "SELECT COUNT(*) AS n FROM c").contains("[[2]]"))
  }

  test("REPLACE re-inserting IDENTICAL values still fires INSERT (sqlite 3.40)") {
    // probed live (fuzz seed 360645): same-key INSERT OR REPLACE with a
    // byte-identical row is still a displacement + insert — the INSERT
    // trigger fires; no DELETE trigger fires (recursive_triggers off).
    // A before/after value diff cannot see this; the REPLACE branch
    // tapes its candidates instead.
    val db = memDb
    exec(db, "CREATE TABLE t0 (id INTEGER PRIMARY KEY, a INTEGER)")
    exec(db, "CREATE TABLE log (lid INTEGER PRIMARY KEY, tag TEXT)")
    exec(db, "CREATE TRIGGER ti AFTER INSERT ON t0 BEGIN " +
      "INSERT INTO log(tag) VALUES ('I:' || NEW.id); END")
    exec(db, "CREATE TRIGGER td AFTER DELETE ON t0 BEGIN " +
      "INSERT INTO log(tag) VALUES ('D:' || OLD.id); END")
    exec(db, "INSERT INTO t0 VALUES (5, 2)")
    exec(db, "DELETE FROM log")
    // probed: identical values -> log [I:5] only
    exec(db, "INSERT OR REPLACE INTO t0 VALUES (5, 2)")
    assert(query(db, "SELECT tag FROM log ORDER BY lid") ==
      Json.rowsSeq(Seq(graft.command.RowsResult(Seq("tag"), Seq("text"),
        Seq(Seq(graft.command.Value.Text("I:5")))))))
  }

  test("DROP TABLE drops its triggers (sqlite 3.40)") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER)")
    exec(db, "CREATE TABLE audit (id INTEGER)")
    exec(db, "CREATE TRIGGER tr AFTER INSERT ON t BEGIN INSERT INTO audit VALUES (NEW.id); END")
    exec(db, "DROP TABLE t")
    exec(db, "CREATE TABLE t (id INTEGER)")
    exec(db, "INSERT INTO t VALUES (9)")
    assert(query(db, "SELECT COUNT(*) AS n FROM audit").contains("[[0]]"))
  }

  test("triggers survive restart via the manifest") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-trg").toString
    val db = GraftDb.open(spark, s"$tmp/d.db").fold(e => fail(e), identity)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY)")
    exec(db, "CREATE TABLE audit (id INTEGER)")
    exec(db, "CREATE TRIGGER tr AFTER INSERT ON t BEGIN INSERT INTO audit VALUES (NEW.id); END")
    db.checkpoint().fold(e => fail(e), identity) // manifest now carries the trigger
    db.close()
    val db2 = GraftDb.open(spark, s"$tmp/d.db").fold(e => fail(e), identity)
    exec(db2, "INSERT INTO t VALUES (3)")
    assert(query(db2, "SELECT id FROM audit").contains("[[3]]"))
  }

  // ---------- value-returning PRAGMAs ---------------------------------------

  test("ATTACH/DETACH rejected with a specific reason, not a generic parse error") {
    val db = memDb
    assert(execErr(db, "ATTACH DATABASE 'x.db' AS other").startsWith(
      "ATTACH DATABASE is not supported"))
    assert(execErr(db, "DETACH DATABASE other").startsWith(
      "DETACH DATABASE is not supported"))
  }

  test("value PRAGMAs answer with one row (sqlite 3.40 shapes)") {
    val db = memDb
    // captured live on :memory:: journal_mode='memory', page_size=4096,
    // user_version=0 then settable
    assert(query(db, "PRAGMA journal_mode") ==
      """[{"columns":["journal_mode"],"types":["text"],"values":[["memory"]]}]""")
    assert(query(db, "PRAGMA page_size") ==
      """[{"columns":["page_size"],"types":["integer"],"values":[[4096]]}]""")
    assert(query(db, "PRAGMA user_version") ==
      """[{"columns":["user_version"],"types":["integer"],"values":[[0]]}]""")
    exec(db, "PRAGMA user_version = 7")
    assert(query(db, "PRAGMA user_version").contains("[[7]]"))
  }

  test("schema_version counts DDL, ignores DML; REINDEX accepted (sqlite 3.40)") {
    val db = memDb
    assert(query(db, "PRAGMA schema_version").contains("[[0]]"))
    exec(db, "CREATE TABLE t (id INTEGER)")
    assert(query(db, "PRAGMA schema_version").contains("[[1]]"))
    exec(db, "CREATE INDEX i ON t(id)")
    assert(query(db, "PRAGMA schema_version").contains("[[2]]"))
    exec(db, "ALTER TABLE t ADD COLUMN v TEXT")
    assert(query(db, "PRAGMA schema_version").contains("[[3]]"))
    exec(db, "INSERT INTO t VALUES (1, 'x')")
    assert(query(db, "PRAGMA schema_version").contains("[[3]]"))
    exec(db, "DROP TABLE t")
    assert(query(db, "PRAGMA schema_version").contains("[[4]]"))
    assert(!exec(db, "REINDEX").contains("error"))
    assert(query(db, "PRAGMA schema_version").contains("[[4]]"))
  }

  test("user_version persists across restart; file db reports wal journaling") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-uv").toString
    val db = GraftDb.open(spark, s"$tmp/d.db").fold(e => fail(e), identity)
    exec(db, "PRAGMA user_version = 42")
    db.checkpoint().fold(e => fail(e), identity)
    assert(query(db, "PRAGMA journal_mode").contains("wal"))
    db.close()
    val db2 = GraftDb.open(spark, s"$tmp/d.db").fold(e => fail(e), identity)
    assert(query(db2, "PRAGMA user_version").contains("[[42]]"))
  }
}
