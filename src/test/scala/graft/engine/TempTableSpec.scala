package graft.engine

import graft.SparkSpec
import graft.command._
import java.nio.file.Files

/** TEMP table connection scoping across durability boundaries (ADVICE
  * r14, high): a temp table must never leak into the snapshot/manifest,
  * never survive a restart as a permanent table, never appear in
  * sqlite_master, and journal-replayed temp state must be dropped at the
  * end of recovery — the contract TableState documents and
  * [[GraftDb.tempMixError]] enforces for replication. */
class TempTableSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-temp").toString

  private def ok(db: GraftDb, sql: String): Response = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
    r
  }

  private def q(db: GraftDb, sql: String): Either[String, Seq[RowsResult]] =
    db.queryStringStmt(sql)

  test("temp table works on the live connection, visible at every level") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TEMP TABLE scratch (x INTEGER)")
    ok(db, "INSERT INTO scratch VALUES (1),(2),(3)")
    val r = q(db, "SELECT count(*) AS n FROM scratch")
      .fold(e => fail(e), identity).head
    assert(r.values.head.head == Value.Integer(3))
    db.close()
  }

  test("checkpoint excludes temp tables; restart never resurrects one") {
    val root = tmp()
    val db = GraftDb.open(spark, root).fold(e => fail(e), identity)
    ok(db, "CREATE TABLE perm (k INTEGER)")
    ok(db, "INSERT INTO perm VALUES (7)")
    ok(db, "CREATE TEMPORARY TABLE scratch (x INTEGER)")
    ok(db, "INSERT INTO scratch VALUES (1),(2)")
    db.checkpoint().fold(e => fail(e), identity)
    // live connection still sees it after the checkpoint
    assert(q(db, "SELECT count(*) FROM scratch").isRight)
    // the manifest must not carry it
    val manifest = Files.readString(
      java.nio.file.Paths.get(root, "manifest.json"))
    assert(!manifest.toLowerCase.contains("scratch"), manifest)
    db.close()

    val db2 = GraftDb.open(spark, root).fold(e => fail(e), identity)
    val gone = q(db2, "SELECT * FROM scratch")
    assert(gone.isLeft && gone.left.exists(_.contains("no such table")), gone)
    // the permanent table recovered intact
    val perm = q(db2, "SELECT k FROM perm").fold(e => fail(e), identity).head
    assert(perm.values == Seq(Seq(Value.Integer(7))))
    db2.close()
  }

  test("journal-replayed temp tables are dropped at the end of recovery") {
    val root = tmp()
    val db = GraftDb.open(spark, root).fold(e => fail(e), identity)
    ok(db, "CREATE TABLE perm (k INTEGER)")
    // no checkpoint: everything lives in the journal
    ok(db, "CREATE TEMP TABLE scratch (x INTEGER)")
    ok(db, "INSERT INTO scratch VALUES (42)")
    ok(db, "INSERT INTO perm VALUES (1)")
    db.close()

    val db2 = GraftDb.open(spark, root).fold(e => fail(e), identity)
    val gone = q(db2, "SELECT * FROM scratch")
    assert(gone.isLeft && gone.left.exists(_.contains("no such table")), gone)
    val perm = q(db2, "SELECT k FROM perm").fold(e => fail(e), identity).head
    assert(perm.values == Seq(Seq(Value.Integer(1))))
    db2.close()
  }

  test("sqlite_master hides temp tables (SQLite's separate temp schema)") {
    val db = GraftDb.openInMemory(spark, 500)
    ok(db, "CREATE TABLE perm (k INTEGER)")
    ok(db, "CREATE TEMP TABLE scratch (x INTEGER)")
    val names = q(db, "SELECT name FROM sqlite_master WHERE type='table'")
      .fold(e => fail(e), identity).head.values.map(_.head)
    assert(names.contains(Value.Text("perm")), names)
    assert(!names.contains(Value.Text("scratch")), names)
    // the temp catalog lists it instead, with the TEMP keyword stripped
    // from the stored sql (probed live)
    val tm = q(db,
      "SELECT type, name, tbl_name, sql FROM sqlite_temp_master")
      .fold(e => fail(e), identity).head
    assert(tm.values.map(_.map {
      case Value.Text(s) => s
      case v => v
    }) == Seq(Seq("table", "scratch", "scratch",
      "CREATE TABLE scratch (x INTEGER)")), tm)
    // empty when no temp tables exist (probed: empty result set)
    val db2 = GraftDb.openInMemory(spark, 500)
    db2.executeStringStmt("CREATE TABLE t (x INTEGER)")
    val empty = q(db2, "SELECT * FROM sqlite_temp_master")
      .fold(e => fail(e), identity).head
    assert(empty.values.isEmpty, empty)
    db2.close()
    db.close()
  }
}
