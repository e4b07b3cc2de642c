package graft.engine

import graft.SparkSpec
import graft.command._

/** 1:1 port of the reference's golden-JSON test suite
  * (/root/reference/db/src/db.rs:328-827): same SQL, same expected JSON
  * envelope byte-for-byte.
  */
class GoldenParitySpec extends SparkSpec {

  private def memDb: GraftDb = GraftDb.openInMemory(spark)

  private def exec(db: GraftDb, sql: String): String =
    Json.responses(db.executeStringStmt(sql).fold(e => fail(e), identity))
  private def query(db: GraftDb, sql: String): String =
    Json.rowsSeq(db.queryStringStmt(sql).fold(e => fail(e), identity))

  test("initialise db: open/close/double-close (db.rs:332-348)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdb").toString
    val db = GraftDb.open(spark, s"$tmp/sample.db").fold(e => fail(e), identity)
    assert(db.close().isRight)
    assert(db.close() == Left("db connection is already closed"))
    assert(GraftDb.open(spark, s"$tmp/etc/nope/sample.db") ==
      Left(s"unable to open database file: $tmp/etc/nope/sample.db"))
  }

  test("exclusive root lock: a second open on a live root is refused") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdb").toString
    val db = GraftDb.open(spark, s"$tmp/d.db").fold(e => fail(e), identity)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY)")
    // a concurrent open (same JVM or another process) must not be able to
    // sweep the live instance's big/ bucket files — refuse it (ADVICE r10)
    assert(GraftDb.open(spark, s"$tmp/d.db") ==
      Left(s"database is locked: $tmp/d.db"))
    // close releases the lock; the root reopens cleanly with its data
    assert(db.close().isRight)
    val db2 = GraftDb.open(spark, s"$tmp/d.db").fold(e => fail(e), identity)
    assert(query(db2, "SELECT COUNT(*) FROM t").contains("[[0]]"))
    db2.close()
  }

  test("fk constraints toggle (db.rs:350-376)") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, ref INTEGER REFERENCES foo(id))")
    db.enableFkConstraints(false)
    assert(!db.fkConstraints())
    assert(exec(db, "INSERT INTO foo(id, ref) VALUES(1, 2)") ==
      """[{"last_insert_id":1,"rows_affected":1}]""")
    db.enableFkConstraints(true)
    assert(db.fkConstraints())
    assert(exec(db, "INSERT INTO foo(id, ref) VALUES(1, 3)") ==
      """[{"error":"UNIQUE constraint failed: foo.id"}]""")
  }

  test("empty statement ok (db.rs:378-382)") {
    val db = memDb
    assert(db.executeStringStmt("").isRight)
  }

  test("execute success: insert + update responses (db.rs:384-402)") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    assert(exec(db, """INSERT INTO foo(name) VALUES("fiona")""") ==
      """[{"last_insert_id":1,"rows_affected":1}]""")
    assert(exec(db, """UPDATE foo SET name="dana" WHERE ID=1""") ==
      """[{"last_insert_id":1,"rows_affected":1}]""")
  }

  test("simple string stmts: select/filter/order/dup columns (db.rs:404-447)") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    exec(db, """INSERT INTO foo(name) VALUES("fiona")""")
    exec(db, """INSERT INTO foo(name) VALUES("aoife")""")

    assert(query(db, "SELECT * FROM foo") ==
      """[{"columns":["id","name"],"types":["integer","text"],"values":[[1,"fiona"],[2,"aoife"]]}]""")
    assert(query(db, """SELECT * FROM foo WHERE name="aoife"""") ==
      """[{"columns":["id","name"],"types":["integer","text"],"values":[[2,"aoife"]]}]""")
    assert(query(db, """SELECT * FROM foo WHERE name="unknown"""") ==
      """[{"columns":[],"types":[],"values":[]}]""")
    assert(query(db, "SELECT * FROM foo ORDER BY name") ==
      """[{"columns":["id","name"],"types":["integer","text"],"values":[[2,"aoife"],[1,"fiona"]]}]""")
    assert(query(db, "SELECT *,name FROM foo") ==
      """[{"columns":["id","name","name"],"types":["integer","text","text"],"values":[[1,"fiona","fiona"],[2,"aoife","aoife"]]}]""")
  }

  test("type affinity ddl accepted (db.rs:449-463)") {
    val db = memDb
    exec(db, "CREATE TABLE foo (c0 VARCHAR(36), c1 JSON, c2 NCHAR, c3 NVARCHAR, c4 CLOB)")
    assert(exec(db,
      """INSERT INTO foo(c0, c1, c2, c3, c4) VALUES("fiona", '{"mittens": "foobar"}', "bob", "dana", "declan")""")
      .contains("rows_affected"))
    assert(query(db, "SELECT c0, c2 FROM foo") ==
      """[{"columns":["c0","c2"],"types":["text","text"],"values":[["fiona","bob"]]}]""")
  }

  test("inner join golden (db.rs:465-490)") {
    val db = memDb
    exec(db, "CREATE TABLE names (id INTEGER NOT NULL PRIMARY KEY, name TEXT, ssn TEXT)")
    exec(db, "CREATE TABLE staff (id INTEGER NOT NULL PRIMARY KEY, employer TEXT, ssn TEXT)")
    val req = Request(transaction = false, Seq(
      Statement("""INSERT INTO "names" VALUES(1,'bob','123-45-678')"""),
      Statement("""INSERT INTO "names" VALUES(2,'tom','111-22-333')"""),
      Statement("""INSERT INTO "names" VALUES(3,'matt','222-22-333')""")))
    assert(db.execute(req).isRight)
    exec(db, """INSERT INTO "staff" VALUES(1,'acme','222-22-333')""")
    assert(query(db,
      "SELECT names.id,name,names.ssn,employer FROM names INNER JOIN staff ON staff.ssn = names.ssn") ==
      """[{"columns":["id","name","ssn","employer"],"types":["integer","text","text","text"],"values":[[3,"matt","222-22-333","acme"]]}]""")
  }

  test("concat with verbatim column name (db.rs:492-505)") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    exec(db, """INSERT INTO foo(name) VALUES("fiona")""")
    assert(query(db, """SELECT id || "_bar", name FROM foo""") ==
      """[{"columns":["id || \"_bar\"","name"],"types":["text","text"],"values":[["1_bar","fiona"]]}]""")
  }

  test("multi-statement batches (db.rs:507-550)") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    val r = db.execute(Request(transaction = false, Seq(
      Statement("""INSERT INTO foo(name) VALUES("fiona")"""),
      Statement("""INSERT INTO foo(name) VALUES("dana")""")))).fold(e => fail(e), identity)
    assert(Json.responses(r) ==
      """[{"last_insert_id":1,"rows_affected":1},{"last_insert_id":2,"rows_affected":1}]""")
    val q = db.query(Request(transaction = false, Seq(
      Statement("SELECT * FROM foo"), Statement("SELECT * FROM foo")))).fold(e => fail(e), identity)
    assert(Json.rowsSeq(q) ==
      """[{"columns":["id","name"],"types":["integer","text"],"values":[[1,"fiona"],[2,"dana"]]},""" +
      """{"columns":["id","name"],"types":["integer","text"],"values":[[1,"fiona"],[2,"dana"]]}]""")
  }

  test("multiline statement (db.rs:552-587)") {
    val db = memDb
    exec(db,
      """
        CREATE TABLE foo (
        id INTEGER NOT NULL PRIMARY KEY,
        name TEXT
        )""")
    val r = db.execute(Request(transaction = false, Seq(
      Statement("""INSERT INTO foo(name) VALUES("fiona")"""),
      Statement("""INSERT INTO foo(name) VALUES("dana")""")))).fold(e => fail(e), identity)
    assert(Json.responses(r) ==
      """[{"last_insert_id":1,"rows_affected":1},{"last_insert_id":2,"rows_affected":1}]""")
  }

  test("parameterized all types (db.rs:589-616)") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT, age INT, money FLOAT)")
    val r = db.execute(Request(transaction = false, Seq(
      Statement("INSERT INTO foo(name, age, money) VALUES(?, ?, ?)", Seq(
        Parameter.Text("fiona"), Parameter.Integer(20), Parameter.Real(100.75))))))
    assert(r.isRight)
    assert(query(db, "SELECT * FROM foo") ==
      """[{"columns":["id","name","age","money"],"types":["integer","text","integer","real"],"values":[[1,"fiona",20,100.75]]}]""")
  }

  test("parameterized statements round trip (db.rs:618-687)") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    db.execute(Request(transaction = false, Seq(
      Statement("INSERT INTO foo(name) VALUES(?)", Seq(Parameter.Text("fiona"))))))
    db.execute(Request(transaction = false, Seq(
      Statement("INSERT INTO foo(name) VALUES(?)", Seq(Parameter.Text("aoife"))))))
    assert(query(db, "SELECT * FROM foo") ==
      """[{"columns":["id","name"],"types":["integer","text"],"values":[[1,"fiona"],[2,"aoife"]]}]""")
    val q = db.query(Request(transaction = false, Seq(
      Statement("SELECT * FROM foo WHERE NAME=?", Seq(Parameter.Text("fiona"))),
      Statement("SELECT * FROM foo WHERE NAME=?", Seq(Parameter.Text("aoife"))))))
      .fold(e => fail(e), identity)
    assert(Json.rowsSeq(q) ==
      """[{"columns":["id","name"],"types":["integer","text"],"values":[[1,"fiona"]]},""" +
      """{"columns":["id","name"],"types":["integer","text"],"values":[[2,"aoife"]]}]""")
  }

  test("simple transaction commits all (db.rs:689-730)") {
    val db = memDb
    query(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    val r = db.execute(Request(transaction = true, Seq(
      Statement("""INSERT INTO foo(id, name) VALUES(1, "fiona")"""),
      Statement("""INSERT INTO foo(id, name) VALUES(2, "fiona")"""),
      Statement("""INSERT INTO foo(id, name) VALUES(3, "fiona")"""),
      Statement("""INSERT INTO foo(id, name) VALUES(4, "fiona")""")))).fold(e => fail(e), identity)
    assert(Json.responses(r) ==
      """[{"last_insert_id":1,"rows_affected":1},{"last_insert_id":2,"rows_affected":1},{"last_insert_id":3,"rows_affected":1},{"last_insert_id":4,"rows_affected":1}]""")
    assert(query(db, "SELECT * FROM foo") ==
      """[{"columns":["id","name"],"types":["integer","text"],"values":[[1,"fiona"],[2,"fiona"],[3,"fiona"],[4,"fiona"]]}]""")
  }

  test("transaction rolls back on partial failure (db.rs:732-791)") {
    val db = memDb
    query(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    val r = db.execute(Request(transaction = true, Seq(
      Statement("""INSERT INTO foo(id, name) VALUES(1, "fiona")"""),
      Statement("""INSERT INTO foo(id, name) VALUES(2, "fiona")"""),
      Statement("""INSERT INTO foo(id, name) VALUES(1, "fiona")"""),
      Statement("""INSERT INTO foo(id, name) VALUES(4, "fiona")""")))).fold(e => fail(e), identity)
    assert(Json.responses(r) ==
      """[{"last_insert_id":1,"rows_affected":1},{"last_insert_id":2,"rows_affected":1},{"error":"UNIQUE constraint failed: foo.id"}]""")
    assert(query(db, "SELECT * FROM FOO") ==
      """[{"columns":[],"types":[],"values":[]}]""")
    assert(db.execute(Request(transaction = true, Seq(
      Statement("""INSERT INTO foo(id, name) VALUES(1, "fiona")""")))).isRight)
    assert(query(db, "SELECT * FROM FOO") ==
      """[{"columns":["id","name"],"types":["integer","text"],"values":[[1,"fiona"]]}]""")
  }

  test("without transaction continues past failure (db.rs:793-826)") {
    val db = memDb
    query(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    val r = db.execute(Request(transaction = false, Seq(
      Statement("""INSERT INTO foo(id, name) VALUES(1, "fiona")"""),
      Statement("""INSERT INTO foo(id, name) VALUES(2, "fiona")"""),
      Statement("""INSERT INTO foo(id, name) VALUES(1, "fiona")"""),
      Statement("""INSERT INTO foo(id, name) VALUES(4, "fiona")""")))).fold(e => fail(e), identity)
    assert(Json.responses(r) ==
      """[{"last_insert_id":1,"rows_affected":1},{"last_insert_id":2,"rows_affected":1},{"error":"UNIQUE constraint failed: foo.id"},{"last_insert_id":4,"rows_affected":1}]""")
  }

  test("DELETE and rows_affected (B5)") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    exec(db, "INSERT INTO foo VALUES(1,'fiona'),(2,'aoife'),(3,'dana')")
    assert(exec(db, "DELETE FROM foo WHERE id >= 2") ==
      """[{"last_insert_id":3,"rows_affected":2}]""")
    assert(query(db, "SELECT * FROM foo") ==
      """[{"columns":["id","name"],"types":["integer","text"],"values":[[1,"fiona"]]}]""")
  }

  test("determinism guard rejects random() in execute batches (README.md:30)") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    val r = db.execute(Request(transaction = false, Seq(
      Statement("INSERT INTO foo(id, name) VALUES(random(), 'x')"))))
    assert(r.isLeft)
    assert(r.swap.toOption.get.contains("non-deterministic"))
  }

  test("PRAGMA foreign_keys query returns the flag as a row (A4)") {
    val db = memDb
    assert(query(db, "PRAGMA foreign_keys") ==
      """[{"columns":["foreign_keys"],"types":["integer"],"values":[[0]]}]""")
    db.enableFkConstraints(true)
    assert(query(db, "PRAGMA foreign_keys") ==
      """[{"columns":["foreign_keys"],"types":["integer"],"values":[[1]]}]""")
    assert(db.executeStringStmt("PRAGMA foreign_keys=OFF").isRight)
    assert(!db.fkConstraints())
  }

  test("INSERT INTO ... SELECT copies rows through Catalyst (B3)") {
    val db = memDb
    exec(db, "CREATE TABLE src (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    exec(db, "INSERT INTO src VALUES(1,'fiona'),(2,'aoife'),(3,'dana')")
    exec(db, "CREATE TABLE dst (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    assert(exec(db, "INSERT INTO dst SELECT id, upper(name) FROM src WHERE id >= 2") ==
      """[{"last_insert_id":3,"rows_affected":2}]""")
    assert(query(db, "SELECT * FROM dst ORDER BY id") ==
      """[{"columns":["id","name"],"types":["integer","text"],"values":[[2,"AOIFE"],[3,"DANA"]]}]""")
  }

  test("CREATE TABLE AS SELECT infers schema + affinity (B2)") {
    val db = memDb
    exec(db, "CREATE TABLE src (id INTEGER NOT NULL PRIMARY KEY, name TEXT, bal FLOAT)")
    exec(db, "INSERT INTO src VALUES(1,'fiona',10.5),(2,'aoife',20.25)")
    // last_insert_id is connection-level and persists from the prior
    // INSERT, exactly like conn.last_insert_rowid() in the reference
    assert(exec(db, "CREATE TABLE big AS SELECT name, bal * 2 AS dbl FROM src WHERE bal > 15")
      == """[{"last_insert_id":2}]""")
    assert(query(db, "SELECT * FROM big") ==
      """[{"columns":["name","dbl"],"types":["text","real"],"values":[["aoife",40.5]]}]""")
  }

  test("backslash-containing text binds uncorrupted incl. trailing backslash") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    val weird = "C:\\tmp\\new\\"
    val r = db.execute(Request(transaction = false, Seq(
      Statement("INSERT INTO foo(id, name) VALUES(?, ?)",
        Seq(Parameter.Integer(1), Parameter.Text(weird))))))
    assert(r.isRight && !Json.responses(r.toOption.get).contains("error"), r)
    val rows = db.queryStringStmt("SELECT name FROM foo WHERE id = 1")
      .fold(e => fail(e), identity)
    assert(rows.head.values.head.head == Value.Text(weird))
  }

  test("determinism guard ignores function names inside bound text and literals") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    // data that merely CONTAINS now( / current_date must not be rejected
    val r1 = db.execute(Request(transaction = false, Seq(
      Statement("INSERT INTO foo(id, name) VALUES(?, ?)",
        Seq(Parameter.Integer(1), Parameter.Text("see you now(ish) current_date"))))))
    assert(r1.isRight && !Json.responses(r1.toOption.get).contains("error"), r1)
    // a literal typed directly in the SQL text must not be rejected either
    val r2 = db.executeStringStmt(
      "INSERT INTO foo(id, name) VALUES(2, 'brand(new) now(')")
    assert(r2.isRight && !Json.responses(r2.toOption.get).contains("error"), r2)
    // the actual function call still is
    assert(db.executeStringStmt("INSERT INTO foo(id, name) VALUES(random(), 'x')")
      .swap.toOption.get.contains("non-deterministic"))
  }

  test("torn trailing journal line does not brick open()") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdb").toString
    val db = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    exec(db, "INSERT INTO foo VALUES(1,'fiona')")
    db.close()
    // simulate a crash mid-append: partial JSON on the last journal line
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/d1/journal.jsonl"),
      "{\"id\":99,\"transaction\":false,\"statem".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val db2 = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    assert(query(db2, "SELECT * FROM foo") ==
      """[{"columns":["id","name"],"types":["integer","text"],"values":[[1,"fiona"]]}]""")
    assert(exec(db2, "INSERT INTO foo VALUES(2,'aoife')") ==
      """[{"last_insert_id":2,"rows_affected":1}]""")
  }

  test("DELETE enforces FK against named non-rowid parent columns") {
    val db = memDb
    exec(db, "CREATE TABLE parent (id INTEGER NOT NULL PRIMARY KEY, code TEXT UNIQUE)")
    exec(db, "CREATE TABLE child (id INTEGER NOT NULL PRIMARY KEY, pcode TEXT REFERENCES parent(code))")
    exec(db, "INSERT INTO parent VALUES(1,'A'),(2,'B')")
    exec(db, "INSERT INTO child VALUES(10,'A')")
    db.enableFkConstraints(true)
    assert(exec(db, "DELETE FROM parent WHERE code = 'A'") ==
      """[{"error":"FOREIGN KEY constraint failed"}]""")
    assert(exec(db, "DELETE FROM parent WHERE code = 'B'") ==
      """[{"last_insert_id":10,"rows_affected":1}]""")
  }

  // ---- delegated-SQLite surface: index DDL / ALTER / upsert -------------
  // Expected strings captured from SQLite 3.40 (the reference passes these
  // statements straight through, db/src/db.rs:176).

  test("CREATE/DROP INDEX: catalog, dup name, bad column, missing drop") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT, qty INTEGER)")
    assert(exec(db, "CREATE INDEX idx_name ON foo(name)") ==
      """[{}]""")
    assert(exec(db, "CREATE INDEX idx_name ON foo(id)") ==
      """[{"error":"index idx_name already exists"}]""")
    assert(exec(db, "CREATE INDEX IF NOT EXISTS idx_name ON foo(id)") ==
      """[{}]""")
    assert(exec(db, "CREATE INDEX ix ON foo(nocol)") ==
      """[{"error":"no such column: nocol"}]""")
    assert(exec(db, "DROP INDEX nope") ==
      """[{"error":"no such index: nope"}]""")
    assert(exec(db, "DROP INDEX IF EXISTS nope") ==
      """[{}]""")
    assert(exec(db, "DROP INDEX idx_name") ==
      """[{}]""")
  }

  test("UNIQUE INDEX enforces uniqueness incl. composite and existing dups") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    exec(db, "INSERT INTO foo VALUES(1,'fiona'),(2,'aoife')")
    exec(db, "CREATE UNIQUE INDEX idx_name ON foo(name)")
    assert(exec(db, "INSERT INTO foo VALUES(3,'fiona')") ==
      """[{"error":"UNIQUE constraint failed: foo.name"}]""")
    exec(db, "CREATE TABLE t2 (a INTEGER, b INTEGER)")
    exec(db, "CREATE UNIQUE INDEX uab ON t2(a,b)")
    exec(db, "INSERT INTO t2 VALUES(1,2)")
    assert(exec(db, "INSERT INTO t2 VALUES(1,2)") ==
      """[{"error":"UNIQUE constraint failed: t2.a, t2.b"}]""")
    // NULLs never conflict
    assert(exec(db, "INSERT INTO t2 VALUES(1,NULL),(1,NULL)") ==
      """[{"last_insert_id":3,"rows_affected":2}]""")
    exec(db, "CREATE TABLE t3 (a INTEGER)")
    exec(db, "INSERT INTO t3 VALUES(1),(1)")
    assert(exec(db, "CREATE UNIQUE INDEX ua ON t3(a)") ==
      """[{"error":"UNIQUE constraint failed: t3.a"}]""")
  }

  test("INSERT OR REPLACE / OR IGNORE / REPLACE INTO") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT, qty INTEGER)")
    exec(db, "INSERT INTO foo VALUES(1,'fiona',5),(2,'aoife',3)")
    assert(exec(db, "INSERT OR REPLACE INTO foo VALUES(2,'aoife2',7)") ==
      """[{"last_insert_id":2,"rows_affected":1}]""")
    // OR IGNORE: dup row skipped, new row lands; changes counts the insert
    assert(exec(db, "INSERT OR IGNORE INTO foo VALUES(2,'zz',9),(4,'dana',2)") ==
      """[{"last_insert_id":4,"rows_affected":1}]""")
    assert(query(db, "SELECT id, name, qty FROM foo ORDER BY id") ==
      """[{"columns":["id","name","qty"],"types":["integer","text","integer"],"values":[[1,"fiona",5],[2,"aoife2",7],[4,"dana",2]]}]""")
    assert(exec(db, "REPLACE INTO foo VALUES(4,'dana2',8)") ==
      """[{"last_insert_id":4,"rows_affected":1}]""")
    assert(query(db, "SELECT name FROM foo WHERE id = 4") ==
      """[{"columns":["name"],"types":["text"],"values":[["dana2"]]}]""")
  }

  test("ON CONFLICT DO NOTHING / DO UPDATE SET excluded") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT, qty INTEGER)")
    exec(db, "INSERT INTO foo VALUES(1,'fiona',5),(2,'aoife',3)")
    assert(exec(db,
      "INSERT INTO foo VALUES(2,'x',1) ON CONFLICT(id) DO UPDATE SET qty=excluded.qty") ==
      """[{"last_insert_id":2,"rows_affected":1}]""")
    assert(query(db, "SELECT id, name, qty FROM foo ORDER BY id") ==
      """[{"columns":["id","name","qty"],"types":["integer","text","integer"],"values":[[1,"fiona",5],[2,"aoife",1]]}]""")
    assert(exec(db, "INSERT INTO foo VALUES(5,'eve',1) ON CONFLICT DO NOTHING") ==
      """[{"last_insert_id":5,"rows_affected":1}]""")
    assert(exec(db, "INSERT INTO foo VALUES(5,'other',2) ON CONFLICT DO NOTHING") ==
      """[{"last_insert_id":5}]""")
    assert(exec(db,
      "INSERT INTO foo VALUES(5,'o',0) ON CONFLICT(name) DO NOTHING") ==
      """[{"error":"ON CONFLICT clause does not match any PRIMARY KEY or UNIQUE constraint"}]""")
    // "ON CONFLICT" inside a string literal is data, not an upsert clause
    assert(exec(db, "INSERT INTO foo VALUES(9,'say ON CONFLICT DO NOTHING',1)") ==
      """[{"last_insert_id":9,"rows_affected":1}]""")
    assert(query(db, "SELECT name FROM foo WHERE id = 9") ==
      """[{"columns":["name"],"types":["text"],"values":[["say ON CONFLICT DO NOTHING"]]}]""")
  }

  test("ALTER TABLE RENAME / RENAME COLUMN / ADD / DROP COLUMN") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT, qty INTEGER)")
    exec(db, "INSERT INTO foo VALUES(1,'fiona',5)")
    exec(db, "CREATE INDEX idx_name ON foo(name)")
    exec(db, "CREATE TABLE t2 (a INTEGER)")
    assert(exec(db, "ALTER TABLE foo RENAME TO t2") ==
      """[{"error":"there is already another table or index with this name: t2"}]""")
    assert(exec(db, "ALTER TABLE foo RENAME TO bar") ==
      """[{"last_insert_id":1}]""")
    assert(query(db, "SELECT name FROM bar") ==
      """[{"columns":["name"],"types":["text"],"values":[["fiona"]]}]""")
    assert(exec(db, "ALTER TABLE bar RENAME COLUMN nope TO x") ==
      """[{"error":"no such column: \"nope\""}]""")
    assert(exec(db, "ALTER TABLE bar RENAME COLUMN qty TO amount") ==
      """[{"last_insert_id":1}]""")
    assert(exec(db, "ALTER TABLE bar ADD COLUMN c2 INTEGER PRIMARY KEY") ==
      """[{"error":"Cannot add a PRIMARY KEY column"}]""")
    assert(exec(db, "ALTER TABLE bar ADD COLUMN c2 INTEGER UNIQUE") ==
      """[{"error":"Cannot add a UNIQUE column"}]""")
    assert(exec(db, "ALTER TABLE bar ADD COLUMN c2 INTEGER NOT NULL") ==
      """[{"error":"Cannot add a NOT NULL column with default value NULL"}]""")
    exec(db, "ALTER TABLE bar ADD COLUMN c2 INTEGER NOT NULL DEFAULT 7")
    assert(query(db, "SELECT id, name, amount, c2 FROM bar") ==
      """[{"columns":["id","name","amount","c2"],"types":["integer","text","integer","integer"],"values":[[1,"fiona",5,7]]}]""")
    assert(exec(db, "ALTER TABLE bar DROP COLUMN id") ==
      """[{"error":"cannot drop PRIMARY KEY column: \"id\""}]""")
    assert(exec(db, "ALTER TABLE bar DROP COLUMN name") ==
      """[{"error":"error in index idx_name after drop column: no such column: name"}]""")
    exec(db, "ALTER TABLE bar DROP COLUMN amount")
    assert(query(db, "SELECT * FROM bar") ==
      """[{"columns":["id","name","c2"],"types":["integer","text","integer"],"values":[[1,"fiona",7]]}]""")
  }

  test("dropped or renamed tables stop resolving (no stale views)") {
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    exec(db, "INSERT INTO foo VALUES(1,'fiona')")
    // materialize the views once via a query
    assert(query(db, "SELECT id FROM foo") ==
      """[{"columns":["id"],"types":["integer"],"values":[[1]]}]""")
    exec(db, "ALTER TABLE foo RENAME TO bar")
    assert(db.queryStringStmt("SELECT id FROM foo") ==
      Left("no such table: foo"))
    exec(db, "DROP TABLE bar")
    assert(db.queryStringStmt("SELECT id FROM bar") ==
      Left("no such table: bar"))
  }

  test("CREATE/DROP VIEW: expansion, read-only, name clashes (SQLite 3.40 parity)") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    exec(db, "INSERT INTO t VALUES(1,'a'),(2,'b')")
    exec(db, "CREATE VIEW big AS SELECT id, upper(v) AS uv FROM t WHERE id > 1")
    assert(query(db, "SELECT * FROM big") ==
      """[{"columns":["id","uv"],"types":["integer","text"],"values":[[2,"B"]]}]""")
    assert(exec(db, "CREATE VIEW big AS SELECT 1") ==
      """[{"error":"view big already exists"}]""")
    assert(exec(db, "CREATE TABLE big (x INTEGER)") ==
      """[{"error":"view big already exists"}]""")
    assert(exec(db, "INSERT INTO big VALUES(1,'x')") ==
      """[{"error":"cannot modify big because it is a view"}]""")
    assert(exec(db, "UPDATE big SET uv='z'") ==
      """[{"error":"cannot modify big because it is a view"}]""")
    assert(exec(db, "DELETE FROM big") ==
      """[{"error":"cannot modify big because it is a view"}]""")
    assert(exec(db, "DROP TABLE big") ==
      """[{"error":"use DROP VIEW to delete view big"}]""")
    assert(exec(db, "DROP VIEW nope") ==
      """[{"error":"no such view: nope"}]""")
    // view on view; then dropping the inner view breaks the outer lazily
    exec(db, "CREATE VIEW v3 AS SELECT uv FROM big")
    assert(query(db, "SELECT * FROM v3") ==
      """[{"columns":["uv"],"types":["text"],"values":[["B"]]}]""")
    exec(db, "DROP VIEW big")
    assert(db.queryStringStmt("SELECT * FROM big") ==
      Left("no such table: big"))
    assert(db.queryStringStmt("SELECT * FROM v3").isLeft)
  }

  test("views persist, recover, and follow base-table writes") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdb").toString
    val db = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    exec(db, "INSERT INTO t VALUES(1,'a')")
    exec(db, "CREATE VIEW up AS SELECT upper(v) AS uv FROM t")
    assert(db.checkpoint().isRight)
    db.close()
    val db2 = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    exec(db2, "INSERT INTO t VALUES(2,'b')")
    assert(query(db2, "SELECT * FROM up ORDER BY uv") ==
      """[{"columns":["uv"],"types":["text"],"values":[["A"],["B"]]}]""")
  }

  test("CHECK constraints: column, table-level, named, NULL passes (SQLite 3.40)") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY, price REAL CHECK (price > 0), qty INTEGER, CHECK (qty < 100))")
    assert(exec(db, "INSERT INTO t VALUES(1, -5, 1)") ==
      """[{"error":"CHECK constraint failed: price > 0"}]""")
    assert(exec(db, "INSERT INTO t VALUES(1, 5, 200)") ==
      """[{"error":"CHECK constraint failed: qty < 100"}]""")
    assert(exec(db, "INSERT INTO t VALUES(1, 5, 10)") ==
      """[{"last_insert_id":1,"rows_affected":1}]""")
    assert(exec(db, "UPDATE t SET qty = 500") ==
      """[{"error":"CHECK constraint failed: qty < 100"}]""")
    // NULL result is not a failure
    assert(exec(db, "INSERT INTO t VALUES(2, NULL, NULL)") ==
      """[{"last_insert_id":2,"rows_affected":1}]""")
    exec(db, "CREATE TABLE t2 (v INTEGER CONSTRAINT pos CHECK (v > 0))")
    assert(exec(db, "INSERT INTO t2 VALUES(-1)") ==
      """[{"error":"CHECK constraint failed: pos"}]""")
    assert(exec(db, "INSERT INTO t2 VALUES(3)") ==
      """[{"last_insert_id":1,"rows_affected":1}]""")
  }

  test("INSERT OR IGNORE skips CHECK-violating rows") {
    val db = memDb
    exec(db, "CREATE TABLE t (v INTEGER CHECK (v > 0))")
    // last_insert_id 1: a skipped candidate never consumes a rowid — the
    // surviving row is the table's FIRST (re-probed live on 3.40; the
    // earlier pin of 2 reproduced the engine's old tentative-assignment
    // bug, not SQLite)
    assert(exec(db, "INSERT OR IGNORE INTO t VALUES(-1),(5)") ==
      """[{"last_insert_id":1,"rows_affected":1}]""")
    assert(query(db, "SELECT v FROM t") ==
      """[{"columns":["v"],"types":["integer"],"values":[[5]]}]""")
  }

  test("CHECK constraints survive recovery") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdb").toString
    val db = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    exec(db, "CREATE TABLE t (v INTEGER CHECK (v > 0))")
    exec(db, "INSERT INTO t VALUES(1)")
    assert(db.checkpoint().isRight)
    db.close()
    val db2 = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    assert(exec(db2, "INSERT INTO t VALUES(-1)") ==
      """[{"error":"CHECK constraint failed: v > 0"}]""")
  }

  test("VACUUM and ANALYZE are accepted as no-ops") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER PRIMARY KEY)")
    assert(exec(db, "VACUUM") == """[{}]""")
    assert(exec(db, "ANALYZE") == """[{}]""")
  }

  test("PRAGMA table_info mirrors SQLite's six-column shape") {
    val db = memDb
    exec(db, "CREATE TABLE t (id INTEGER NOT NULL PRIMARY KEY, v TEXT DEFAULT 'x', r REAL, b BLOB)")
    assert(query(db, "PRAGMA table_info(t)") ==
      """[{"columns":["cid","name","type","notnull","dflt_value","pk"],""" +
      """"types":["integer","text","text","integer","text","integer"],""" +
      """"values":[[0,"id","INTEGER",1,null,1],[1,"v","TEXT",0,"'x'",0],""" +
      """[2,"r","REAL",0,null,0],[3,"b","BLOB",0,null,0]]}]""")
    assert(query(db, "PRAGMA table_info(nope)") ==
      """[{"columns":[],"types":[],"values":[]}]""")
  }

  test("column DEFAULT fills unspecified INSERT columns") {
    val db = memDb
    exec(db, "CREATE TABLE t4 (a INTEGER, b INTEGER DEFAULT 42)")
    exec(db, "INSERT INTO t4(a) VALUES(1)")
    assert(query(db, "SELECT a, b FROM t4") ==
      """[{"columns":["a","b"],"types":["integer","integer"],"values":[[1,42]]}]""")
  }

  test("index DDL and ALTER survive persist + recover") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdb").toString
    val db = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    exec(db, "CREATE UNIQUE INDEX idx_name ON foo(name)")
    exec(db, "ALTER TABLE foo ADD COLUMN qty INTEGER DEFAULT 3")
    exec(db, "INSERT INTO foo(name) VALUES('fiona')")
    db.close()
    val db2 = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    assert(query(db2, "SELECT id, name, qty FROM foo") ==
      """[{"columns":["id","name","qty"],"types":["integer","text","integer"],"values":[[1,"fiona",3]]}]""")
    // the unique index came back with the manifest
    assert(exec(db2, "INSERT INTO foo(name) VALUES('fiona')") ==
      """[{"error":"UNIQUE constraint failed: foo.name"}]""")
  }

  test("checkpoint writes parquet snapshot version, truncates journal (§7.4)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdb").toString
    val db = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    exec(db, "INSERT INTO foo VALUES(1,'fiona'),(2,'aoife')")
    val root = java.nio.file.Paths.get(s"$tmp/d1")
    assert(java.nio.file.Files.exists(root.resolve("journal.jsonl")))
    assert(db.checkpoint().isRight)
    // columnar snapshot + pointer exist; journal truncated
    assert(java.nio.file.Files.exists(root.resolve("v1/foo.parquet")))
    assert(java.nio.file.Files.exists(root.resolve("manifest.json")))
    assert(!java.nio.file.Files.exists(root.resolve("journal.jsonl")))
    val manifest = java.nio.file.Files.readString(root.resolve("manifest.json"))
    assert(manifest.contains("\"version\":1") && !manifest.contains("\"rows\""))
    // writes after the checkpoint land in the new journal
    exec(db, "INSERT INTO foo VALUES(3,'dana')")
    db.close()
    val db2 = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    assert(query(db2, "SELECT * FROM foo") ==
      """[{"columns":["id","name"],"types":["integer","text"],"values":[[1,"fiona"],[2,"aoife"],[3,"dana"]]}]""")
    // a second checkpoint advances the version and GCs v1 eventually
    assert(db2.checkpoint().isRight)
    assert(java.nio.file.Files.exists(root.resolve("v2/foo.parquet")))
    assert(db2.checkpoint().isRight)
    assert(!java.nio.file.Files.exists(root.resolve("v1")))
  }

  test("journal-replay convergence: two instances over one journal agree") {
    // the multi-node argument (SURVEY §2.1): the journal plays the Raft
    // log's role, so two replicas replaying it must reach the same state
    val tmp = java.nio.file.Files.createTempDirectory("graftdb").toString
    val db = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    (1 to 9).foreach(i => exec(db, s"INSERT INTO foo(name) VALUES('n$i')"))
    exec(db, "UPDATE foo SET name='x' WHERE id <= 3")
    exec(db, "DELETE FROM foo WHERE id = 9")
    db.close()
    // replicate the log to a second directory; both replicas replay it
    val src = java.nio.file.Paths.get(s"$tmp/d1/journal.jsonl")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/d2"))
    java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$tmp/d2/journal.jsonl"))
    val a = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    val b = GraftDb.open(spark, s"$tmp/d2").fold(e => fail(e), identity)
    val q = "SELECT * FROM foo ORDER BY id"
    assert(query(a, q) == query(b, q))
    // and convergence survives each replica checkpointing independently
    assert(a.checkpoint().isRight)
    // a second open on a LIVE root is refused (exclusive root lock,
    // ADVICE r10) — release the instance first, then reopen
    assert(GraftDb.open(spark, s"$tmp/d1") == Left(s"database is locked: $tmp/d1"))
    a.close()
    val a2 = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    assert(query(a2, q) == query(b, q))
  }

  test("subqueries inside UPDATE/DELETE (sqlite 3.40 ground truth)") {
    // ground truth captured with sqlite3 3.40.1:
    //   UPDATE .. SET score=(SELECT MAX(id) FROM bar)
    //     WHERE id IN (SELECT id FROM bar)      -> rows 1,3 updated, score 3.0
    //   DELETE .. WHERE id NOT IN (SELECT ...)  -> removes id 2
    //   SET name=(empty scalar subquery)        -> NULL, never an error
    val db = memDb
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT, score REAL)")
    exec(db, "INSERT INTO foo VALUES (1,'fiona',10.0),(2,'aoife',20.0),(3,'brid',30.0)")
    exec(db, "CREATE TABLE bar (id INTEGER, tag TEXT)")
    exec(db, "INSERT INTO bar VALUES (1,'x'),(3,'y')")
    assert(exec(db,
      "UPDATE foo SET score = (SELECT MAX(id) FROM bar) WHERE id IN (SELECT id FROM bar)")
      == """[{"last_insert_id":2,"rows_affected":2}]""")
    assert(query(db, "SELECT id, name, score FROM foo ORDER BY id") ==
      """[{"columns":["id","name","score"],"types":["integer","text","real"],"values":[[1,"fiona",3.0],[2,"aoife",20.0],[3,"brid",3.0]]}]""")
    assert(exec(db, "DELETE FROM foo WHERE id NOT IN (SELECT id FROM bar)")
      == """[{"last_insert_id":2,"rows_affected":1}]""")
    assert(query(db, "SELECT id FROM foo ORDER BY id") ==
      """[{"columns":["id"],"types":["integer"],"values":[[1],[3]]}]""")
    exec(db, "UPDATE foo SET name = (SELECT tag FROM bar WHERE bar.id = 99) WHERE id = 1")
    assert(query(db, "SELECT id, name FROM foo ORDER BY id") ==
      """[{"columns":["id","name"],"types":["integer","text"],"values":[[1,null],[3,"brid"]]}]""")
  }

  test("file-backed db persists and recovers (journal + manifest)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdb").toString
    val db = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    exec(db, "CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)")
    exec(db, "INSERT INTO foo VALUES(1,'fiona'),(2,'aoife')")
    db.close()
    val db2 = GraftDb.open(spark, s"$tmp/d1").fold(e => fail(e), identity)
    assert(query(db2, "SELECT * FROM foo ORDER BY id") ==
      """[{"columns":["id","name"],"types":["integer","text"],"values":[[1,"fiona"],[2,"aoife"]]}]""")
    assert(exec(db2, "INSERT INTO foo VALUES(3,'dana')") ==
      """[{"last_insert_id":3,"rows_affected":1}]""")
  }
}
