package graft.server

import graft.SparkSpec
import graft.engine.GraftDb
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Service-level tests over a real socket on an ephemeral port — mirrors
  * the reference's hyper tests (/root/reference/http/src/service.rs:222-316)
  * plus the /db/query route the reference designed but never wired.
  */
class HttpApiSpec extends SparkSpec {

  private def withServer(f: (HttpClient, String) => Unit): Unit = {
    val db = GraftDb.openInMemory(spark)
    val api = new HttpApi(db, port = 0)
    api.start()
    try f(HttpClient.newHttpClient(), s"http://127.0.0.1:${api.listeningPort}")
    finally api.stop()
  }

  private def get(c: HttpClient, url: String) =
    c.send(HttpRequest.newBuilder(URI.create(url)).GET.build(),
      HttpResponse.BodyHandlers.ofString())
  private def post(c: HttpClient, url: String, body: String) =
    c.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("GET /status reports leader + members (A14/A16 surface)") {
    val db = graft.engine.GraftDb.openInMemory(spark)
    val api = new HttpApi(db, port = 0,
      cluster = Some(new graft.engine.SparkClusterControl(spark)))
    api.start()
    try {
      val r = get(HttpClient.newHttpClient(),
        s"http://127.0.0.1:${api.listeningPort}/status")
      assert(r.statusCode() == 200)
      assert(r.body().contains("\"leader\"") && r.body().contains("\"members\""))
    } finally api.stop()
  }

  test("GET /ping returns pong (service.rs:243-252)") {
    withServer { (c, base) =>
      val r = get(c, s"$base/ping")
      assert(r.statusCode() == 200 && r.body() == "pong")
    }
  }

  test("unknown route returns 404 (service.rs:254-262)") {
    withServer { (c, base) =>
      assert(get(c, s"$base/nope").statusCode() == 404)
    }
  }

  test("POST /db/execute round trip (service.rs:282-311)") {
    withServer { (c, base) =>
      val ddl = """{"request":{"transaction":false,"statements":[
        {"sql":"CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)","parameters":[]}]}}"""
      assert(post(c, s"$base/db/execute", ddl).statusCode() == 200)
      val ins = """{"request":{"transaction":false,"statements":[
        {"sql":"INSERT INTO foo(id, name) VALUES(1, \"fiona\")","parameters":[]}]}}"""
      val r = post(c, s"$base/db/execute", ins)
      assert(r.statusCode() == 200)
      assert(r.body() == """[{"last_insert_id":1,"rows_affected":1}]""")
    }
  }

  test("POST /db/execute with bad json returns 400 (service.rs:264-280)") {
    withServer { (c, base) =>
      assert(post(c, s"$base/db/execute", "{not json").statusCode() == 400)
    }
  }

  test("POST /db/query returns the rows envelope (the unwired route)") {
    withServer { (c, base) =>
      post(c, s"$base/db/execute",
        """{"request":{"transaction":false,"statements":[
          {"sql":"CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)"},
          {"sql":"INSERT INTO foo(id, name) VALUES(1, \"fiona\")"}]}}""")
      val r = post(c, s"$base/db/query",
        """{"request":{"transaction":false,"statements":[{"sql":"SELECT * FROM foo"}]}}""")
      assert(r.statusCode() == 200)
      assert(r.body() ==
        """[{"columns":["id","name"],"types":["integer","text"],"values":[[1,"fiona"]]}]""")
    }
  }

  test("/db/query read-consistency levels: none/weak/strong + invalid (§3.2)") {
    withServer { (c, base) =>
      post(c, s"$base/db/execute",
        """{"request":{"transaction":false,"statements":[
          {"sql":"CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT)"},
          {"sql":"INSERT INTO foo(id, name) VALUES(1, \"fiona\")"}]}}""")
      val body =
        """{"request":{"transaction":false,"statements":[{"sql":"SELECT * FROM foo"}]}}"""
      val expected =
        """[{"columns":["id","name"],"types":["integer","text"],"values":[[1,"fiona"]]}]"""
      Seq("none", "weak", "strong").foreach { level =>
        val r = post(c, s"$base/db/query?level=$level", body)
        assert(r.statusCode() == 200, s"level=$level: ${r.body()}")
        assert(r.body() == expected, s"level=$level")
      }
      val bad = post(c, s"$base/db/query?level=chaotic", body)
      assert(bad.statusCode() == 400)
      assert(bad.body() == "invalid consistency level: chaotic")
      // none-level reads are read-only: mutating statements are rejected
      val mut = post(c, s"$base/db/query?level=none",
        """{"request":{"transaction":false,"statements":[
          {"sql":"DELETE FROM foo"}]}}""")
      assert(mut.statusCode() == 400)
      assert(mut.body() == "level=none supports read statements only")
      // PRAGMA reads answer from the envelope at every level
      val pragma = post(c, s"$base/db/query?level=none",
        """{"request":{"transaction":false,"statements":[
          {"sql":"PRAGMA foreign_keys"}]}}""")
      assert(pragma.statusCode() == 200)
      assert(pragma.body() ==
        """[{"columns":["foreign_keys"],"types":["integer"],"values":[[0]]}]""")
    }
  }

  test("parameterized statement over the wire (serde enum encoding)") {
    withServer { (c, base) =>
      post(c, s"$base/db/execute",
        """{"request":{"transaction":false,"statements":[
          {"sql":"CREATE TABLE foo (id INTEGER NOT NULL PRIMARY KEY, name TEXT, age INT)"}]}}""")
      val r = post(c, s"$base/db/execute",
        """{"request":{"transaction":false,"statements":[
          {"sql":"INSERT INTO foo(name, age) VALUES(?, ?)",
           "parameters":[{"Text":"fiona"},{"Integer":20}]}]}}""")
      assert(r.body() == """[{"last_insert_id":1,"rows_affected":1}]""")
      val q = post(c, s"$base/db/query",
        """{"request":{"transaction":false,"statements":[{"sql":"SELECT * FROM foo"}]}}""")
      assert(q.body() ==
        """[{"columns":["id","name","age"],"types":["integer","text","integer"],"values":[[1,"fiona",20]]}]""")
    }
  }

  test("/db/query?version=N serves distinct snapshot versions (time travel)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-http-tt-")
    val db = GraftDb.open(spark, dir.resolve("db").toString)
      .fold(e => fail(e), identity)
    val api = new HttpApi(db, port = 0)
    api.start()
    try {
      val c = HttpClient.newHttpClient()
      val base = s"http://127.0.0.1:${api.listeningPort}"
      db.executeStringStmt(
        "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
      db.executeStringStmt("INSERT INTO t VALUES (1, 'one')")
      assert(db.checkpoint().isRight) // v1
      db.executeStringStmt("UPDATE t SET v = 'uno' WHERE id = 1")
      db.executeStringStmt("INSERT INTO t VALUES (2, 'two')")
      assert(db.checkpoint().isRight) // v2
      val q =
        """{"request":{"transaction":false,"statements":[{"sql":"SELECT v FROM t"}]}}"""
      val r1 = post(c, s"$base/db/query?version=1", q)
      assert(r1.statusCode() == 200, r1.body())
      assert(r1.body() ==
        """[{"columns":["v"],"types":["text"],"values":[["one"]]}]""")
      val r2 = post(c, s"$base/db/query?version=2", q)
      assert(r2.statusCode() == 200, r2.body())
      assert(r2.body() ==
        """[{"columns":["v"],"types":["text"],"values":[["uno"],["two"]]}]""")
      // SQL views resolve on the version surface too (current definition
      // over the versioned tables — same contract as the none-level read)
      db.executeStringStmt("CREATE VIEW vv AS SELECT v FROM t")
      val rv = post(c, s"$base/db/query?version=1",
        """{"request":{"transaction":false,"statements":[{"sql":"SELECT v FROM vv"}]}}""")
      assert(rv.statusCode() == 200 && rv.body().contains("one"), rv.body())
      // expired/unknown version fails loudly, never serves current data
      val bad = post(c, s"$base/db/query?version=99", q)
      assert(bad.statusCode() == 400 && bad.body().contains("no snapshot"))
      val nonNum = post(c, s"$base/db/query?version=abc", q)
      assert(nonNum.statusCode() == 400)
      // writes are rejected on the version surface
      val w = post(c, s"$base/db/query?version=1",
        """{"request":{"transaction":false,"statements":[{"sql":"DELETE FROM t"}]}}""")
      assert(w.statusCode() == 400 &&
        w.body().contains("read statements only"))
    } finally { api.stop(); db.close() }
  }
}
