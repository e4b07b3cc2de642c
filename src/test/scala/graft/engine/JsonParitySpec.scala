package graft.engine

import graft.SparkSpec
import graft.command.Value

/** SQLite json1 goldens on the engine query surface — every row probed
  * live on the 3.40.1 oracle (see SqliteJson for the semantics notes:
  * raw-lexeme-preserving minification, expression-tree-only subtype,
  * strict RFC JSON, path grammar, insert/replace/set creation rules,
  * RFC-7386 merge patch). */
class JsonParitySpec extends SparkSpec {

  private lazy val db = {
    val d = GraftDb.openInMemory(spark, 500)
    def ex(sql: String): Unit = {
      val r = d.executeStringStmt(sql).fold(e => fail(s"[$sql] $e"), identity)
      r.foreach(x => assert(x.error.isEmpty, s"[$sql] ${x.error}"))
    }
    ex("CREATE TABLE g (k TEXT, v INTEGER)")
    ex("INSERT INTO g VALUES ('a',1),('b',2),('a',3)")
    ex("CREATE TABLE gn (k TEXT, v INTEGER)")
    ex("INSERT INTO gn VALUES ('a',1),(NULL,4)")
    ex("CREATE TABLE docs (id INTEGER PRIMARY KEY, j TEXT)")
    ex("""INSERT INTO docs(j) VALUES ('{"a":1,"t":"x"}'), ('{"a":2,"t":"y"}')""")
    d
  }

  private def unwrap(v: Value): Any = v match {
    case Value.Integer(x) => x
    case Value.Text(x) => x
    case Value.Real(x) => x
    case Value.Null => null
    case other => other
  }

  private def one(sql: String): Any =
    db.queryStringStmt(s"SELECT $sql").fold(e => fail(s"[$sql] $e"), identity)
      .head.values.head.head match { case v => unwrap(v) }

  private def err(sql: String): String =
    db.queryStringStmt(s"SELECT $sql").fold(identity,
      r => fail(s"[$sql] expected an error, got $r"))

  test("json(): minification preserves raw lexemes; strict RFC JSON") {
    val goldens = Seq(
      """json('{"a": 1, "b":[1,2]}')""" -> """{"a":1,"b":[1,2]}""",
      """json('  [1, 2 ,3]  ')""" -> "[1,2,3]",
      """json('{"e":2.50}')""" -> """{"e":2.50}""",
      """json('{"e":1e2}')""" -> """{"e":1e2}""",
      """json('["aAb"]')""" -> """["aAb"]""",
      """json('3')""" -> "3",
      """json(3)""" -> "3",
      """json('true')""" -> "true",
      """json(NULL)""" -> null)
    goldens.foreach { case (e, want) =>
      assert(one(e) == want, s"$e => ${one(e)} (want $want)") }
    Seq("'{bad'", "'nan'", "'+5'", "'.5'", "'01'", "'5.'", "'\"a'")
      .foreach { bad =>
        assert(err(s"json($bad)") == "malformed JSON", bad)
      }
  }

  test("json_valid") {
    assert(one("""json_valid('{"a":1}')""") == 1L)
    assert(one("json_valid('{bad')") == 0L)
    assert(one("json_valid(NULL)") == 0L)
    assert(one("json_valid(3)") == 1L)
  }

  test("json_extract: scalars unwrap, containers stay json, multi-path") {
    val doc = """'{"a":1,"b":[7,8],"c":{"d":"x"},"e":2.5,"f":true,"g":null}'"""
    assert(one(s"json_extract($doc,'$$.a')") == 1L)
    assert(one(s"json_extract($doc,'$$.b')") == "[7,8]")
    assert(one(s"json_extract($doc,'$$.b[1]')") == 8L)
    assert(one(s"json_extract($doc,'$$.c.d')") == "x")
    assert(one(s"json_extract($doc,'$$.e')") == 2.5)
    assert(one(s"json_extract($doc,'$$.f')") == 1L)
    assert(one(s"json_extract($doc,'$$.g')") == null)
    assert(one(s"json_extract($doc,'$$.zz')") == null)
    assert(one(s"json_extract($doc,'$$.a','$$.zz')") == "[1,null]")
    assert(one("""json_extract('[1,2,3]','$[0]')""") == 1L)
    assert(one("""json_extract('[1,2,3]','$[#-1]')""") == 3L)
    assert(one("""json_extract('[[1,2]]','$[0][1]')""") == 2L)
    assert(one("""json_extract('{"a b":1}','$."a b"')""") == 1L)
    assert(one("""json_extract('{"a":1}','$')""") == """{"a":1}""")
    assert(one("""json_extract('["xA"]','$[0]')""") == "xA")
    assert(one("""json_extract('{"a":12345678901234567890}','$.a')""") ==
      1.2345678901234567e19)
    assert(one("""typeof(json_extract('{"f":true}','$.f'))""") == "integer")
    assert(one("""json_extract(NULL,'$.a')""") == null)
    assert(one("""json_extract('{"a":1}',NULL)""") == null)
    assert(err("""json_extract('{"a":1}','a')""") ==
      "JSON path error near 'a'")
  }

  test("json_type") {
    assert(one("""json_type('{"a":1}')""") == "object")
    assert(one("json_type('[1]')") == "array")
    assert(one("json_type('3')") == "integer")
    assert(one("json_type('2.5')") == "real")
    assert(one("json_type('\"x\"')") == "text")
    assert(one("json_type('true')") == "true")
    assert(one("json_type('null')") == "null")
    assert(one("""json_type('{"a":[1,2.5,"x",true,null]}','$.a[1]')""") ==
      "real")
    assert(one("""json_type('{"a":1}','$.q')""") == null)
    assert(one("json_type('[3]','$')") == "array")
  }

  test("json_array / json_object: subtype propagates in-tree only") {
    assert(one("json_array(1,2.5,'x',NULL)") == """[1,2.5,"x",null]""")
    assert(one("json_array()") == "[]")
    assert(one("json_array('[1]')") == """["[1]"]""")
    assert(one("json_array(json('[1]'))") == "[[1]]")
    assert(one("json_array(1.0)") == "[1.0]")
    assert(one("""json_array('x"y')""") == """["x\"y"]""")
    assert(one("json_object('a',1,'b','x')") == """{"a":1,"b":"x"}""")
    assert(one("json_object()") == "{}")
    assert(one("""json_object('k','{"x":1}')""") ==
      """{"k":"{\"x\":1}"}""")
    assert(err("json_object('a')") ==
      "json_object() requires an even number of arguments")
    assert(err("json_object(5,1)") == "json_object() labels must be TEXT")
  }

  test("json_array_length / json_quote") {
    assert(one("json_array_length('[1,2,3]')") == 3L)
    assert(one("""json_array_length('{"a":1}')""") == 0L)
    assert(one("""json_array_length('{"a":[1,2]}','$.a')""") == 2L)
    assert(one("json_array_length('3')") == 0L)
    assert(one("json_quote('abc')") == "\"abc\"")
    assert(one("json_quote(3)") == "3")
    assert(one("json_quote(2.5)") == "2.5")
    assert(one("json_quote(NULL)") == "null")
    assert(one("json_quote('[1]')") == "\"[1]\"")
    assert(one("json_quote(json('[1]'))") == "[1]")
    assert(one("""json_quote('a"b')""") == """"a\"b"""")
  }

  test("json_insert / json_replace / json_set creation rules (probed)") {
    assert(one("""json_insert('{"a":1}','$.b',2)""") == """{"a":1,"b":2}""")
    assert(one("""json_insert('{"a":1}','$.a',9)""") == """{"a":1}""")
    assert(one("""json_insert('[1,2]','$[#]',3)""") == "[1,2,3]")
    assert(one("""json_insert('[1,2]','$[0]',9)""") == "[1,2]")
    assert(one("""json_insert('[1,2]','$[2]',9)""") == "[1,2,9]")
    assert(one("""json_insert('[1,2]','$[5]',9)""") == "[1,2]")
    assert(one("""json_insert('{}','$.a[0]',5)""") == """{"a":[5]}""")
    assert(one("""json_insert('{}','$.a[1]',5)""") == "{}")
    assert(one("""json_insert('{"a":1}','$.c.d',5)""") ==
      """{"a":1,"c":{"d":5}}""")
    assert(one("""json_insert('{"a":1}','$.b','[1]')""") ==
      """{"a":1,"b":"[1]"}""")
    assert(one("""json_insert('{"a":1}','$.b',json('[1]'))""") ==
      """{"a":1,"b":[1]}""")
    assert(one("""json_insert('{"a":1}','$.b',NULL)""") ==
      """{"a":1,"b":null}""")
    assert(one("""json_replace('{"a":1}','$.a',9)""") == """{"a":9}""")
    assert(one("""json_replace('{"a":1}','$.b',2)""") == """{"a":1}""")
    assert(one("""json_set('{"a":1}','$.a',9,'$.b',2)""") ==
      """{"a":9,"b":2}""")
    assert(one("""json_set('{"a":[1]}','$.a[#]',9)""") == """{"a":[1,9]}""")
    assert(one("""json_set('{}','$.a',true)""") == """{"a":1}""")
    assert(one("""json_insert('1','$',5)""") == "1")
    assert(one("""json_set(NULL,'$.a',1)""") == null)
    assert(one("""json_set('{"a":1}',NULL,1)""") == """{"a":1}""")
    assert(err("""json_insert('{bad','$.a',1)""") == "malformed JSON")
    assert(err("""json_insert('{"a":1}','$.b',x'41')""") ==
      "JSON cannot hold BLOB values")
  }

  test("json_remove / json_patch (probed)") {
    assert(one("""json_remove('{"a":1,"b":2}','$.a')""") == """{"b":2}""")
    assert(one("""json_remove('[1,2,3]','$[1]')""") == "[1,3]")
    assert(one("""json_remove('{"a":1}','$.zz')""") == """{"a":1}""")
    assert(one("""json_remove('{"a":1}')""") == """{"a":1}""")
    assert(one("""json_remove('[1,2]','$')""") == null)
    assert(one("""json_patch('{"a":1,"b":2}','{"b":null,"c":3}')""") ==
      """{"a":1,"c":3}""")
    assert(one("""json_patch('{"a":{"x":1}}','{"a":{"y":2}}')""") ==
      """{"a":{"x":1,"y":2}}""")
  }

  test("json aggregates over arrival order (probed)") {
    assert(one("json_group_array(v) FROM g") == "[1,2,3]")
    assert(one("json_group_array(k) FROM g") == """["a","b","a"]""")
    assert(one("json_group_object(k,v) FROM g") ==
      """{"a":1,"b":2,"a":3}""")
    assert(one("json_group_array(v) FROM g WHERE 0") == "[]")
    assert(one("json_group_object(k,v) FROM g WHERE 0") == "{}")
    // NULL elements are kept (probed ["a",null] / [1,4])
    assert(one("json_group_array(k) FROM gn") == """["a",null]""")
    assert(one("json_group_array(v) FROM gn") == "[1,4]")
  }

  test("json over column-held documents (non-literal path)") {
    val r = db.queryStringStmt(
      "SELECT id, json_extract(j, '$.t') AS t FROM docs ORDER BY id")
      .fold(e => fail(e), identity).head
    assert(r.values.map(_.map(unwrap)) ==
      Seq(Seq(1L, "x"), Seq(2L, "y")))
    val r2 = db.queryStringStmt(
      "SELECT id FROM docs WHERE json_extract(j, '$.t') = 'y'")
      .fold(e => fail(e), identity).head
    assert(r2.values.map(_.map(unwrap)) == Seq(Seq(2L)))
    val r3 = db.queryStringStmt(
      "SELECT json_set(j, '$.n', 7) AS s FROM docs ORDER BY id")
      .fold(e => fail(e), identity).head
    assert(r3.values.map(_.map(unwrap)) ==
      Seq(Seq("""{"a":1,"t":"x","n":7}"""), Seq("""{"a":2,"t":"y","n":7}""")))
  }

  test("-> and ->> operators (probed, incl. shorthand paths + chains)") {
    assert(one("""'{"a":1}' -> '$.a'""") == "1")
    assert(one("""'{"a":1}' -> 'a'""") == "1")
    assert(one("""'[1,2]' -> 1""") == "2")
    assert(one("""'[1,2]' -> 2""") == null)
    assert(one("""'{"a":{"b":5}}' -> 'a' -> 'b'""") == "5")
    assert(one("""'{"a":1}' ->> 'a'""") == 1L)
    assert(one("""'{"a":"x"}' -> 'a'""") == "\"x\"")
    assert(one("""'{"a":"x"}' ->> 'a'""") == "x")
    assert(one("""'{"a":[1,2]}' -> 'a'""") == "[1,2]")
    assert(one("""'{"a":[1,2]}' ->> 'a'""") == "[1,2]")
    assert(one("""'{"a":1}' -> 'zz'""") == null)
    assert(one("""'{"a":2.5}' ->> 'a'""") == 2.5)
    assert(one("""typeof('{"a":1}' -> 'a')""") == "text")
    assert(one("""typeof('{"a":1}' ->> 'a')""") == "integer")
    assert(one("""'{"a":true}' ->> 'a'""") == 1L)
    assert(one("""'{"a":true}' -> 'a'""") == "true")
    assert(one("""'{"a":null}' -> 'a'""") == "null")
    assert(one("""'{"a":null}' ->> 'a'""") == null)
    assert(one("""'{"a":1}' -> '$.a' = 1""") == 0L)
    assert(one("""'[1,2]' -> '$[#-1]'""") == "2")
    assert(one("""NULL -> 'a'""") == null)
    assert(one("""'{"a":1}' -> NULL""") == null)
    assert(err("""'{bad' -> 'a'""") == "malformed JSON")
    // column operand + chained comparisons through the envelope
    val r = db.queryStringStmt(
      "SELECT id FROM docs WHERE j ->> 't' = 'y'")
      .fold(e => fail(e), identity).head
    assert(r.values.map(_.map(unwrap)) == Seq(Seq(2L)))
    val r2 = db.queryStringStmt("SELECT j -> 'a' AS a FROM docs ORDER BY id")
      .fold(e => fail(e), identity).head
    assert(r2.values.map(_.map(unwrap)) == Seq(Seq("1"), Seq("2")))
  }

  test("json_each/json_tree stay unimplemented with SQLite's error") {
    val e = db.queryStringStmt(
      "SELECT * FROM json_each('[1,2]')")
    assert(e.isLeft, e)
  }
}
