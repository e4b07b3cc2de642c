package graft.engine

import graft.SparkSpec
import graft.command.Value

/** SQLite core-function goldens on the engine query surface — every row
  * probed live on SQLite 3.40 (see SqliteFunctions for the semantics
  * notes: format-not-calendar validation, field-wise month arithmetic,
  * julian/unixepoch numeric values, NULL on unknown strftime codes). */
class SqliteFunctionsSpec extends SparkSpec {

  private lazy val db = {
    val d = GraftDb.openInMemory(spark, 500)
    val r = d.executeStringStmt(
      "CREATE TABLE t (id INTEGER PRIMARY KEY, ts TEXT)")
      .fold(e => fail(e), identity).head
    assert(r.error.isEmpty, r.error)
    val r2 = d.executeStringStmt(
      "INSERT INTO t(ts) VALUES ('2024-03-05 14:30:15'), ('2024-12-31')")
      .fold(e => fail(e), identity).head
    assert(r2.error.isEmpty, r2.error)
    d
  }

  private def one(sql: String): Any =
    db.queryStringStmt(s"SELECT $sql").fold(e => fail(s"[$sql] $e"), identity)
      .head.values.head.head match {
      case Value.Integer(v) => v
      case Value.Text(v) => v
      case Value.Real(v) => v
      case Value.Null => null
      case v => v
    }

  test("date/time/datetime: parsing, rendering, defaults (probed)") {
    val goldens = Seq(
      "date('2024-03-05')" -> "2024-03-05",
      "date('2024-03-05 14:30:15')" -> "2024-03-05",
      "time('2024-03-05 14:30:15')" -> "14:30:15",
      "time('14:30')" -> "14:30:00",
      "datetime('2024-03-05T14:30:15')" -> "2024-03-05 14:30:15",
      "datetime('2024-03-05 14:30:15.250')" -> "2024-03-05 14:30:15",
      "time('2024-03-05')" -> "00:00:00",
      "date('14:30:15')" -> "2000-01-01",
      // format is validated, calendar validity is NOT (echoes verbatim)
      "date('2024-02-30')" -> "2024-02-30",
      "date('2024-03-5')" -> null,
      "datetime('2024-3-5')" -> null,
      "time('9:5')" -> null,
      "date('bogus')" -> null,
      "date(NULL)" -> null,
      // numeric time values are julian days; epoch behind the modifier
      "date(2460374.5)" -> "2024-03-05",
      "datetime(2460375.0)" -> "2024-03-05 12:00:00",
      "datetime(1709650215, 'unixepoch')" -> "2024-03-05 14:50:15",
      "date(0, 'unixepoch')" -> "1970-01-01")
    goldens.foreach { case (e, want) =>
      assert(one(e) == want, s"$e => ${one(e)} (want $want)") }
  }

  test("modifiers: field-wise month math, day-granular normalization") {
    val goldens = Seq(
      "date('2024-01-31', '+1 month')" -> "2024-03-02",
      "date('2024-02-30', '+1 month')" -> "2024-03-30",
      "date('2024-02-30', '+0 days')" -> "2024-03-01",
      "date('2024-03-05', '-40 days')" -> "2024-01-25",
      "date('2024-03-05', 'start of month')" -> "2024-03-01",
      "date('2024-03-05', 'start of year')" -> "2024-01-01",
      "datetime('2024-03-05 14:30:15', 'start of day')" -> "2024-03-05 00:00:00",
      "date('2024-03-05', 'weekday 0')" -> "2024-03-10",
      "date('2024-03-03', 'weekday 0')" -> "2024-03-03",
      "date('2024-03-05', 'weekday 6')" -> "2024-03-09",
      "date('2024-03-05', '+1 year', '-2 days')" -> "2025-03-03",
      "time('14:30:15', '+90 minutes')" -> "16:00:15",
      "time('14:30:15', '+0.5 hours')" -> "15:00:15",
      "datetime('2024-03-05', '+1.25 days')" -> "2024-03-06 06:00:00",
      "datetime('2024-03-05 14:30:15', '+1 day', '+2 hours')" -> "2024-03-06 16:30:15",
      "datetime('2024-03-05 14:30', '+10 seconds')" -> "2024-03-05 14:30:10",
      "date('2024-03-05', '1 day')" -> "2024-03-06",
      "date('2024-03-05', '+2 day')" -> "2024-03-07",
      "datetime('2024-03-05 14:30:15', '+1 months', 'start of month')" ->
        "2024-04-01 00:00:00",
      // each modifier applies on raw fields THEN normalizes (probed)
      "date('2024-01-31', '+1 month', '+1 month')" -> "2024-04-02",
      "date('2024-01-31', '+2 months')" -> "2024-03-31",
      "date('2024-02-30', 'start of month')" -> "2024-02-01",
      // …while strftime's field codes read the raw fields
      "strftime('%d', '2024-02-30')" -> "30")
    goldens.foreach { case (e, want) =>
      assert(one(e) == want, s"$e => ${one(e)} (want $want)") }
  }

  test("strftime and julian/epoch conversions") {
    assert(one("strftime('%Y|%m|%d|%H|%M|%S|%j|%w|%W', '2024-03-05 14:30:15')")
      == "2024|03|05|14|30|15|065|2|10")
    assert(one("strftime('%s', '2024-03-05 14:30:15')") == "1709649015")
    assert(one("strftime('%s', '2024-03-05')") == "1709596800")
    assert(one("strftime('%%Y = %Y', '2024-03-05')") == "%Y = 2024")
    assert(one("strftime('%f', '2024-03-05 14:30:15.250')") == "15.250")
    assert(one("strftime('%J', '2024-03-05 12:00:00')") == "2460375")
    // unknown codes null the WHOLE result (probed: %e/%F/%l/%k)
    assert(one("strftime('%e|%F', '2024-03-05 04:30:15')") == null)
    assert(one("julianday('2024-03-05')") == 2460374.5)
    assert(one("julianday('2024-03-05 12:00:00')") == 2460375.0)
    assert(one("unixepoch('2024-03-05 14:30:15')") == 1709649015L)
  }

  test("min/max arity overloads and total() (probed)") {
    assert(one("min(3, 7, 5)") == 3L)
    assert(one("max(3, 7, 5)") == 7L)
    assert(one("min(1, NULL)") == null) // scalar form NULLs on any NULL
    assert(one("max('a', 'b')") == "b")
    // arity-1 stays the aggregate, windows included
    assert(one("min(id) FROM t") == 1L)
    assert(one("max(id) OVER () FROM t LIMIT 1") == 2L)
    assert(one("total(id) FROM t") == 3.0)
    assert(one("total(id) FROM t WHERE id > 90") == 0.0)
  }

  test("misc scalars: iif, unicode, char; functions work over columns") {
    assert(one("iif(1 > 0, 'a', 'b')") == "a")
    assert(one("unicode('Abc')") == 65L)
    assert(one("unicode('')") == null)
    assert(one("char(72, 105)") == "Hi")
    val rows = db.queryStringStmt(
      "SELECT id, date(ts), strftime('%Y-%j', ts) FROM t ORDER BY id")
      .fold(e => fail(e), identity).head.values.map(_.map {
        case Value.Integer(v) => v; case Value.Text(v) => v
        case Value.Null => null; case v => v
      })
    assert(rows == Seq(Seq(1L, "2024-03-05", "2024-065"),
      Seq(2L, "2024-12-31", "2024-366")), s"got $rows")
  }

  test("'now' and host-zone reads are rejected loudly (determinism)") {
    val e = db.queryStringStmt("SELECT date('now')")
      .fold(identity, r => fail(s"expected rejection, got $r"))
    assert(e.contains("non-deterministic time value 'now'"), e)
    val e2 = db.queryStringStmt("SELECT datetime('2024-03-05', 'localtime')")
      .fold(identity, r => fail(s"expected rejection, got $r"))
    assert(e2.contains("non-deterministic time value 'localtime'"), e2)
  }
}
