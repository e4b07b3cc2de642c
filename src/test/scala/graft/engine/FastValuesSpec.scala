package graft.engine

import graft.SparkSpec
import graft.command._

/** Bit-parity pin for the literal INSERT fast path ([[FastValues]]): the
  * same logical values inserted through the fast path (plain literals) and
  * through the Catalyst path (expression-wrapped, which FastValues always
  * rejects) must be indistinguishable through the query envelope. Also
  * pins the bail-outs: shapes FastValues must NOT claim (expressions,
  * backslash strings, type-coerced literals) still work via Catalyst.
  */
class FastValuesSpec extends SparkSpec {

  private def freshDb: GraftDb = {
    val db = GraftDb.openInMemory(spark)
    db.executeStringStmt(
      "CREATE TABLE m (id INTEGER PRIMARY KEY, i INTEGER, r REAL, t TEXT)")
    db
  }

  private def rows(db: GraftDb): Seq[Seq[Value]] =
    db.queryStringStmt("SELECT i, r, t FROM m ORDER BY id")
      .toOption.get.head.values

  test("fast path stores bit-identical values to the Catalyst path") {
    val fast = freshDb
    val slow = freshDb
    // literal matrix: ints (signs, zero), reals (point/exponent forms),
    // strings (empty, '' escape, unicode), NULLs, int-widening into REAL,
    // int-rendering into TEXT
    val tuples = Seq(
      "(1, 42, 1.5, 'plain')",
      "(2, -7, .5, '')",
      "(3, +7, 5., 'it''s')",
      "(4, 0, 1e3, 'unié中')",
      "(5, -0, 1.25e-2, NULL)",
      "(6, NULL, 7, '  padded  ')",
      "(7, 9223372036854775807, -2.5, '9')")
    tuples.foreach { t =>
      assert(fast.executeStringStmt(
        s"INSERT INTO m(id, i, r, t) VALUES $t").isRight)
    }
    // identical values, expression-wrapped so FastValues bails and the
    // original Catalyst route stores them
    val wrapped = Seq(
      "(1, 42+0, 1.5*1, 'plain' || '')",
      "(2, -7+0, .5*1, '' || '')",
      "(3, +7+0, 5.*1, 'it''s' || '')",
      "(4, 0+0, 1e3*1, 'unié中' || '')",
      "(5, -0+0, 1.25e-2*1, NULL)",
      "(6, NULL, 7*1, '  padded  ' || '')",
      "(7, 9223372036854775807+0, -2.5*1, '9' || '')")
    wrapped.foreach { t =>
      assert(slow.executeStringStmt(
        s"INSERT INTO m(id, i, r, t) VALUES $t").isRight)
    }
    assert(rows(fast) === rows(slow))
  }

  test("bail-out shapes still insert correctly via Catalyst") {
    val db = freshDb
    // expressions, backslash strings (Spark escape semantics), string
    // literal into INTEGER (coercion), real into TEXT (rendering),
    // hex/boolean-ish, multi-row with one non-literal
    assert(db.executeStringStmt(
      "INSERT INTO m(id, i, r, t) VALUES (1, 1+1, 2.0/4, upper('ab'))").isRight)
    assert(db.executeStringStmt(
      "INSERT INTO m(id, i, r, t) VALUES (2, CAST('5' AS INTEGER), 0.5, 'a\\nb')").isRight)
    assert(db.executeStringStmt(
      "INSERT INTO m(id, t) VALUES (3, 'x'), (4, lower('Y'))").isRight)
    val got = rows(db)
    assert(got(0) === Seq(Value.Integer(2), Value.Real(0.5), Value.Text("AB")))
    assert(got(1).head === Value.Integer(5))
    assert(got(2) === Seq(Value.Null, Value.Null, Value.Text("x")))
    assert(got(3) === Seq(Value.Null, Value.Null, Value.Text("y")))
  }

  test("multi-row literal VALUES fast path keeps order and rowids") {
    val db = freshDb
    assert(db.executeStringStmt(
      "INSERT INTO m(id, i, r, t) VALUES (10, 1, 1.0, 'a'), (11, 2, 2.0, 'b'), (12, 3, 3.0, 'c')").isRight)
    assert(rows(db) === Seq(
      Seq(Value.Integer(1), Value.Real(1.0), Value.Text("a")),
      Seq(Value.Integer(2), Value.Real(2.0), Value.Text("b")),
      Seq(Value.Integer(3), Value.Real(3.0), Value.Text("c"))))
    // UNIQUE still enforced on the fast path (validate() is shared)
    val dup = db.executeStringStmt(
      "INSERT INTO m(id, t) VALUES (10, 'dup')")
    assert(dup.exists(_.exists(_.error.contains("UNIQUE constraint failed"))))
  }
}
