package graft.engine

import graft.SparkSpec
import graft.command._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Seeded property generalization of FastValuesSpec (same no-bridge pattern
  * as TxPropertySpec): random literal tuples inserted as plain literals
  * (fast-path eligible) and as expression-wrapped equivalents (always the
  * Catalyst path) must read back identically through the query envelope.
  * Generators deliberately mix fast-path-safe shapes with bail-out shapes
  * (quotes needing escape, unicode, huge magnitudes, exponent forms) so
  * both routes and the routing decision itself are exercised.
  */
class FastValuesPropertySpec extends SparkSpec {

  private def check[A](gen: Gen[A], trials: Int = 30)(prop: A => Boolean): Unit =
    (1 to trials).foreach { i =>
      val sample = gen(Gen.Parameters.default, Seed(i.toLong)).get
      assert(prop(sample), s"failed for seed $i: $sample")
    }

  // SQL renderings of one logical (i, r, t) value triple:
  // (literal form, expression-wrapped form forcing the Catalyst path)
  private case class Triple(intLit: String, realLit: String, strLit: String)

  private val intGen: Gen[String] = Gen.oneOf(
    Gen.choose(-1000000L, 1000000L).map(_.toString),
    Gen.oneOf("0", "-0", "+7", "9223372036854775807", "-9223372036854775808"),
    Gen.const("NULL"))

  private val realGen: Gen[String] = Gen.oneOf(
    Gen.choose(-1e6, 1e6).map(d => f"$d%.6f"),
    Gen.oneOf("0.0", ".5", "5.", "1e3", "1.25e-2", "-3.5E2", "1e308"),
    Gen.const("NULL"))

  private val strGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(s => s"'${s.take(12)}'"),
    Gen.oneOf("''", "'it''s'", "'ünï中文'", "'  pad  '", "'a,b(c)'"),
    Gen.const("NULL"))

  private val tripleGen: Gen[Triple] =
    for { i <- intGen; r <- realGen; s <- strGen } yield Triple(i, r, s)

  private def wrap(lit: String, kind: Char): String =
    if (lit == "NULL") "NULL"
    else kind match {
      case 'i' => s"($lit) + 0"
      case 'r' => s"($lit) * 1"
      case 's' => s"($lit) || ''"
    }

  private def freshDb: GraftDb = {
    val db = GraftDb.openInMemory(spark)
    db.executeStringStmt(
      "CREATE TABLE p (id INTEGER PRIMARY KEY, i INTEGER, r REAL, t TEXT)")
    db
  }

  test("random literal tuples: fast path and Catalyst path store equal values") {
    check(Gen.listOfN(4, tripleGen)) { triples =>
      val fast = freshDb
      val slow = freshDb
      triples.zipWithIndex.foreach { case (tr, id) =>
        val lit = s"($id, ${tr.intLit}, ${tr.realLit}, ${tr.strLit})"
        val exp = s"($id, ${wrap(tr.intLit, 'i')}, ${wrap(tr.realLit, 'r')}, ${wrap(tr.strLit, 's')})"
        val a = fast.executeStringStmt(s"INSERT INTO p(id, i, r, t) VALUES $lit")
        val b = slow.executeStringStmt(s"INSERT INTO p(id, i, r, t) VALUES $exp")
        assert(a.isRight === b.isRight, s"status diverged for $lit vs $exp: $a vs $b")
      }
      val q = "SELECT i, r, t FROM p ORDER BY id"
      val fa = fast.queryStringStmt(q).toOption.get.head.values
      val sl = slow.queryStringStmt(q).toOption.get.head.values
      fa == sl
    }
  }
}
