package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.unsafe.types.UTF8String

/** Value-parity pins for the r15 optimization-round expressions:
  * graft_levenshtein must equal the `levenshtein` builtin everywhere
  * (ASCII fast path AND the Unicode fallback), and the n-gram kernels
  * must equal the interpreted-lambda / window-lead formulations they
  * replace on the x54/x82/x106/x111 paths. */
class NGramsEditDistanceSpec extends SparkSpec {

  test("graft_levenshtein equals the builtin on random ASCII strings " +
       "including block boundaries") {
    val rnd = new scala.util.Random(421)
    val alpha = "abcde fgh"
    def randStr(n: Int): String =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    // lengths straddle the 64/128/192 Myers block boundaries
    val lengths = Seq(0, 1, 2, 7, 63, 64, 65, 100, 127, 128, 129, 191, 192,
      193, 300, 577)
    for (_ <- 0 until 200) {
      val a = randStr(lengths(rnd.nextInt(lengths.length)))
      val b = randStr(lengths(rnd.nextInt(lengths.length)))
      val ua = UTF8String.fromString(a)
      val ub = UTF8String.fromString(b)
      val expect = ua.levenshteinDistance(ub)
      val got = EditDistance.levenshtein(ua, ub)
      assert(got == expect, s"lev('$a','$b'): got $got expected $expect")
    }
  }

  test("graft_levenshtein equals the builtin on near-duplicate word " +
       "shuffles (the x84 workload shape)") {
    val rnd = new scala.util.Random(77)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    for (_ <- 0 until 100) {
      val base = Vector.fill(40 + rnd.nextInt(60))(words(rnd.nextInt(words.length)))
      val shuffled = rnd.shuffle(base)
      val ua = UTF8String.fromString(base.mkString(" "))
      val ub = UTF8String.fromString(shuffled.mkString(" "))
      assert(EditDistance.levenshtein(ua, ub) == ua.levenshteinDistance(ub))
    }
  }

  test("graft_levenshtein falls back identically on non-ASCII input") {
    val cases = Seq(
      ("café latte", "cafe latte"),
      ("über", "uber"),
      ("日本語の文", "日本の文"),
      ("naïve", "naive"),
      ("", "é"), ("é", ""))
    for ((a, b) <- cases) {
      val ua = UTF8String.fromString(a)
      val ub = UTF8String.fromString(b)
      assert(EditDistance.levenshtein(ua, ub) == ua.levenshteinDistance(ub),
        s"lev('$a','$b')")
    }
  }

  test("graft_levenshtein SQL expression matches the builtin over the " +
       "corpus and stays in whole-stage codegen") {
    GraftFunctions.register(spark)
    Tables.ensure(spark, sfDir)
    val df = spark.sql(
      """SELECT COUNT(*) AS n,
        |  SUM(CASE WHEN graft_levenshtein(a.text, b.text)
        |             <> levenshtein(a.text, b.text) THEN 1 ELSE 0 END) AS bad
        |FROM documents a JOIN documents b
        |  ON a.doc_id % 7 = b.doc_id % 7 AND a.doc_id < b.doc_id""".stripMargin)
    val r = df.head
    assert(r.getLong(0) > 0)
    assert(r.getLong(1) == 0, s"${r.getLong(1)} divergences")
    val plan = spark.sql(
      "SELECT graft_levenshtein(text, text) FROM documents")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"), plan)
  }

  test("word_ngrams equals the transform(sequence(...)) formulation") {
    GraftFunctions.register(spark)
    Tables.ensure(spark, sfDir)
    for (n <- Seq(2, 3, 5)) {
      val bad = spark.sql(
        s"""WITH t AS (SELECT doc_id,
           |             array_remove(split(LOWER(text), ' '), '') AS tk
           |           FROM documents)
           |SELECT COUNT(*) AS bad FROM t
           |WHERE NOT (word_ngrams(tk, $n) <=> (CASE WHEN size(tk) >= $n THEN
           |  transform(sequence(1, size(tk) - ${n - 1}), i ->
           |    concat_ws(' ', ${(0 until n).map(k => s"element_at(tk, i + $k)").mkString(", ")}))
           |  ELSE array() END))""".stripMargin).head.getLong(0)
      assert(bad == 0, s"n=$n: $bad mismatching docs")
    }
  }

  test("ngram_hashes_sorted equals the distinct-gram xxhash64 aggregation") {
    GraftFunctions.register(spark)
    Tables.ensure(spark, sfDir)
    val bad = spark.sql(
      """WITH t AS (SELECT doc_id,
        |             array_remove(split(LOWER(text), ' '), '') AS tk
        |           FROM documents),
        |old AS (SELECT doc_id, sort_array(collect_list(xxhash64(g))) AS h3,
        |               COUNT(*) AS n3
        |        FROM (SELECT DISTINCT doc_id, g FROM (
        |                SELECT doc_id, explode(word_ngrams(tk, 3)) AS g FROM t))
        |        GROUP BY doc_id),
        |new AS (SELECT doc_id, ngram_hashes_sorted(tk, 3) AS h3n FROM t
        |        WHERE size(tk) >= 3)
        |SELECT COUNT(*) AS bad
        |FROM old JOIN new ON old.doc_id = new.doc_id
        |WHERE NOT (old.h3 <=> new.h3n) OR old.n3 <> size(new.h3n)"""
        .stripMargin).head.getLong(0)
    assert(bad == 0, s"$bad mismatching docs")
  }

  test("word n-gram edge cases: short arrays, empty array") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT word_ngrams(array('a'), 3) AS a,
        |       word_ngrams(CAST(array() AS ARRAY<STRING>), 2) AS b,
        |       word_ngrams(array('x', 'y', 'z'), 3) AS c,
        |       ngram_hashes_sorted(array('a'), 3) AS d,
        |       ngram_hashes_sorted(array('x', 'y', 'z'), 3) AS e,
        |       xxhash64('x y z') AS xh""".stripMargin).head
    assert(r.getSeq[String](0).isEmpty)
    assert(r.getSeq[String](1).isEmpty)
    assert(r.getSeq[String](2) == Seq("x y z"))
    assert(r.getSeq[Long](3).isEmpty)
    assert(r.getSeq[Long](4) == Seq(r.getLong(5)))
  }
}
