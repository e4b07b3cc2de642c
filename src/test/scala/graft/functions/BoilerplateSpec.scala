package graft.functions

import graft.{SparkSpec, Tables}

/** Pins the boilerplate_strip kernel (r16) value-identical to the
  * explode + anti-join + sort-collect tail it replaced on the x114 path. */
class BoilerplateSpec extends SparkSpec {

  /** The pre-r16 x114 tail over (doc_id, source, tk) in __bp_toks. */
  private def oldFormulation(minDf: Int) =
    s"""WITH pos AS (SELECT doc_id, source, p + 1 AS i, gram
       |             FROM __bp_toks
       |             LATERAL VIEW posexplode(word_ngrams(tk, 5)) AS p, gram),
       |bp AS (SELECT source, gram
       |       FROM (SELECT source, gram, COUNT(DISTINCT doc_id) AS df
       |             FROM pos GROUP BY source, gram)
       |       WHERE df >= $minDf),
       |cover AS (SELECT DISTINCT p.doc_id, explode(sequence(p.i, p.i + 4)) AS j
       |          FROM pos p
       |          JOIN bp b ON p.source = b.source AND p.gram = b.gram),
       |tokpos AS (SELECT doc_id, p + 1 AS j, tok
       |           FROM (SELECT doc_id, posexplode(tk) AS (p, tok)
       |                 FROM __bp_toks)),
       |kept AS (SELECT t.doc_id, t.j, t.tok
       |         FROM tokpos t LEFT JOIN cover c
       |           ON t.doc_id = c.doc_id AND t.j = c.j
       |         WHERE c.doc_id IS NULL)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_toks,
       |  md5(CAST(array_join(sort_array(collect_list(
       |    concat(tok, ':', CAST(j AS STRING)))), ' ') AS BINARY)) AS clean_fp
       |FROM kept GROUP BY doc_id""".stripMargin

  /** The r16 kernel tail (the x114 query shape). */
  private def newFormulation(minDf: Int) =
    s"""WITH pos AS (SELECT doc_id, source, p + 1 AS i, gram
       |             FROM __bp_toks
       |             LATERAL VIEW posexplode(word_ngrams(tk, 5)) AS p, gram),
       |bp AS (SELECT source, gram
       |       FROM (SELECT source, gram, COUNT(DISTINCT doc_id) AS df
       |             FROM pos GROUP BY source, gram)
       |       WHERE df >= $minDf),
       |mi AS (SELECT p.doc_id, collect_list(p.i) AS mpos
       |       FROM pos p JOIN bp b ON p.source = b.source AND p.gram = b.gram
       |       GROUP BY p.doc_id),
       |s AS (SELECT t.doc_id,
       |        boilerplate_strip(t.tk,
       |          COALESCE(m.mpos, CAST(array() AS ARRAY<INT>))) AS st
       |      FROM __bp_toks t LEFT JOIN mi m ON t.doc_id = m.doc_id)
       |SELECT doc_id, st.kept_toks AS kept_toks, st.clean_fp AS clean_fp
       |FROM s WHERE st IS NOT NULL""".stripMargin

  private def compare(minDf: Int): Unit = {
    val o = spark.sql(oldFormulation(minDf))
    val n = spark.sql(newFormulation(minDf))
    assert(o.exceptAll(n).isEmpty && n.exceptAll(o).isEmpty,
      s"boilerplate_strip diverges from the anti-join formulation (df >= $minDf)")
  }

  test("boilerplate_strip matches the anti-join formulation on the corpus") {
    GraftFunctions.register(spark)
    Tables.ensure(spark, sfDir)
    spark.sql(
      """SELECT doc_id, source,
        |       array_remove(split(LOWER(text), ' '), '') AS tk
        |FROM documents""".stripMargin)
      .createOrReplaceTempView("__bp_toks")
    compare(minDf = 10)
    compare(minDf = 2) // denser boilerplate set: more docs with matches
  }

  test("boilerplate_strip matches on edge shapes") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // planted repeated 5-gram ("a b c d e") across >= 3 docs of one source;
    // a fully-boilerplate doc (drops from the output in both forms); short
    // docs below the gram width; unicode tokens; overlapping matches
    Seq(
      (1L, "s1", "a b c d e tail1 x y"),
      (2L, "s1", "head a b c d e tail2"),
      (3L, "s1", "a b c d e"),
      (4L, "s1", "a b c d e a b c d e"),
      (5L, "s1", "nur ünïcode wörter hier stehen geblieben"),
      (6L, "s1", "short doc"),
      (7L, "s2", "a b c d e different source no match"),
      (8L, "s1", ""))
      .toDF("doc_id", "source", "text")
      .selectExpr("doc_id", "source",
        "array_remove(split(LOWER(text), ' '), '') AS tk")
      .createOrReplaceTempView("__bp_toks")
    compare(minDf = 3)
    compare(minDf = 1) // every gram is boilerplate: max coverage
  }
}
