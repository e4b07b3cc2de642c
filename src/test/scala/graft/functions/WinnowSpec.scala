package graft.functions

import graft.{SparkSpec, Tables}

/** Pins the winnow_fp kernel (r15) value-identical to the window/lambda
  * formulation it replaced on the x64 path. */
class WinnowSpec extends SparkSpec {

  private val oldFormulation =
    """WITH d AS (SELECT doc_id, toks FROM __winnow_in),
      |tp AS (SELECT doc_id, pos, tok FROM d LATERAL VIEW posexplode(toks) AS pos, tok),
      |th AS (SELECT doc_id, pos,
      |         aggregate(transform(sequence(1, length(tok)),
      |             i -> CAST(ascii(substring(tok, i, 1)) AS BIGINT)),
      |           CAST(0 AS BIGINT), (a, c) -> (a * 31 + c) % 1000000007) AS h
      |       FROM tp),
      |kg AS (SELECT doc_id, pos,
      |         (((h * 1000003 + LEAD(h, 1) OVER (PARTITION BY doc_id ORDER BY pos)) % 1000000007) * 1000003
      |           + LEAD(h, 2) OVER (PARTITION BY doc_id ORDER BY pos)) % 1000000007 AS kh,
      |         LEAD(h, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS h2
      |       FROM th),
      |kgv AS (SELECT doc_id, pos, kh FROM kg WHERE h2 IS NOT NULL),
      |win AS (SELECT doc_id,
      |          MIN(kh) OVER (PARTITION BY doc_id ORDER BY pos
      |                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
      |          COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
      |                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
      |        FROM kgv),
      |sel AS (SELECT DISTINCT doc_id, wmin FROM win WHERE wn = 4)
      |SELECT doc_id, CAST(COUNT(wmin) AS INT) AS n_fp,
      |       CAST(MIN(wmin) AS BIGINT) AS min_fp,
      |       CAST(SUM(wmin) % 1000000007 AS BIGINT) AS fp_modsum
      |FROM sel GROUP BY doc_id""".stripMargin

  private val newFormulation =
    """SELECT doc_id, CAST(w.n_fp AS INT) AS n_fp,
      |       CAST(w.min_fp AS BIGINT) AS min_fp,
      |       CAST(w.fp_modsum AS BIGINT) AS fp_modsum
      |FROM (SELECT doc_id, winnow_fp(toks) AS w FROM __winnow_in)
      |WHERE w IS NOT NULL""".stripMargin

  private def compare(): Unit = {
    val o = spark.sql(oldFormulation)
    val n = spark.sql(newFormulation)
    assert(o.exceptAll(n).isEmpty && n.exceptAll(o).isEmpty,
      "winnow_fp diverges from the window formulation")
  }

  test("winnow_fp matches the window formulation on the corpus") {
    GraftFunctions.register(spark)
    Tables.ensure(spark, sfDir)
    spark.sql(
      """SELECT doc_id, array_remove(split(LOWER(text), ' '), '') AS toks
        |FROM documents""".stripMargin)
      .createOrReplaceTempView("__winnow_in")
    compare()
  }

  test("winnow_fp matches on edge shapes: short docs, repeats, unicode") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val docs = Seq(
      (1L, ""), (2L, "a"), (3L, "a b c d e"), // below the 6-token floor
      (4L, "a b c d e f"),                     // exactly one window
      (5L, "x x x x x x x x x x"),             // all-identical fingerprints
      (6L, (1 to 40).map(i => s"w${i % 7}").mkString(" ")),
      (7L, "café über naïve 東京 ασδ ζ η θ ι κ λ μ"), // unicode chars
      (8L, (1 to 100).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    docs.selectExpr("doc_id",
      "array_remove(split(LOWER(text), ' '), '') AS toks")
      .createOrReplaceTempView("__winnow_in")
    compare()
  }
}
