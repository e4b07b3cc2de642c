package graft.ext

import graft.Tables
import graft.functions.CountMin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frequency sketching over the token stream (vocabulary stats without a
  * by-token shuffle — see [[graft.functions.CountMin]]). */
object Frequency {

  /** x80 driver row: heavy hitters — the exact top-20 tokens (count DESC,
    * token — unique order) each checked against the count-min estimate.
    * `est_ok` is TRUE by the sketch's never-underestimates guarantee, so
    * the DuckDB twin can enumerate the same top-20 exactly and pin the
    * boolean; the sketch interior (ε-bound tightness) stays
    * property-tested in FrequencySpec. The sketch itself collects to the
    * driver as d·w = 4096 longs (32 KB, corpus-size-independent — the
    * documented driver boundary for this row). */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.ensure(spark, dir)
    // materialize the token explode once — the sketch pass and the exact
    // top-20 pass both scan it, and re-exploding the corpus is the whole
    // cost of this row
    val toks = spark.sql(
      """SELECT explode(array_remove(split(LOWER(text), ' '), '')) AS tok
        |FROM documents""".stripMargin).as[String].persist()
    val (sketch, top) = try {
      (toks.select(CountMin.agg.toColumn).head(),
        toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("tok")).limit(20)
          .as[(String, Long)].collect())
    } finally toks.unpersist()
    top.map { case (tok, c) =>
      (tok, c, CountMin.estimate(sketch, tok) >= c)
    }.toSeq.toDF("tok", "c", "est_ok")
      .orderBy(col("c").desc, col("tok"))
  }

  /** DuckDB twin for [[heavyHitters]]: the exact top-20 with the
    * guaranteed-true flag. */
  val heavyHittersDuck: String =
    """SELECT tok, c, TRUE AS est_ok FROM (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT unnest(list_filter(string_split(LOWER(text), ' '),
      |                x -> x <> '')) AS tok
      |        FROM documents)
      |  GROUP BY tok ORDER BY c DESC, tok LIMIT 20)
      |ORDER BY c DESC, tok""".stripMargin
}
