package graft.functions

import graft.{SparkSpec, Tables}

/** Pins the r15 token-stat kernels value-identical to the interpreted
  * higher-order-function formulations they replaced (x49/x50/x96/x97/x102). */
class TokenStatsSpec extends SparkSpec {

  private def corpus(): Unit = {
    GraftFunctions.register(spark)
    Tables.ensure(spark, sfDir)
    spark.sql(
      """SELECT doc_id, array_remove(split(LOWER(text), ' '), '') AS toks
        |FROM documents
        |UNION ALL
        |SELECT 900001, array('é', 'ü', 'the', 'THE', 'x1', '', '[a-z]')
        |UNION ALL
        |SELECT 900002, CAST(array() AS ARRAY<STRING>)""".stripMargin)
      .createOrReplaceTempView("__ts_in")
  }

  test("count_in equals size(filter(x IN (...)))") {
    corpus()
    val bad = spark.sql(
      """SELECT COUNT(*) FROM __ts_in
        |WHERE count_in(toks, array('the','and','of','to','in','is','it','that'))
        |  <> CAST(size(filter(toks,
        |       x -> x IN ('the','and','of','to','in','is','it','that'))) AS INT)"""
        .stripMargin).head.getLong(0)
    assert(bad == 0)
  }

  test("count_rlike equals size(filter(w RLIKE ...))") {
    corpus()
    val bad = spark.sql(
      """SELECT COUNT(*) FROM __ts_in
        |WHERE count_rlike(toks, '[a-z]')
        |  <> CAST(size(filter(toks, w -> w RLIKE '[a-z]')) AS INT)"""
        .stripMargin).head.getLong(0)
    assert(bad == 0)
  }

  test("sum_lengths equals AGGREGATE(acc + length(w))") {
    corpus()
    val bad = spark.sql(
      """SELECT COUNT(*) FROM __ts_in
        |WHERE sum_lengths(toks)
        |  <> AGGREGATE(toks, CAST(0 AS BIGINT), (acc, w) -> acc + length(w))"""
        .stripMargin).head.getLong(0)
    assert(bad == 0)
  }

  test("kernels stay inside whole-stage codegen") {
    corpus()
    val plan = spark.sql(
      """SELECT count_in(toks, array('a')), count_rlike(toks, 'a'),
        |       sum_lengths(toks) FROM __ts_in""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"), plan)
  }

  test("max_freq equals the sorted-run aggregate() scan") {
    corpus()
    val bad = spark.sql(
      """SELECT COUNT(*) FROM __ts_in WHERE size(toks) > 0 AND
        |  max_freq(toks) <> aggregate(array_sort(toks),
        |    named_struct('prev', '', 'run', 0, 'best', 0),
        |    (s, t) -> named_struct('prev', t,
        |      'run', CASE WHEN t = s.prev THEN s.run + 1 ELSE 1 END,
        |      'best', GREATEST(s.best,
        |        CASE WHEN t = s.prev THEN s.run + 1 ELSE 1 END)),
        |    s -> s.best)""".stripMargin).head.getLong(0)
    assert(bad == 0)
    val r = spark.sql(
      "SELECT max_freq(CAST(array() AS ARRAY<STRING>)) AS a").head
    assert(r.getInt(0) == 0)
  }
}
