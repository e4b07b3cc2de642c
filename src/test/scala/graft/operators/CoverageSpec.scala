package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Coverage for §2 rows without a driver-oracle query: external formats
  * (B8), map functions (B61 — no map column exists in the testdata, so
  * unit-level), and recursive CTE (B52 stretch, Spark 4.x).
  */
class CoverageSpec extends SparkSpec {

  test("B8: csv and json roundtrip the same rows as parquet") {
    Tables.ensure(spark, sfDir)
    val region = spark.table("region")
    val tmp = java.nio.file.Files.createTempDirectory("fmt").toString
    region.write.option("header", "true").csv(s"$tmp/region_csv")
    region.write.json(s"$tmp/region_json")
    val fromCsv = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$tmp/region_csv")
    val fromJson = spark.read.json(s"$tmp/region_json")
    val base = region.orderBy("r_regionkey").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(fromCsv.orderBy("r_regionkey").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == base)
    assert(fromJson.orderBy("r_regionkey")
      .select("r_regionkey", "r_name").collect()
      .map(r => (r.getLong(0).toInt, r.getString(1))).toSeq == base)
  }

  test("B8: orc roundtrips schema and rows exactly (columnar alternative)") {
    Tables.ensure(spark, sfDir)
    val nation = spark.table("nation")
    val tmp = java.nio.file.Files.createTempDirectory("fmt_orc").toString
    nation.write.orc(s"$tmp/nation_orc")
    val fromOrc = spark.read.orc(s"$tmp/nation_orc")
    assert(fromOrc.schema == nation.schema) // ORC keeps types, unlike csv
    assert(fromOrc.orderBy("n_nationkey").collect().map(_.toString).toSeq ==
      nation.orderBy("n_nationkey").collect().map(_.toString).toSeq)
    // predicate pushdown reaches the ORC scan like parquet
    val plan = fromOrc.filter(col("n_regionkey") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"),
      plan.take(800))
  }

  test("B61: map functions (map_keys/map_values/element_at)") {
    val df = spark.sql(
      """SELECT map('a', 1, 'b', 2) AS m""")
    val r = df.selectExpr(
      "sort_array(map_keys(m)) AS ks",
      "sort_array(map_values(m)) AS vs",
      "element_at(m, 'b') AS b",
      "m['a'] AS a").head
    assert(r.getSeq[String](0) == Seq("a", "b"))
    assert(r.getSeq[Int](1) == Seq(1, 2))
    assert(r.getInt(2) == 2 && r.getInt(3) == 1)
  }

  test("B52: recursive CTE (Spark 4.x)") {
    try {
      val out = spark.sql(
        """WITH RECURSIVE t(n) AS (
          |  SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5)
          |SELECT n FROM t ORDER BY n""".stripMargin)
        .collect().map(_.getInt(0)).toSeq
      assert(out == Seq(1, 2, 3, 4, 5))
    } catch {
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        cancel(s"recursive CTE not supported by this Spark build: ${e.getMessage.take(80)}")
    }
  }

  test("B41: OFFSET without LIMIT also works (Spark 3.4+)") {
    Tables.ensure(spark, sfDir)
    val n = spark.sql(
      "SELECT r_regionkey FROM region ORDER BY r_regionkey OFFSET 2").count()
    assert(n == 3)
  }

  test("B32: HLL sketch ops serve distinct counts without exact shuffle") {
    Tables.ensure(spark, sfDir)
    val plan = spark.sql(
      "SELECT approx_count_distinct(l_partkey) FROM lineitem")
      .queryExecution.executedPlan.toString
    // one aggregation, no expand/distinct shuffle stage
    assert(!plan.contains("Expand"), plan)
  }

  test("B26 approx twin: approx_percentile within 2% of exact (q62's sketch path)") {
    // q62 oracle-checks the exact interpolated percentile; the sketch
    // variant (one-pass mergeable t-digest-style summary — the 100 TB form,
    // where exact percentile means a full sort per group) stays within the
    // declared accuracy envelope instead of a hash compare.
    Tables.ensure(spark, sfDir)
    val r = spark.sql(
      """SELECT percentile(o_totalprice, 0.5) AS exact,
        |       approx_percentile(o_totalprice, 0.5, 10000) AS approx
        |FROM orders""".stripMargin).head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx $approx vs exact $exact")
  }

  test("x69: BM25 top-k ranks via per-partition heaps, not a global sort") {
    Tables.ensure(spark, sfDir)
    val q = graft.ext.Extensions.all.find(_.name == "x69_bm25").get.spark
    val plan = spark.sql(q).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }
}
