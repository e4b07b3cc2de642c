package graft.tools

import graft.SparkSpec

/** The randomized differential-SQL harness (VERDICT r10 #1):
  * graft.tools.SqlFuzz + graft.Fuzz (Spark side) + tools/check_fuzz.py
  * (DuckDB side). This spec pins the generator's contracts and the
  * triaged divergence classes; the cross-engine campaigns themselves are
  * recorded in BASELINE.md §"Differential-SQL fuzz campaigns" (r12:
  * 21k+ seeds across grammar v1/v2 at sf0.001 and sf0.01, zero true
  * divergences).
  */
class FuzzSpec extends SparkSpec {

  test("generation is deterministic: same seed, same SQL") {
    (1L to 200L).foreach { seed =>
      assert(SqlFuzz.gen(seed) == SqlFuzz.gen(seed), s"seed $seed unstable")
    }
    // and seeds actually vary the query
    assert((1L to 50L).map(SqlFuzz.gen).distinct.size > 45)
  }

  test("every generated query runs on Spark with fuzz-domain output types") {
    graft.Tables.ensure(spark, sfDir)
    graft.Fuzz.registerFuzzViews(spark)
    // 120 seeds end-to-end: parse, plan, execute, digest. Output type
    // discipline (bigint/string/date only) is enforced by Fuzz.run's cell
    // renderer, which throws on any float/decimal/timestamp escape.
    (1001L to 1120L).foreach { seed =>
      val sql = SqlFuzz.gen(seed)
      try graft.Fuzz.run(spark, sql)
      catch {
        case e: Throwable =>
          fail(s"seed $seed failed: ${e.getMessage}\nSQL: $sql")
      }
    }
  }

  test("digest is order-insensitive and count-sensitive") {
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .createOrReplaceTempView("__fz_t")
    val (n1, d1, _) = graft.Fuzz.run(spark, "SELECT k, v FROM __fz_t")
    val (n2, d2, _) =
      graft.Fuzz.run(spark, "SELECT k, v FROM __fz_t ORDER BY k DESC")
    assert(n1 == 3 && d1 == d2, "row order must not affect the digest")
    val (_, d3, _) =
      graft.Fuzz.run(spark, "SELECT k, v FROM __fz_t WHERE k < 3")
    assert(d3 != d1, "different multisets must differ")
    // duplicate rows count: UNION ALL of the table with itself
    val (_, d4, _) = graft.Fuzz.run(spark,
      "SELECT k, v FROM __fz_t UNION ALL SELECT k, v FROM __fz_t")
    assert(d4 != d1, "multiset multiplicity must affect the digest")
  }

  test("pinned dialect difference: grouping sets over empty input") {
    // Upstream Spark 4.1 emits ZERO rows for ROLLUP/CUBE/GROUPING SETS
    // over an empty input; DuckDB and PostgreSQL emit the () grouping
    // set's grand-total row (one row: NULL keys, COUNT 0), which is the
    // standard's behavior (the empty grouping set acts like an ungrouped
    // aggregate). tools/check_fuzz.py classifies exactly this signature
    // as KNOWN-DIALECT rather than a divergence. If a Spark upgrade
    // changes the behavior, this pin fails loudly — update the classifier
    // (and this spec) together.
    graft.Tables.ensure(spark, sfDir)
    val empty = spark.sql("SELECT r_name, COUNT(*) AS n FROM region " +
      "WHERE r_regionkey > 99 GROUP BY ROLLUP(r_name)").collect()
    assert(empty.isEmpty,
      "Spark now emits grand-total rows on empty grouping-sets input — " +
        "update tools/check_fuzz.py's known_dialect classifier")
    // non-empty input: the grand-total row IS emitted (parity holds there)
    val full = spark.sql("SELECT r_name, COUNT(*) AS n FROM region " +
      "GROUP BY ROLLUP(r_name)").collect()
    assert(full.length == 6 && full.count(_.isNullAt(0)) == 1)
  }

  test("grammar v2 reaches the extension tables and outer-join shapes") {
    // the widened generator (r12) must actually sample the new surface —
    // a regression that silently drops events_x/emb_x/documents or the
    // outer joins would leave those paths fuzz-blind again
    val sqls = (30000L to 30999L).map(SqlFuzz.gen)
    def hits(frag: String): Int = sqls.count(_.contains(frag))
    assert(hits("events_x") > 30, s"events_x coverage: ${hits("events_x")}")
    assert(hits("emb_x") > 20, s"emb_x coverage: ${hits("emb_x")}")
    assert(hits("documents") > 30, s"documents: ${hits("documents")}")
    assert(hits("RIGHT JOIN") > 10 && hits("FULL JOIN") > 10)
    assert(hits("GROUPING SETS") + hits("CUBE(") > 10)
    assert(hits("OFFSET") > 10)
    assert(hits("NTILE(") + hits("NTH_VALUE(") + hits("FIRST_VALUE(") > 8)
    assert(hits("EXTRACT(HOUR") + hits("EXTRACT(MINUTE") > 5)
  }

  test("triaged DuckDB-1.0 oracle bugs: Spark's answers are the correct ones") {
    // Two shapes the r12 campaign surfaced where the ORACLE is wrong and
    // the generator dodges (SqlFuzz boolExpr case 5 / strExpr case 7).
    // These pins assert Spark's (correct) behavior so an engine change
    // that silently matched the oracle's bug would fail loudly.
    graft.Tables.ensure(spark, sfDir)
    graft.Fuzz.registerFuzzViews(spark)
    // (1) CAST(ts AS DATE) IN (d1, d2): DuckDB 1.0 folds the IN into a
    // point lookup on the raw timestamp — 0 rows for intra-day values.
    // The cast of an intra-day timestamp must still hit its date.
    val inRows = spark.sql(
      "SELECT count(*) FROM events_x WHERE CAST(ts AS DATE) IN " +
        "(DATE '2024-01-05', DATE '2024-01-15')").head.getLong(0)
    val orRows = spark.sql(
      "SELECT count(*) FROM events_x WHERE CAST(ts AS DATE) = " +
        "DATE '2024-01-05' OR CAST(ts AS DATE) = DATE '2024-01-15'")
      .head.getLong(0)
    assert(inRows == orRows && inRows > 0,
      s"date-IN must equal the OR form: $inRows vs $orRows")
    // (2) split_part(NULL, ...): NULL in, NULL out (DuckDB 1.0 yields '')
    assert(spark.sql("SELECT split_part(CAST(NULL AS STRING), ' ', 1)")
      .head.isNullAt(0))
  }
}
