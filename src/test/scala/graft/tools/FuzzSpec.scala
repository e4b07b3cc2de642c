package graft.tools

import graft.SparkSpec

/** The randomized differential-SQL harness (VERDICT r10 #1):
  * graft.tools.SqlFuzz + graft.Fuzz (Spark side) + tools/check_fuzz.py
  * (DuckDB side). This spec pins the generator's contracts and the one
  * triaged divergence class; the 10k+ cross-engine run itself is a
  * committed tool invocation (see BASELINE.md for the recorded runs).
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
}
