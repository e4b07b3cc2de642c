package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-install path: a session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` gets the native
  * functions AND the opt-in rewrite rules with no runtime registration —
  * what a user's spark-submit/Thrift-server config would do. (The other
  * specs exercise the runtime `GraftFunctions.register` path.)
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions installs functions and the opt-in rules") {
    val base = graft.SparkSpec.session // materialize the shared context
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions=graft.functions.GraftExtensions` is a STATIC
    // conf — it only takes effect when the SparkContext is created, which
    // a shared-context test JVM can't redo. Builder.withExtensions is the
    // public equivalent that applies the same installer to a new session
    // on the existing context.
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    try {
      assert(s ne base, "builder must create a fresh session")

      // native function resolves without GraftFunctions.register
      val v = s.sql(
        """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))"""
          .stripMargin).head.getDouble(0)
      assert(math.abs(v - 1.0) < 1e-9)

      // injected optimizer rule fires under its flag: the naive jaccard
      // join loses the nested loop and still finds the planted duplicate
      import s.implicits._
      Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
        (3L, "delta epsilon zeta"))
        .toDF("doc_id", "text").createOrReplaceTempView("ext_docs")
      s.conf.set(graft.plans.JaccardJoinRewrite.EnabledKey, "true")
      val q = s.sql(
        """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          |FROM ext_docs a JOIN ext_docs b
          |  ON a.doc_id < b.doc_id AND jaccard_sim(a.text, b.text) >= 0.9"""
          .stripMargin)
      assert(!q.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "rule did not fire through the extensions path")
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 2L)))
    } finally {
      // the new session shares the SparkContext — restore, don't stop
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
