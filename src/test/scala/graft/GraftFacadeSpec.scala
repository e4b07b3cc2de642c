package graft

import org.apache.spark.sql.functions.col

/** The facade forwards verbatim — each entry must produce the same result
  * as the implementing module (one representative per area). */
class GraftFacadeSpec extends SparkSpec {
  import spark.implicits._

  test("install registers functions and rules idempotently") {
    Graft.install(spark)
    Graft.install(spark) // second call must not duplicate rules
    val n = spark.experimental.extraOptimizations
      .count(_ eq plans.JaccardJoinRewrite)
    assert(n == 1)
    assert(spark.sql("SELECT jaccard_sim('a b', 'a b')")
      .head.getDouble(0) == 1.0)
  }

  test("facade results equal the module results") {
    Tables.ensure(spark, sfDir)
    val viaFacade = Graft.dedupGroups(spark, sfDir).collect().toSeq
    val direct = ext.Dedup.componentsQuery(spark, sfDir).collect().toSeq
    assert(viaFacade == direct)

    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("s", "t")
    val cc = Graft.connectedComponents(nodes, edges, "s", "t")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))

    val ev = spark.table("events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val a = Graft.asOfJoin(clicks, views, "user_id", "ts",
      Seq("view_id"), "view_id").count()
    val b = operators.AsOfJoin.asOf(clicks, views, "user_id", "ts",
      Seq("view_id"), "view_id").count()
    assert(a == b && a > 0)

    val k1 = Graft.kmeansAssign(spark, sfDir).collect().toSeq
    val k2 = ext.Clustering.assignQuery(spark, sfDir).collect().toSeq
    assert(k1 == k2 && k1.nonEmpty)

    // stage forwards: materialize honors the knob; sharedStage caches
    val st = Graft.materializeStage(Seq(1, 2, 3).toDF("n"))
    assert(st.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    var builds = 0
    def build() = { builds += 1; Graft.materializeStage(Seq(9).toDF("n")) }
    val key = s"facade-spec-${System.identityHashCode(this)}"
    Graft.sharedStage(spark, key)(build())
    Graft.sharedStage(spark, key)(build())
    assert(builds == 1, "second sharedStage call must hit the cache")
  }
}
