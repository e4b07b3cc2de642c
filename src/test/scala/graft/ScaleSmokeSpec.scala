package graft

import org.apache.spark.sql.functions._

/** Corpus-builder contract behind the committed scale smoke
  * (graft.ScaleSmoke): replication must preserve within-copy duplicate
  * structure exactly while keeping copies vocabulary-disjoint — the
  * constant-duplicate-density construction under which linear growth is
  * the correct assertion. */
class ScaleSmokeSpec extends SparkSpec {

  test("N× corpus: disjoint vocabularies, constant duplicate density") {
    val base = java.nio.file.Files.createTempDirectory("graft-smoke-").toString
    val d1 = ScaleSmoke.buildCorpus(spark, sfDir, base, 1)
    val d2 = ScaleSmoke.buildCorpus(spark, sfDir, base, 2)
    val c1 = spark.read.parquet(s"$d1/documents.parquet")
    val c2 = spark.read.parquet(s"$d2/documents.parquet")

    // size doubles, ids unique
    assert(c2.count() == 2 * c1.count())
    assert(c2.select("doc_id").distinct().count() == c2.count())
    // schema preserved (column order + types)
    assert(c2.schema == spark.read
      .parquet(s"$sfDir/documents.parquet").schema)

    val stride = c1.agg(max("doc_id")).head.getLong(0) + 1
    val toks = c2.select(col("doc_id"),
      explode(expr("filter(split(text, ' '), t -> t <> '')")).as("tok"))
    // copies share NO token: cross-copy jaccard is 0 by construction
    val shared = toks.filter(col("doc_id") < stride).select("tok").distinct()
      .intersect(
        toks.filter(col("doc_id") >= stride).select("tok").distinct())
      .count()
    assert(shared == 0, s"$shared tokens shared across copies")

    // duplicate density constant: word-set-fingerprint duplicate pairs
    // scale exactly N× (each copy contributes the same group structure)
    def dupPairs(df: org.apache.spark.sql.DataFrame): Long = df
      .select(expr("""md5(CAST(array_join(array_sort(array_distinct(
                     |  filter(split(LOWER(text), ' '), t -> t <> ''))), ' ')
                     |  AS BINARY))""".stripMargin).as("fp"))
      .groupBy("fp").count()
      .agg(sum(expr("count * (count - 1) DIV 2"))).head.getLong(0)
    assert(dupPairs(c2) == 2 * dupPairs(c1))

    // builder is idempotent: second call reuses the written corpus
    val again = ScaleSmoke.buildCorpus(spark, sfDir, base, 2)
    assert(again == d2)
  }

  test("N× events corpus: disjoint users, per-user trajectories verbatim") {
    val base = java.nio.file.Files.createTempDirectory("graft-smoke-").toString
    val d1 = ScaleSmoke.buildCorpus(spark, sfDir, base, 1)
    val d2 = ScaleSmoke.buildCorpus(spark, sfDir, base, 2)
    val e1 = Tables.normalizeEventsTs(
      spark.read.parquet(s"$d1/events.parquet"))
    val e2 = Tables.normalizeEventsTs(
      spark.read.parquet(s"$d2/events.parquet"))
    assert(e2.count() == 2 * e1.count())
    // 2× the USERS, not 2× the density: distinct users double, the
    // per-user event-count distribution is identical in both copies
    assert(e2.select("user_id").distinct().count() ==
      2 * e1.select("user_id").distinct().count())
    val hist1 = e1.groupBy("user_id").count()
      .groupBy("count").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hist2 = e2.groupBy("user_id").count()
      .groupBy("count").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist2 == hist1.map { case (k, v) => k -> 2 * v },
      "per-user event-count histogram must scale exactly 2x")
    // a copied user's trajectory is the source user's, event-for-event
    val uStride = e1.agg(max("user_id")).head.getLong(0) + 1
    val t0 = e1.filter(col("user_id") === 3)
      .select("ts", "event_type", "value").orderBy("ts").collect().toSeq
    val t1 = e2.filter(col("user_id") === lit(3L + uStride))
      .select("ts", "event_type", "value").orderBy("ts").collect().toSeq
    assert(t0.nonEmpty && t0 == t1, "copied trajectory must be verbatim")
  }
}
