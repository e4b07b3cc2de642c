package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Tok(token: String)

/** Streaming Space-Saving heavy hitters (FrequencyStream): the sketch
  * guarantees — never undercounts, no false negatives among the heavy,
  * bounded state — checked against exact counts on a skewed stream. */
class FrequencyStreamSpec extends SparkSpec {

  private def latest(rows: Seq[FrequencyStream.HeavyHit]) = {
    val maxSeq = rows.groupBy(_.bucket).view.mapValues(_.map(_.seq).max)
    rows.filter(h => h.seq == maxSeq(h.bucket)) // current summary only
  }

  test("skewed stream: heavy tokens present, estimates bound true counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    // zipf-ish: hot tokens h0..h4 dominate, 200 rare tokens as noise
    val batch1 = Seq.fill(300)(s"h${rnd.nextInt(5)}") ++
      (1 to 100).map(i => s"rare${rnd.nextInt(200)}")
    val batch2 = Seq.fill(300)(s"h${rnd.nextInt(5)}") ++
      (1 to 100).map(i => s"rare${rnd.nextInt(200)}")
    val truth = (batch1 ++ batch2).groupBy(identity).view.mapValues(_.size.toLong)

    val mem = MemoryStream[Tok]
    val q = FrequencyStream.topkSummary(mem.toDF(), buckets = 4, capacity = 16)
      .writeStream.format("memory").queryName("heavy")
      .outputMode("update").start()
    mem.addData(batch1.map(Tok): _*); q.processAllAvailable()
    mem.addData(batch2.map(Tok): _*); q.processAllAvailable()
    val rows = spark.table("heavy").as[FrequencyStream.HeavyHit]
      .collect().toSeq
    q.stop()

    val summary = latest(rows)
    // bounded state: at most buckets × capacity counters
    assert(summary.size <= 4 * 16, s"state leaked: ${summary.size} counters")
    val byTok = summary.map(h => h.token -> h).toMap
    // every hot token survives (true count far above any bucket's min)
    (0 until 5).foreach { i =>
      val t = s"h$i"
      assert(byTok.contains(t), s"heavy token $t evicted: ${byTok.keys}")
      val h = byTok(t)
      val tc = truth(t)
      assert(h.est >= tc, s"$t undercounted: est ${h.est} < true $tc")
      assert(h.est - h.err <= tc,
        s"$t bound violated: est ${h.est} err ${h.err} true $tc")
    }
    // estimates never undercount for ANY surviving token
    summary.foreach { h =>
      assert(h.est >= truth.getOrElse(h.token, 0L),
        s"${h.token} undercounted")
    }
  }

  test("corpus stream: summary covers the exact batch top-10 (x80 contract)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    graft.Tables.ensure(spark, sfDir)
    // exact batch truth (what the x80 count-min row asserts against)
    val toks = spark.table("documents")
      .select(explode(filter(split(lower(col("text")), " "),
        t => t =!= "")).as("token"))
    val exact = toks.groupBy("token").count()
      .orderBy(col("count").desc, col("token"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val top10 = exact.take(10)

    val mem = MemoryStream[Tok]
    val q = FrequencyStream.topkSummary(mem.toDF(), buckets = 8, capacity = 32)
      .writeStream.format("memory").queryName("corpusheavy")
      .outputMode("update").start()
    val all = toks.collect().map(r => Tok(r.getString(0)))
    all.grouped(5000).foreach { c => mem.addData(c.toSeq: _*); q.processAllAvailable() }
    val rows = spark.table("corpusheavy").as[FrequencyStream.HeavyHit]
      .collect().toSeq
    q.stop()
    val summary = latest(rows).map(h => h.token -> h).toMap
    top10.foreach { case (t, n) =>
      assert(summary.contains(t), s"exact-top token '$t' missing")
      assert(summary(t).est >= n, s"'$t' undercounted: ${summary(t).est} < $n")
      assert(summary(t).est - summary(t).err <= n,
        s"'$t' bound violated: ${summary(t)} vs true $n")
    }
  }

  test("state and output are deterministic across runs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def run(name: String): Seq[FrequencyStream.HeavyHit] = {
      val rnd = new scala.util.Random(23)
      val data = (1 to 500).map(_ => s"t${rnd.nextInt(60)}")
      val mem = MemoryStream[Tok]
      val q = FrequencyStream.topkSummary(mem.toDF(), buckets = 2, capacity = 8)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      data.grouped(200).foreach { c =>
        mem.addData(c.map(Tok): _*); q.processAllAvailable()
      }
      val out = spark.table(name).as[FrequencyStream.HeavyHit].collect().toSeq
      q.stop()
      latest(out).sortBy(h => (h.bucket, h.token))
    }
    assert(run("det1") === run("det2"))
  }
}
