package graft.functions

import graft.SparkSpec

/** Count-min sketch interior: the properties the x80 oracle row can't
  * check (it pins only the never-underestimates boolean on the top-20). */
class FrequencySpec extends SparkSpec {

  private def local(tokens: Seq[String]): Array[Long] =
    tokens.foldLeft(CountMin.agg.zero)(CountMin.agg.reduce)

  test("never underestimates, on every token (not just heavy ones)") {
    val rnd = new scala.util.Random(7)
    val tokens = Seq.fill(5000)(s"w${rnd.nextInt(800)}")
    val sketch = local(tokens)
    val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong)
    exact.foreach { case (t, c) =>
      assert(CountMin.estimate(sketch, t) >= c, t)
    }
  }

  test("overestimate bounded by the epsilon bound with margin") {
    val rnd = new scala.util.Random(11)
    val tokens = Seq.fill(20000)(s"w${rnd.nextInt(500)}")
    val sketch = local(tokens)
    val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong)
    // ε = e/w ≈ 0.00265 → slack ≈ 53 at N=20k; collisions across only
    // 500 distinct keys in 1024 buckets keep real error far below it
    val n = tokens.size
    val slack = math.ceil(math.E / CountMin.Width * n).toLong
    exact.foreach { case (t, c) =>
      assert(CountMin.estimate(sketch, t) <= c + slack,
        s"$t est=${CountMin.estimate(sketch, t)} exact=$c slack=$slack")
    }
  }

  test("merge of split streams equals the single-pass sketch") {
    val tokens = (1 to 3000).map(i => s"w${i % 300}")
    val (a, b) = tokens.splitAt(1234)
    val merged = CountMin.agg.merge(local(a), local(b))
    assert(merged.sameElements(local(tokens)))
  }

  test("distributed aggregation matches the local fold") {
    import spark.implicits._
    val tokens = (1 to 2000).map(i => s"t${i % 97}")
    val distributed = spark.createDataset(tokens).repartition(8)
      .select(CountMin.agg.toColumn).head()
    assert(distributed.sameElements(local(tokens)))
  }
}
