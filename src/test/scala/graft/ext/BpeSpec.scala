package graft.ext

import graft.SparkSpec
import scala.collection.mutable

/** BPE trainer: the distributed driver-loop must reproduce a local
  * reference implementation merge-for-merge (same pair counting with
  * multiplicity, same greedy leftmost-non-overlapping pass, same
  * (count DESC, pair lexicographic) argmax), stay deterministic across
  * runs, and stop early when no pair remains. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Local reference BPE (Sennrich et al. 2016 semantics, no end-of-word
    * marker): counts every adjacent pair occurrence, merges greedily
    * left-to-right without overlap. */
  private def refTrain(words: Seq[String], k: Int): Seq[(String, String, Long)] = {
    var seqs: Seq[Vector[String]] = words.filter(_.nonEmpty)
      .map(_.map(_.toString).toVector)
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    var i = 0
    while (i < k && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
      seqs.foreach { s =>
        var j = 0
        while (j + 1 < s.length) {
          counts((s(j), s(j + 1))) = counts.getOrElse((s(j), s(j + 1)), 0L) + 1
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((a, b, n))
        seqs = seqs.map { s =>
          val m = Vector.newBuilder[String]
          var j = 0
          while (j < s.length) {
            if (j + 1 < s.length && s(j) == a && s(j + 1) == b) {
              m += (a + b); j += 2
            } else { m += s(j); j += 1 }
          }
          m.result()
        }
        i += 1
      }
    }
    out.result()
  }

  // the classic BPE example corpus, as occurrences (frequency weighting)
  private val corpus: Seq[String] =
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("distributed trainer reproduces the local reference merge-for-merge") {
    val expected = refTrain(corpus, 10)
    val got = Bpe.train(corpus.toDF("word"), 10)
    assert(got == expected,
      s"merge sequences diverge:\n got=$got\n exp=$expected")
    assert(got.nonEmpty && got.head._3 >= got.last._3,
      "merge support counts should be non-increasing on this corpus")
  }

  test("trainer is deterministic across runs and partitionings") {
    val a = Bpe.train(corpus.toDF("word").repartition(7), 6)
    val b = Bpe.train(corpus.toDF("word").repartition(2), 6)
    assert(a == b, s"partitioning changed the merge sequence:\n $a\n $b")
  }

  test("trainer stops early when every sequence is a single symbol") {
    val tiny = Seq("ab", "ab", "cd").toDF("word")
    val merges = Bpe.train(tiny, 10)
    // 'ab' then 'cd' merge; after that no adjacent pair remains
    assert(merges.map(m => (m._1, m._2)) == Seq(("a", "b"), ("c", "d")),
      merges.toString)
  }

  test("encode applies the merge table greedily left-to-right") {
    val merges = Bpe.train(corpus.toDF("word"), 10)
    // encoding a training word must yield the word's final symbol sequence
    val lowSyms = Bpe.encode("low", merges)
    assert(lowSyms.mkString == "low")
    // reference check: apply the same merges locally
    val ref = refTrain(corpus, 10)
    assert(Bpe.encode("lowest", merges) == Bpe.encode("lowest", ref))
  }

  test("corpus-scale smoke: trainer runs on the documents word stream") {
    graft.Tables.ensure(spark, sfDir)
    val words = spark.sql(
      """SELECT explode(filter(split(LOWER(text), ' '), x -> x <> '')) AS word
        |FROM documents""".stripMargin)
    val merges = Bpe.train(words, 3)
    assert(merges.length == 3)
    // first merge must agree with x93's pair-frequency argmax at this scale
    val x93 = graft.ext.Extensions.all.find(_.name == "x93_bpe_pairs").get
    val top = spark.sql(x93.spark).head()
    assert(merges.head._1 + merges.head._2 == top.getString(0),
      s"first BPE merge ${merges.head} != x93 top pair ${top.getString(0)}")
    assert(merges.head._3 == top.getLong(1))
  }

  test("x100 distributed encode matches the driver-local encode per word") {
    graft.Tables.ensure(spark, sfDir)
    // learn the same 5 merges the query derives: occurrence-row training is
    // equivalent to the query's count-weighted vocabulary training
    val words = spark.sql(
      """SELECT explode(filter(split(LOWER(text), ' '), x -> x <> '')) AS word
        |FROM documents""".stripMargin)
    val merges = Bpe.train(words, 5)
    val rows = Bpe.encodeQuery(spark, sfDir).collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val w = r.getString(0)
      val enc = r.getString(3).split('|').toSeq
      assert(enc == Bpe.encode(w, merges),
        s"distributed encode of '$w' diverges from the reference fold")
      assert(enc.mkString == w, s"encode of '$w' must round-trip")
      assert(r.getInt(2) == enc.length)
    }
  }
}
