package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training.
  *
  * x93_bpe_pairs is the merge-SELECTION aggregate (the pair-frequency
  * table); this is the full iterative trainer built as a driver loop over
  * exactly that aggregate — the structure every BPE implementation shares
  * (Sennrich et al. 2016): repeat { count adjacent symbol pairs; merge the
  * most frequent pair everywhere }.
  *
  * Scale posture (100 TB corpus):
  *  - each iteration is ONE distributed job: a map-side pair explode over
  *    the current symbol sequences + a hash aggregation on a key space
  *    bounded by |vocab|² of the CURRENT merge level (starts ≤ |charset|²,
  *    stays small — partial aggregation collapses almost everything
  *    map-side), finished by a 1-row argmax;
  *  - the merge itself is map-only: a left fold over each word's symbol
  *    array (greedy leftmost-non-overlapping, standard BPE pass
  *    semantics), no shuffle;
  *  - driver state is ONE (pair, count) row per iteration plus the merge
  *    list itself (= numMerges rows) — never corpus-sized;
  *  - sequences are localCheckpoint'd each iteration so lineage stays flat
  *    across the loop (the alternative — replaying k merge expressions at
  *    iteration k — makes iteration cost quadratic in k).
  *
  * Determinism: the argmax tiebreak is (count DESC, pair lexicographic),
  * so the merge sequence is a pure function of the corpus.
  */
object Bpe {

  /** Ordered merge list learned from a corpus.
    *
    * @param words one row per word OCCURRENCE (column `word`) — occurrence
    *              multiplicity is exactly the frequency weighting BPE wants
    * @param numMerges merge table size to learn
    * @return merges in application order with their support counts
    */
  def train(words: DataFrame, numMerges: Int): Seq[(String, String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._

    // initial symbol sequences: one character per symbol
    var syms = words
      .filter(length(col("word")) >= 1)
      .select(expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        .as("syms"))
      .localCheckpoint()

    val merges = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      // adjacent-pair counts of the CURRENT symbol level (x93's aggregate,
      // lifted from chars to symbols); argmax with a deterministic tiebreak
      val top = syms
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) AS a,
            |              element_at(syms, i + 1) AS b))""".stripMargin))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()

      top.headOption match {
        case None => exhausted = true // every sequence is a single symbol
        case Some((a, b, n)) =>
          merges += ((a, b, n))
          // greedy leftmost-non-overlapping merge pass, map-only: left fold
          // with a one-symbol lookbehind. ANSI mode: no out-of-bounds
          // element_at — the fold only touches the current element.
          syms = syms.select(expr(
            s"""aggregate(syms,
               |  named_struct('out', CAST(array() AS ARRAY<STRING>),
               |               'p', CAST(NULL AS STRING)),
               |  (acc, s) -> CASE
               |    WHEN acc.p IS NULL THEN named_struct('out', acc.out, 'p', s)
               |    WHEN acc.p = ${sqlStr(a)} AND s = ${sqlStr(b)}
               |      THEN named_struct('out',
               |             array_append(acc.out, ${sqlStr(a + b)}),
               |           'p', CAST(NULL AS STRING))
               |    ELSE named_struct('out', array_append(acc.out, acc.p),
               |                      'p', s) END,
               |  acc -> CASE WHEN acc.p IS NULL THEN acc.out
               |              ELSE array_append(acc.out, acc.p) END)"""
              .stripMargin).as("syms"))
            .localCheckpoint()
          i += 1
      }
    }
    merges.result()
  }

  /** Apply a learned merge list to a word — the ENCODE side, driver-local
    * (the distributed encode is the same fold mapped over a column). */
  def encode(word: String, merges: Seq[(String, String, Long)]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    merges.foreach { case (a, b, _) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  /** SQL single-quoted string literal (symbols here are word characters /
    * concatenations of them; quotes and backslashes escaped defensively). */
  private def sqlStr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
}
