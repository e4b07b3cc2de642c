package graft.ext

import Stages.StageOps
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
      .stageMaterialize

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
          syms = syms.select(expr(mergeFoldSql("syms", a, b)).as("syms"))
            .stageMaterialize
          i += 1
      }
    }
    merges.result()
  }

  /** SQL text of one greedy leftmost-non-overlapping merge pass over a
    * symbol-array column: a left fold with a one-symbol lookbehind, map-only
    * (no shuffle). ANSI mode: no out-of-bounds element_at — the fold only
    * touches the current element. Used by the trainer and the distributed
    * encode (x100). */
  private def mergeFoldSql(col: String, a: String, b: String): String =
    s"""aggregate($col,
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
       |              ELSE array_append(acc.out, acc.p) END)""".stripMargin

  /** x100: distributed BPE ENCODE with corpus-derived merges, end-to-end.
    *
    * Learns 5 merges from the corpus word VOCABULARY weighted by occurrence
    * count (identical semantics to [[train]] over occurrence rows — the
    * pair counts are Σ cnt instead of COUNT(*)), then applies them to every
    * vocabulary word with [[mergeFoldSql]] and emits the 30 most frequent
    * words with their symbol counts and '|'-joined encodings.
    *
    * Scale posture: the encode state is (vocab word, count, symbols) —
    * vocabulary-sized, not corpus-sized (Zipf: far smaller than the token
    * stream; a corpus-sized variant is the same fold mapped over docs).
    * Each of the 5 iterations is one explode + hash aggregate on a key
    * space ≤ |charset|² + a single-row argmax to the driver (the trainer's
    * documented driver-state bound); each level localCheckpoints so
    * iteration k does not replay levels 1..k-1.
    *
    * Oracle: [[encodeDuck]] replays the SAME selection + merge chain in
    * DuckDB on a space-delimited string form, where one merge pass is
    * `replace(s, ' a  b ', ' ab ')` — symbols joined by TWO spaces with
    * single-space borders. The invariant makes the left-to-right
    * non-overlapping `replace` scan exactly the greedy fold: patterns can
    * never match across a symbol boundary (every symbol keeps a space on
    * both sides, so ' h  e ' cannot match inside '... t h  e ...' reading
    * 'th' as 'h'), a replacement reinserts single-space borders preserving
    * the invariant, and the post-replacement scan position matches the
    * fold's lookbehind reset (runs: ' a  a  a ' → ' aa  a ', like the
    * fold). The merge argmax tiebreak is (Σcnt DESC, a, b) in both
    * engines, so the learned tables — and therefore every encoding —
    * agree exactly.
    */
  def encodeQuery(spark: org.apache.spark.sql.SparkSession,
                  dir: String): DataFrame = {
    graft.Tables.ensure(spark, dir)
    import org.apache.spark.sql.functions.{col, size => asize}
    var cur = spark.sql(
      """SELECT w, cnt,
        |  transform(sequence(1, length(w)), i -> substring(w, i, 1)) AS syms
        |FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM (SELECT explode(array_remove(split(LOWER(text), ' '), '')) AS w
        |            FROM documents)
        |      GROUP BY w)""".stripMargin).stageMaterialize
    var k = 0
    var exhausted = false
    while (k < 5 && !exhausted) {
      val top = cur.filter(asize(col("syms")) >= 2)
        .selectExpr("cnt",
          """explode(transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) AS a,
            |              element_at(syms, i + 1) AS b))) AS p""".stripMargin)
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(org.apache.spark.sql.functions.sum("cnt").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        cur = cur.select(col("w"), col("cnt"),
          org.apache.spark.sql.functions.expr(mergeFoldSql("syms", a, b))
            .as("syms")).stageMaterialize
        k += 1
      }
    }
    cur.selectExpr("w", "cnt AS n_occ",
        "CAST(size(syms) AS INT) AS n_syms",
        "concat_ws('|', syms) AS enc")
      .orderBy(col("n_occ").desc, col("w"))
      .limit(30)
  }

  /** DuckDB twin of [[encodeQuery]] — the 5-level selection + merge chain
    * generated as chained CTEs over the delimited-string form (see the
    * encodeQuery doc for the replace-equals-fold argument). The LEFT JOIN
    * ON TRUE keeps words intact if a level finds no pair (degenerate
    * corpus), matching the Spark loop's early stop. */
  val encodeDuck: String = {
    val levels = (1 to 5).map { k =>
      s"""p$k AS (SELECT sy[CAST(i AS INT)] AS a, sy[CAST(i AS INT) + 1] AS b,
         |        SUM(cnt) AS n
         |      FROM (SELECT cnt, sy, unnest(range(1, len(sy))) AS i
         |            FROM (SELECT cnt, string_split(trim(s), '  ') AS sy
         |                  FROM w${k - 1})
         |            WHERE len(sy) >= 2)
         |      GROUP BY a, b),
         |m$k AS (SELECT ' ' || a || '  ' || b || ' ' AS pat,
         |         ' ' || a || b || ' ' AS rep
         |       FROM p$k ORDER BY n DESC, a, b LIMIT 1),
         |w$k AS (SELECT w, cnt,
         |         COALESCE(replace(s, m.pat, m.rep), s) AS s
         |       FROM w${k - 1} LEFT JOIN m$k m ON TRUE)""".stripMargin
    }
    s"""WITH w0 AS (SELECT w, cnt,
       |    ' ' || array_to_string(list_transform(range(1, length(w) + 1),
       |             i -> substr(w, CAST(i AS INT), 1)), '  ') || ' ' AS s
       |  FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
       |        FROM (SELECT unnest(list_filter(string_split(LOWER(text), ' '),
       |                                        x -> x <> '')) AS w
       |              FROM documents)
       |        GROUP BY w)),
       |${levels.mkString(",\n")}
       |SELECT w, cnt AS n_occ,
       |  CAST(len(string_split(trim(s), '  ')) AS INT) AS n_syms,
       |  array_to_string(string_split(trim(s), '  '), '|') AS enc
       |FROM w5 ORDER BY n_occ DESC, w LIMIT 30""".stripMargin
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
