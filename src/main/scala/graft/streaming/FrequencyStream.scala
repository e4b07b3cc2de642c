package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters via Space-Saving (Metwally et al.) — the
  * streaming twin of the batch count-min top-k (x80/`ext.Frequency`).
  *
  * Tokens hash into `buckets` state partitions; each bucket maintains at
  * most `capacity` Space-Saving counters (count, overestimate-error).
  * A token not in the summary replaces the minimum counter, inheriting
  * its count as the error bound — the classic guarantee:
  *
  *   true_count ≤ est ≤ true_count + err,  err ≤ min-counter at entry
  *
  * so every token with true frequency above the bucket's min counter is
  * GUARANTEED present (no false negatives among the heavy), and the
  * estimate never undercounts.
  *
  * State boundedness — the 100 TB-stream argument: exactly
  * `buckets × capacity` counters TOTAL, independent of vocabulary size
  * and stream length (vs the exact groupBy whose state is the
  * vocabulary). Bucketing by token hash both parallelizes the summary
  * and makes per-bucket error independent; a global top-k is the merge
  * of the per-bucket summaries (each bucket owns its tokens exclusively,
  * so merging is concatenation, never counter addition).
  *
  * Emission (Update mode): each trigger re-emits the buckets touched in
  * that batch — downstream reads the LATEST row per (bucket, token), the
  * standard Update-sink contract. Per-batch token counts are
  * pre-aggregated in plain codegen (groupBy below) so state updates are
  * one per distinct token per trigger, not one per occurrence.
  *
  * Reference: dust has no streaming surface (SURVEY.md §0); this extends
  * the mandated streaming family (B62-B67) with the frequency-sketch
  * operator whose batch twin is x80.
  */
object FrequencyStream {

  /** Summary row: `est` never undercounts; `err` is the inherited
    * overestimate bound (0 = exact). `seq` is the bucket's trigger
    * sequence — an Update sink accumulates every emission, so the CURRENT
    * summary is the rows with each bucket's max seq (evicted tokens stop
    * being emitted but their stale earlier rows remain in the sink). */
  final case class HeavyHit(bucket: Int, token: String, est: Long, err: Long,
                            seq: Long)

  final case class BucketState(tokens: Array[String], counts: Array[Long],
                               errs: Array[Long], seq: Long)

  /** tokens: streaming DataFrame with a `token` STRING column (pre-split;
    * use explode(split(...)) upstream for raw text). */
  def topkSummary(tokens: DataFrame, buckets: Int = 16,
                  capacity: Int = 32): Dataset[HeavyHit] = {
    val spark = tokens.sparkSession
    import spark.implicits._

    // per-batch pre-aggregation happens inside the state function on the
    // iterator (cheap, per-group); the bucket key is pmod, NOT abs(..)%:
    // abs(Int.MinValue) == Int.MinValue, so abs%b can yield a negative
    // bucket id for hash collisions on that one value — pmod is total
    val keyed = tokens
      .select(col("token"),
        pmod(hash(col("token")), lit(buckets)).cast("int").as("bucket"))
      .as[(String, Int)]

    keyed.groupByKey(_._2)
      .flatMapGroupsWithState[BucketState, HeavyHit](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (bucket, rows, state: GroupState[BucketState]) =>
          // batch pre-aggregation: one state update per distinct token
          val batchCounts = rows.foldLeft(Map.empty[String, Long]) {
            case (m, (tok, _)) => m.updated(tok, m.getOrElse(tok, 0L) + 1L)
          }
          var toks = state.getOption.map(_.tokens.toVector).getOrElse(Vector.empty)
          var cnts = state.getOption.map(_.counts.toVector).getOrElse(Vector.empty)
          var errs = state.getOption.map(_.errs.toVector).getOrElse(Vector.empty)
          val seq = state.getOption.map(_.seq).getOrElse(0L) + 1L
          // deterministic order: (token) — results independent of shuffle
          batchCounts.toSeq.sortBy(_._1).foreach { case (tok, n) =>
            val i = toks.indexOf(tok)
            if (i >= 0) cnts = cnts.updated(i, cnts(i) + n)
            else if (toks.size < capacity) {
              toks :+= tok; cnts :+= n; errs :+= 0L
            } else {
              // replace the min counter (token tiebreak for determinism)
              val j = cnts.indices.minBy(k => (cnts(k), toks(k)))
              val inherited = cnts(j)
              toks = toks.updated(j, tok)
              cnts = cnts.updated(j, inherited + n)
              errs = errs.updated(j, inherited)
            }
          }
          state.update(BucketState(toks.toArray, cnts.toArray,
            errs.toArray, seq))
          toks.indices.iterator.map(i =>
            HeavyHit(bucket, toks(i), cnts(i), errs(i), seq))
      }
  }
}
