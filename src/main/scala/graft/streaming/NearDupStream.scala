package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, explode, expr}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate suppression (B66 generalized from exact ids to
  * MinHash near-dups).
  *
  * Batch near-dup dedup (ext/Dedup MinHash-LSH) needs the whole corpus; a
  * training-data INGEST pipeline needs the streaming form: suppress a doc
  * the moment it arrives if it is a near-copy of something already seen,
  * with state that does not grow with stream length.
  *
  * Shape: doc → 64-perm MinHash signature + LSH band keys (the same native
  * codegen expressions the batch path uses) → explode to one row per band
  * → `flatMapGroupsWithState` keyed on the band key. Per band, state holds
  * the first `perBandCap` REPRESENTATIVE signatures (near-dups are never
  * stored — they collapse onto their representative, so a million-copy hot
  * document costs one state entry, not a million). A new doc emits one
  * [[NearDupHit]] per band whose stored representative estimates Jaccard
  * ≥ threshold (positional signature agreement — the standard unbiased
  * MinHash estimator); a doc-level verdict is "any band hit", exactly the
  * LSH OR-construction of the batch path.
  *
  * State boundedness — the 100 TB-stream argument:
  *  - keyed by band key, entries capped at `perBandCap` signatures;
  *  - `EventTimeTimeout` evicts a band's state once the watermark passes
  *    its last activity + `delay`, so idle bands are reclaimed and total
  *    state is O(active bands within the watermark horizon), independent
  *    of total stream length — the same contract as
  *    `dropDuplicatesWithinWatermark` but for NEAR-duplicates.
  *
  * Determinism: rows within a micro-batch group are processed in
  * (ts, doc_id) order, so representative choice does not depend on
  * shuffle arrival order.
  *
  * Reference: dust has no streaming surface (SURVEY.md §0); this is the
  * streaming form of the mandated near-dup dedup (SURVEY.md §2.2 B71),
  * built on Structured Streaming's state-store contract.
  */
object NearDupStream {

  final case class NearDupHit(doc_id: Long, band: Long, dup_of: Long,
                              est_j: Double)

  final case class BandState(ids: Array[Long], sigs: Array[Array[Int]])

  /** docs: streaming DataFrame with (doc_id LONG, ts TIMESTAMP, text
    * STRING). Emits one hit per (arriving doc, matching band). */
  def nearDupSuppress(docs: DataFrame, threshold: Double = 0.9,
                      perBandCap: Int = 16,
                      delay: String = "10 minutes"): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    val banded = docs
      .withWatermark("ts", delay)
      .withColumn("sig",
        expr("minhash_signature(array_remove(split(lower(text), ' '), ''))"))
      .withColumn("band", explode(expr("minhash_band_keys(text)")))
      .select(col("band"), col("doc_id"), col("sig"), col("ts"))
      .as[(Long, Long, Array[Int], java.sql.Timestamp)]

    banded.groupByKey(_._1)
      .flatMapGroupsWithState[BandState, NearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (band, rows, state: GroupState[BandState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var ids = state.getOption.map(_.ids).getOrElse(Array.empty[Long])
            var sigs = state.getOption.map(_.sigs)
              .getOrElse(Array.empty[Array[Int]])
            val out = Seq.newBuilder[NearDupHit]
            var maxTs = Long.MinValue
            rows.toSeq.sortBy(r => (r._4.getTime, r._2)).foreach {
              case (_, docId, sig, ts) =>
                maxTs = math.max(maxTs, ts.getTime)
                var hit = -1
                var i = 0
                while (hit < 0 && i < sigs.length) {
                  var eq = 0
                  var j = 0
                  while (j < sig.length) {
                    if (sig(j) == sigs(i)(j)) eq += 1
                    j += 1
                  }
                  if (sig.length > 0 && eq.toDouble / sig.length >= threshold)
                    hit = i
                  i += 1
                }
                if (hit >= 0)
                  out += NearDupHit(docId, band, ids(hit),
                    { var eq = 0; var j = 0
                      while (j < sig.length) {
                        if (sig(j) == sigs(hit)(j)) eq += 1; j += 1 }
                      eq.toDouble / math.max(sig.length, 1) })
                else if (ids.length < perBandCap) {
                  ids = ids :+ docId
                  sigs = sigs :+ sig
                }
            }
            state.update(BandState(ids, sigs))
            // evict once the watermark passes this band's last activity +
            // the dedup horizon — the state bound
            if (maxTs != Long.MinValue)
              state.setTimeoutTimestamp(maxTs, delay)
            out.result().iterator
          }
      }
  }
}
