package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing — the last step of a training-data pipeline:
  * concatenate documents, in a deterministic order, into fixed token-budget
  * bins ("packs"), starting a new pack whenever the next document would
  * overflow the budget. Documents larger than the budget occupy a pack of
  * their own (never split — chunking first is x71's job).
  *
  * Distribution contract: packing is inherently sequential WITHIN a group
  * (pack_id of doc i depends on every doc before it), so the group column
  * is the parallelism unit. The implementation streams each group through
  * [[org.apache.spark.sql.KeyValueGroupedDataset.flatMapSortedGroups]] —
  * Spark's secondary sort hands the iterator over in (doc_id) order
  * WITHOUT materializing the group, so per-group state is two integers no
  * matter how many rows the group holds. At 100 TB the knob is the group
  * key itself: pass a composite column (e.g. lang + doc_id-range shard) to
  * bound sequentialism, exactly like the reference pipelines shard their
  * packers; pack ids stay deterministic because the sharding is
  * content-derived, not partition-derived.
  */
object Packing {

  // not `private`: the row encoders' generated projections construct these
  // reflectively from outside the object and need public access
  final case class DocRow(gk: String, doc_id: Long, ntoks: Int)
  final case class PackedRow(doc_id: Long, gk: String, ntoks: Int,
                             pack_id: Long)

  /** Assign each row a pack id: greedy first-overflow-starts-a-new-pack
    * over rows sorted by `idCol` within each `groupCol` group. Output
    * columns: doc_id, <groupCol>, ntoks, pack_id (pack ids are 0-based and
    * contiguous per group). */
  def greedyPack(docs: DataFrame, groupCol: String, idCol: String,
                 tokCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val ds = docs.select(
      col(groupCol).cast("string").as("gk"),
      col(idCol).cast("long").as("doc_id"),
      col(tokCol).cast("int").as("ntoks")).as[DocRow]
    ds.groupByKey(_.gk)
      .flatMapSortedGroups($"doc_id") { (gk: String, it: Iterator[DocRow]) =>
        var acc = 0L
        var pack = -1L // first row always opens pack 0
        it.map { d =>
          if (pack < 0 || acc + d.ntoks > budget) { pack += 1; acc = d.ntoks }
          else acc += d.ntoks
          PackedRow(d.doc_id, gk, d.ntoks, pack)
        }
      }
      .toDF("doc_id", groupCol, "ntoks", "pack_id")
  }
}
