package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed fact keys.
  *
  * A plain `fact JOIN dim ON k` hash-partitions both sides by `k`; one hot
  * key sends every one of its fact rows to a single reducer, so the stage
  * runs at the speed of the hottest key no matter how many executors exist
  * (at 100 TB a single 1% hot key is a 1 TB partition). AQE's skew-join
  * split handles the sort-merge case reactively; this operator is the
  * explicit, planner-independent form — and the composition contract a user
  * can apply when the dim side is too big to broadcast but small enough to
  * replicate `salt`-fold.
  *
  * The fact side gains a deterministic salt in [0, salt) — `xxhash64` of
  * the join key and a per-row disambiguator, never `rand()` (retries and
  * speculative tasks must re-derive identical salts or the join drops /
  * duplicates rows). The dim side is replicated once per salt value
  * (`explode(sequence(0, salt-1))` — dim × salt rows, the deliberate price
  * of splitting the hot key `salt` ways). Joining on `(k, __gs_salt)`
  * spreads each hot key over `salt` reducers; the result is row-identical
  * to the unsalted join because every (fact-row, dim-row) match pairs
  * exactly once — at the fact row's own salt value.
  *
  * Inner and left-outer joins preserve semantics under this rewrite (each
  * fact row meets the full dim key set at its salt); right/full would need
  * a dim-side dedup after the join and are out of scope.
  */
object SkewJoin {

  /** Inner (or left-outer) join of `fact` and `dim` on
    * `fact(factKey) === dim(dimKey)`, salted `salt` ways. Column names must
    * be disjoint (pre-alias the sides). NULL keys never match, as in the
    * plain equi-join; `saltBy` defaults to the fact key itself, so rows of
    * one hot key still spread (hash of a constant is constant — pass a
    * high-cardinality column like the fact's row id). */
  def saltedJoin(fact: DataFrame, factKey: String,
                 dim: DataFrame, dimKey: String,
                 saltBy: Column, salt: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer", s"unsupported join type: $joinType")
    val f = fact.withColumn("__gs_salt", pmod(xxhash64(saltBy), lit(salt)))
    val d = dim.withColumn("__gs_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    f.join(d, col(factKey) === col(dimKey) &&
        f("__gs_salt") === d("__gs_salt"), joinType)
      .drop("__gs_salt")
  }
}
