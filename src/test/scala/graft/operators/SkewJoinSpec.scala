package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The salted skew join: row-identical to the plain equi-join, with the
  * fact side's hot keys spread across `salt` reducers. */
class SkewJoinSpec extends SparkSpec {

  private def frames() = {
    import spark.implicits._
    // 90% of fact rows share one hot key — the shape the operator exists for
    val fact = (0L until 200L).map { i =>
      (i, if (i % 10 == 0) i % 7 else 3L, s"f$i")
    }.toDF("row_id", "fk", "payload")
    val dim = Seq((0L, "d0"), (1L, "d1"), (2L, "d2"), (3L, "d3"),
      (4L, "d4"), (5L, "d5"), (6L, "d6"), (99L, "unmatched"))
      .toDF("dk", "dname")
    (fact, dim)
  }

  test("salted join is row-identical to the plain equi-join") {
    val (fact, dim) = frames()
    val salted = SkewJoin.saltedJoin(fact, "fk", dim, "dk",
        saltBy = col("row_id"), salt = 8)
      .select("row_id", "fk", "dk", "dname")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("row_id", "fk", "dk", "dname")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain)
  }

  test("left-outer salted join preserves unmatched fact rows exactly once") {
    val (fact, dim) = frames()
    val noDim3 = dim.filter(col("dk") =!= 3L) // orphan the hot key
    val salted = SkewJoin.saltedJoin(fact, "fk", noDim3, "dk",
        saltBy = col("row_id"), salt = 8, joinType = "left")
      .select("row_id", "dname")
    assert(salted.count() == 200L)
    assert(salted.filter(col("dname").isNull).count() ==
      fact.filter(col("fk") === 3L).count())
  }

  test("the hot key's fact rows land in every salt bucket") {
    val (fact, _) = frames()
    // re-derive the operator's salt expression: all 8 values must appear
    // for the hot key, i.e. the key's rows genuinely spread across reducers
    val buckets = fact.filter(col("fk") === 3L)
      .select(pmod(xxhash64(col("row_id")), lit(8)).as("s"))
      .distinct().count()
    assert(buckets == 8L, s"hot key occupies only $buckets of 8 salts")
  }

  test("salt derivation is deterministic across executions") {
    val (fact, dim) = frames()
    def run() = SkewJoin.saltedJoin(fact, "fk", dim, "dk",
        saltBy = col("row_id"), salt = 8)
      .select("row_id", "dk").collect().map(_.toSeq).toSet
    assert(run() == run())
  }
}
