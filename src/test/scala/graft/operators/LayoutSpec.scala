package graft.operators

import org.apache.spark.sql.functions.{col, max, min, spark_partition_id}
import graft.SparkSpec
import graft.functions.ZOrder2

/** ZOrder2 (the Morton interleave expression) + Layout.zorderBy (the
  * write-side clustering it exists for). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorder2 interleaves bits (known codes + random cross-check)") {
    // axis unit vectors and small known codes
    assert(ZOrder2.interleave(0, 0) == 0L)
    assert(ZOrder2.interleave(1, 0) == 1L)
    assert(ZOrder2.interleave(0, 1) == 2L)
    assert(ZOrder2.interleave(3, 0) == 5L)    // x bits -> even positions
    assert(ZOrder2.interleave(0, 3) == 10L)   // y bits -> odd positions
    assert(ZOrder2.interleave(3, 3) == 15L)
    // top kept bit of each input
    assert(ZOrder2.interleave(1 << 20, 0) == 1L << 40)
    assert(ZOrder2.interleave(0, 1 << 20) == 1L << 41)
    // bits above Bits are masked off, negative ints included
    assert(ZOrder2.interleave(1 << 21, 0) == 0L)
    assert(ZOrder2.interleave(-1, -1) == (1L << 42) - 1)
    // bit-parallel spread == naive per-bit loop on random inputs
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val x = rnd.nextInt(1 << 21); val y = rnd.nextInt(1 << 21)
      val naive = (0 until 21).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
      assert(ZOrder2.interleave(x, y) == naive, s"($x, $y)")
    }
  }

  test("zorder2 SQL registration: codegen path, null-safe") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT zorder2(3, 5), zorder2(CAST(NULL AS INT), 1)").head
    assert(r.getLong(0) == ZOrder2.interleave(3, 5))
    assert(r.isNullAt(1))
  }

  test("zorderBy co-clusters BOTH key columns into narrow partition ranges") {
    // 64x64 grid, shuffled input: after z-ordering into 16 partitions,
    // every partition must hold a narrow window of BOTH x and y — the
    // property parquet row-group min/max pruning needs. A lexicographic
    // sort would leave y spanning the full 0..63 range in every partition.
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)
    val df = scala.util.Random.shuffle(grid).toDF("x", "y")
      .repartition(8)
    val stats = Layout.zorderBy("x", "y", 16)(df)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect()
    assert(stats.length == 16)
    stats.foreach { r =>
      val xr = r.getAs[Int]("x1") - r.getAs[Int]("x0")
      val yr = r.getAs[Int]("y1") - r.getAs[Int]("y0")
      // a 16-way z-partition of a 64x64 grid averages 256 consecutive
      // z codes — a bounding box of ~16x32. Allow 4x sampling skew in
      // repartitionByRange's boundaries: even a 1024-code run fits two
      // adjacent 32x32 quadtree cells, still well under the full 0..63
      // span a lexicographic sort leaves on its non-leading column.
      assert(xr <= 48 && yr <= 48, s"partition ${r.getAs[Int]("pid")}: " +
        s"x range $xr, y range $yr")
    }
  }
}
