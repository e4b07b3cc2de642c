package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Data-layout helpers for write-side clustering (SURVEY.md §2.2 B8).
  *
  * At 100 TB the scan-side win comes from file/row-group pruning, and
  * pruning quality is decided when the data is WRITTEN: parquet keeps
  * min/max statistics per row group, so co-clustering the frequently
  * filtered columns before the write is what makes later selective scans
  * skip data. A lexicographic `sortWithinPartitions(a, b)` only prunes the
  * leading column; the Z-order curve bounds the value range of BOTH
  * columns inside every run of consecutive rows.
  */
object Layout {

  /** Range-partition + locally sort `df` by the Z-order code of the two
    * (int-valued) key columns. The result, written to parquet, gives every
    * row group a narrow min/max window on BOTH keys:
    * `df.transform(Layout.zorderBy("x", "y", 64)).write.parquet(...)`.
    *
    * repartitionByRange samples the z-values to pick balanced boundaries
    * (one extra pass over the input — the standard price of a global
    * sort), then each output partition holds one contiguous z-range. Keys
    * wider than 2²¹ must be pre-bucketed by the caller (`key >> shift`);
    * clustering only needs the prefix bits.
    */
  def zorderBy(a: String, b: String, numPartitions: Int)
              (df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val z = expr(s"zorder2(CAST(`$a` AS INT), CAST(`$b` AS INT))")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
