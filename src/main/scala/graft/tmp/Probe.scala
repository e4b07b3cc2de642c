package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

// scratch warm profiler for x57 (deleted before commit)
object Probe {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    t("warm sf0.001") {
      Dedup.minhashPairs(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache(); System.gc()
    t("x57 full warm 1") {
      Dedup.minhashPairs(spark, dir).write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache(); System.gc()
    t("x57 full warm 2") {
      Dedup.minhashPairs(spark, dir).write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache(); System.gc()
    // warm sub-stages
    val words = Dedup.docWords(spark, dir)
      .withColumn("hwords", expr("array_sort(transform(words, w -> xxhash64(w)))"))
      .cache()
    t("words cache build") { words.count() }
    val groups = Dedup.signatures(words).groupBy("sig")
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .cache()
    t("sig+groups") { groups.count() }
    val reps = groups.select(element_at(col("docs"), 1).as("rep_id"), col("sig"))
    t("repCandidates") { Dedup.repCandidates(reps).count() }
    val within = groups
      .select(col("docs"), explode(col("docs")).as("doc_a"))
      .select(col("doc_a"), explode(col("docs")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("est_j", lit(1.0))
    val cross = Dedup.repCandidates(reps)
      .join(groups.select(element_at(col("docs"), 1).as("rep_a"),
        col("docs").as("da")), "rep_a")
      .join(groups.select(element_at(col("docs"), 1).as("rep_b"),
        col("docs").as("db")), "rep_b")
      .select(col("est_j"), col("db"), explode(col("da")).as("x"))
      .select(col("est_j"), col("x"), explode(col("db")).as("y"))
      .select(least(col("x"), col("y")).as("doc_a"),
        greatest(col("x"), col("y")).as("doc_b"), col("est_j"))
    val pairs = within.unionByName(cross)
    t("pairs no-join count") { pairs.count() }
    t("final with word joins + jaccard + sort") {
      pairs
        .join(words.select(col("doc_id").as("doc_a"), col("hwords").as("wa")), "doc_a")
        .join(words.select(col("doc_id").as("doc_b"), col("hwords").as("wb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("est_j"),
          (size(array_intersect(col("wa"), col("wb"))).cast("double") /
            size(array_union(col("wa"), col("wb"))).cast("double")).as("jaccard"))
        .orderBy("doc_a", "doc_b")
        .write.format("noop").mode("overwrite").save()
    }
    t("final without sort") {
      pairs
        .join(words.select(col("doc_id").as("doc_a"), col("hwords").as("wa")), "doc_a")
        .join(words.select(col("doc_id").as("doc_b"), col("hwords").as("wb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("est_j"),
          (size(array_intersect(col("wa"), col("wb"))).cast("double") /
            size(array_union(col("wa"), col("wb"))).cast("double")).as("jaccard"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
