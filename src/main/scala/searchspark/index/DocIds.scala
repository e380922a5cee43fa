package searchspark.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import searchspark.model.Turn

/** Stable dense docId assignment (SURVEY.md §7.3).
  *
  * docId = rank of (conv_id, turn_idx) in lexicographic order over the
  * indexable (non-blank) turns. Computed scale-out:
  * range-repartition on the key → sort within partitions → per-partition
  * counts → driver prefix-sum → per-partition offset add (this is what
  * `zipWithIndex` does under the hood; two passes, no global sort
  * bottleneck, no driver materialization).
  *
  * Deterministic at ANY parallelism: range boundaries may differ between
  * runs, but the id is the global rank of a unique key, which is
  * invariant to where the boundaries fall. (Tested in DocIdsSpec.)
  * `monotonically_increasing_id` (partition-layout-dependent) and a
  * global `row_number()` window (single-partition bottleneck) are both
  * deliberately avoided.
  *
  * Replaces the reference's AUTO_INCREMENT page ids
  * (/root/reference/src/main/java/searchengine/model/Page.java:11-13),
  * which are insertion-order-dependent and racey under its concurrent
  * crawl; ours are a pure function of the input.
  */
object DocIds {

  val schema: StructType = StructType(Seq(
    StructField("docId", LongType, nullable = false),
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("text", StringType, nullable = true)))

  /** The SINGLE deterministic key-dedup used by cold builds AND
    * incremental deltas (they must agree or cold-vs-incremental
    * equivalence breaks): keep the max (ts, role, tool, text) tuple per
    * (conv_id, turn_idx) — mirroring the reference's unique
    * (site_id, path(255)) upsert (A5/C1, Link.java:172-186) without
    * dropDuplicates' arbitrary-row pick. Blank-text turns (the
    * failed-fetch analog, Link.java:110-116) are excluded. */
  def dedupIndexable(turns: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, max, struct, trim}
    turns
      .filter(col("text").isNotNull && trim(col("text")) =!= "")
      .groupBy("conv_id", "turn_idx")
      .agg(max(struct(col("ts"), col("role"), col("tool"), col("text"))).as("v"))
      .select(col("conv_id"), col("turn_idx"),
        // null roles normalized to "" AT INGEST: every downstream
        // role-keyed structure (role dictionary, per-posting roleIds,
        // scoped filters, per-role stats) assumes non-null equality
        coalesce(col("v.role"), lit("")).as("role"), col("v.tool").as("tool"),
        col("v.ts").as("ts"), col("v.text").as("text"))
  }

  /** Assign ids over the indexable (non-blank, key-deduped) subset of
    * `turns`. Fully columnar (ZipIndex) — no encoder round trip. */
  def assign(spark: SparkSession, turns: Dataset[Turn], partitions: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    ZipIndex.withRank(dedupIndexable(turns.toDF()), Seq(col("conv_id"), col("turn_idx")),
        partitions, "docId")
      .select("docId", "conv_id", "turn_idx", "role", "tool", "ts", "text")
  }
}
