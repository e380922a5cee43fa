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
    * `turns`. Fully columnar (ZipIndex) — no encoder round trip.
    *
    * The key-dedup is fused into ZipIndex's range shuffle: one
    * repartitionByRange on (conv_id, turn_idx) clusters equal keys, a
    * within-partition sort on (key, tuple DESC) satisfies the dedup
    * window's requirements exchange- and sort-free, and row_number()=1
    * keeps the max tuple — the same max-(ts, role, tool, text) pick as
    * [[dedupIndexable]] (same interpreted struct ordering), asserted
    * equal in DocIdsSpec. The unfused form shuffled the full text
    * column TWICE (hash for groupBy-max, then range for the rank);
    * texts dominate shuffle bytes at corpus scale, so halving text
    * shuffles is the difference between one wide exchange and two.
    * Trade: the groupBy form's map-side partial max reduced shuffle
    * bytes when a key had many duplicates — near-duplicate-free inputs
    * (the normal transcripts case; deltas go through dedupIndexable)
    * ship the same bytes either way. */
  def assign(spark: SparkSession, turns: Dataset[Turn], partitions: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val sortedDedup = turns.toDF()
      .filter(col("text").isNotNull && trim(col("text")) =!= "")
      .select(col("conv_id"), col("turn_idx"),
        struct(col("ts"), col("role"), col("tool"), col("text")).as("__v"))
      .repartitionByRange(partitions, col("conv_id"), col("turn_idx"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"), col("__v").desc)
      .withColumn("__rn", row_number().over(
        Window.partitionBy("conv_id", "turn_idx").orderBy(col("__v").desc)))
      .filter(col("__rn") === 1)
      .select(col("conv_id"), col("turn_idx"),
        coalesce(col("__v.role"), lit("")).as("role"),
        col("__v.tool").as("tool"), col("__v.ts").as("ts"),
        col("__v.text").as("text"))
    ZipIndex.rankOverSorted(sortedDedup, "docId")
      .select("docId", "conv_id", "turn_idx", "role", "tool", "ts", "text")
  }
}
