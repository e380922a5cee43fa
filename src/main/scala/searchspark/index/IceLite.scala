package searchspark.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, SparkSession}

/** IceLite — a minimal Iceberg-shaped table layer (SURVEY.md §7.0: no
  * Iceberg runtime jar is available offline, so the snapshot/manifest
  * semantics are implemented in-repo with an Iceberg-compatible shape:
  * immutable data files + versioned snapshot JSON + atomic current-
  * pointer swap, so a real Iceberg catalog could replace this without
  * touching callers).
  *
  * Layout:
  * {{{
  *   table/
  *     data/snap-<id>/part-*.parquet     (immutable per snapshot)
  *     metadata/v<id>.json               (snapshot manifest + lineage)
  *     metadata/current                  (text: "v<id>.json"; atomic rename)
  * }}}
  *
  * This replaces the reference's mutable-MySQL lifecycle: its cascade
  * delete-then-reinsert per re-index
  * (/root/reference/src/main/java/searchengine/services/IndexingServiceImpl.java:199-215)
  * becomes an atomic snapshot swap (`overwrite`), and its
  * `site.status/status_time` progress rows (model/Portal.java:16-21)
  * become per-file lineage entries + snapshot props. Readers are
  * snapshot-isolated: a reader resolving `current` sees one immutable
  * file set; a concurrent commit only ever renames a new pointer over
  * it.
  */
object IceLite extends TableCatalog {

  /** One immutable data file (= one build partition's output). */
  final case class FileEntry(path: String, bytes: Long, rows: Long)

  final case class Snapshot(
      snapshotId: Long,
      parentId: Long, // -1 = none
      operation: String, // "append" | "overwrite"
      totalRows: Long,
      files: Seq[FileEntry],
      props: Map[String, String])

  private val mapper = new ObjectMapper()
  mapper.registerModule(DefaultScalaModule)
  mapper.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  private def metaDir(table: String): Path = Paths.get(table, "metadata")
  private def currentPtr(table: String): Path = metaDir(table).resolve("current")

  override def currentSnapshot(table: String): Option[Snapshot] = {
    val ptr = currentPtr(table)
    if (!Files.exists(ptr)) None
    else {
      val v = new String(Files.readAllBytes(ptr), StandardCharsets.UTF_8).trim
      Some(mapper.readValue(metaDir(table).resolve(v).toFile, classOf[Snapshot]))
    }
  }

  /** Commit `df` as the table's next snapshot. `overwrite` supersedes
    * the previous snapshot (its files stay on disk, immutable — time
    * travel by reading an old v<id>.json still works). Atomicity: the
    * snapshot JSON is written to a temp name, then the `current` pointer
    * is replaced by an atomic rename. */
  override def commit(spark: SparkSession, df: DataFrame, table: String,
                      operation: String = "overwrite",
                      props: Map[String, String] = Map.empty,
                      partitions: Option[Int] = None): Snapshot = {
    val parent = currentSnapshot(table)
    // next id = max existing v*.json + 1, NOT parent+1: a crash between
    // the v<id>.json rename and the current-pointer rename leaves a
    // committed-but-unreferenced v<id>.json; parent+1 would collide with
    // it forever (errorifexists on its data dir). Deriving from max
    // skips over such orphans (they stay readable via time travel).
    val snapshotId = {
      val md = metaDir(table)
      val existing = if (!Files.exists(md)) Seq.empty[Long]
        else {
          val stream = Files.list(md)
          try stream.iterator().asScala.map(_.getFileName.toString)
            .collect { case s if s.matches("v\\d+\\.json") => s.stripPrefix("v").stripSuffix(".json").toLong }
            .toSeq
          finally stream.close() // Files.list leaks a directory fd otherwise
        }
      (existing ++ parent.map(_.snapshotId)).foldLeft(-1L)(math.max) + 1
    }
    val dataDir = Paths.get(table, "data", s"snap-$snapshotId")
    // a data dir without a committed v<id>.json is debris from a crashed
    // writer (commit is only durable once the metadata swap happened) —
    // safe to clear and rewrite
    if (Files.exists(dataDir) && !Files.exists(metaDir(table).resolve(s"v$snapshotId.json"))) {
      Files.walk(dataDir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    val out = partitions.map(df.repartition(_)).getOrElse(df)
    out.write.mode("errorifexists").parquet(dataDir.toString)

    val files = footerEntries(spark, dataDir)
    val snap = Snapshot(snapshotId, parent.map(_.snapshotId).getOrElse(-1L),
      operation, files.map(_.rows).sum, files, props)

    Files.createDirectories(metaDir(table))
    val vName = s"v$snapshotId.json"
    val tmp = metaDir(table).resolve(vName + ".tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(snap))
    Files.move(tmp, metaDir(table).resolve(vName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)

    val ptrTmp = metaDir(table).resolve("current.tmp")
    Files.write(ptrTmp, vName.getBytes(StandardCharsets.UTF_8))
    Files.move(ptrTmp, currentPtr(table),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  /** Per-file lineage entries for a freshly written data dir, from
    * parquet FOOTER metadata only — no second scan of the data just
    * written (at a 100 TB commit a re-read for counting would double the
    * write cost; footers are O(KB/file)). Shared with [[DirCatalog]]. */
  private[index] def footerEntries(spark: SparkSession, dataDir: Path): Seq[FileEntry] = {
    val hconf = spark.sessionState.newHadoopConf()
    val dataStream = Files.list(dataDir)
    try dataStream.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.getFileName.toString)
      .map { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.toString), hconf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val rows = try reader.getRecordCount finally reader.close()
        FileEntry(p.toString, Files.size(p), rows)
      }
    finally dataStream.close()
  }

  /** Read the current snapshot (or a pinned one — time travel). */
  override def read(spark: SparkSession, table: String, snapshotId: Option[Long] = None): DataFrame = {
    val snap = snapshotId match {
      case Some(id) =>
        mapper.readValue(metaDir(table).resolve(s"v$id.json").toFile, classOf[Snapshot])
      case None => currentSnapshot(table).getOrElse(
        throw new IllegalStateException(s"no current snapshot in $table"))
    }
    spark.read.parquet(snap.files.map(_.path): _*)
  }
}
