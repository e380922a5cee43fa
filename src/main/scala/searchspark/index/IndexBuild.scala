package searchspark.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import searchspark.analyze.Analyzer
import searchspark.model.{Turn, ZoneConfig}
import searchspark.query.Scoring

/** Global scalar corpus statistics (broadcast at query time — the
  * reference recomputes page_count per query via CTE,
  * SearchingServiceImpl.java:240-243; we compute once per snapshot).
  * `avgdl` is in dlE1 units (×10-scaled weighted doc length); the
  * dl/avgdl ratio BM25 consumes is scale-invariant. */
final case class CorpusStats(n: Long, avgdl: Double, totalTurns: Long, skippedBlank: Long)

/** One uncompressed posting row as emitted by the TF kernel (field
  * order IS the tf table's column order). */
final case class TfRow(docId: Long, role: String, dlE1: Long, term: String, tfE1: Int)

/** The built index, as DataFrames (persist via IceLite, or cache for
  * tests). Replaces the reference's page/lemma/`index` MySQL tables
  * (SURVEY.md §1.1) with columnar, partition-friendly layouts. */
final case class BuiltIndex(
    docs: DataFrame,        // docId, conv_id, turn_idx, role, tool, ts, text
    tf: DataFrame,          // docId, role, dlE1, term, tfE1 (uncompressed postings)
    terms: DataFrame,       // term, termId, df, cf        (global dictionary)
    termsByRole: DataFrame, // role, term, df              (scope-local df)
    stats: CorpusStats,
    statsByRole: Map[String, (Long, Double)], // role -> (N, avgdlE1)
    roleList: Seq[String] = Nil) { // APPEND-ONLY role dictionary order

  /** Compact role ids for the posting codec / scoped scans: position in
    * the APPEND-ONLY `roleList` (cold build: sorted distinct roles;
    * incremental appends only ever add new roles at the END, persisted
    * via stats.json). Ids must never be remapped: kept posting shards
    * are not re-encoded on append, so a rank-in-current-sorted-set
    * mapping would silently corrupt scoped search the moment an append
    * introduced a role that sorts before an existing one. */
  lazy val roleIds: Map[String, Int] =
    (if (roleList.nonEmpty) roleList
     else statsByRole.keys.toSeq.sorted).zipWithIndex.toMap

  def cache(): BuiltIndex = {
    docs.cache(); tf.cache(); terms.cache(); termsByRole.cache(); this
  }
  def unpersist(): Unit = {
    docs.unpersist(); tf.unpersist(); terms.unpersist(); termsByRole.unpersist()
  }
}

/** Distributed index build — the replacement for the reference's
  * crawl→lemmatize→row-at-a-time-upsert pipeline
  * (Link.java:188-218 did ≥3 SQL round trips PER LEMMA OCCURRENCE; here
  * the texts are analyzed exactly where they sit — no exchange in the
  * whole build ever carries a text column; only narrow keys, posting
  * rows and id routes move — PlanGuardSpec pins the shape).
  *
  * Dataflow (SURVEY.md §3.2):
  *   transcripts scan
  *     → blank filter + key-dedup + stable docId      (DocIds two-pass: narrow
  *       assignment                                     key rank + positional
  *                                                      zip-back — TEXT BYTES
  *                                                      NEVER CROSS AN
  *                                                      EXCHANGE; the only
  *                                                      shuffles are ~40-byte
  *                                                      key rows and 16-byte
  *                                                      id routes)
  *     → analyzer B1–B4 + per-doc TF + dl             (NARROW typed kernel —
  *                                                     a doc's tokens never
  *                                                     leave their row; zero
  *                                                     shuffle, Zipf-head
  *                                                     terms are a non-issue
  *                                                     because nothing is
  *                                                     grouped by term here)
  *     → df per (role, term) and global               (partial agg over tf)
  *     → terms dictionary with stable termId          (sort + zipWithIndex
  *                                                     on the SMALL dict)
  *
  * The only skew-sensitive step is the posting-SEGMENT build (collect a
  * term's in-shard postings together, one packed-row exchange), which
  * Segments.scala bounds by sharding docId ranges — a term's group can
  * never exceed the shard size (SURVEY.md §7.5.2).
  */
object IndexBuild {

  /** Stage: analyzer projection + per-doc TF — ZERO shuffle.
    *
    * A turn's tokens all live in ONE `text` value, so per-(doc, term)
    * counts and the doc length dlE1 never need a regroup: this typed
    * mapPartitions kernel runs B1–B4 (the Form-1 Scala analyzer,
    * pinned == the Catalyst Column form by AnalyzerSpec and == the
    * DuckDB SQL form by the driver's hash checks) and counts terms
    * per doc in one in-memory map, emitting finished
    * (docId, role, dlE1, term, tfE1) rows narrowly.
    *
    * The declarative groupBy form it replaces
    * ([[tfFromDocsDeclarative]], kept as this kernel's cross-check in
    * StabilitySpec) paid one shuffle over EVERY (doc, term) row plus a
    * dl join back that re-ran the aggregation lineage — at corpus
    * scale the TF shuffle was the build's largest exchange; here it is
    * gone entirely (measured at 131k turns / 5.5M tf rows, local[32]:
    * 3.8 s → sub-second, and the downstream dict/segment shuffles now
    * read narrow finished rows). A pure-Catalyst narrow form was tried
    * first and reverted: higher-order aggregate/filter lambdas are
    * interpreted, not codegen'd (4x slower) — the kernel is the same
    * primitive-loop pattern as SimOps' similarity kernels.
    *
    * tf is stored as tfE1 = ×10-scaled weighted tf (Scoring.TfScaleE1):
    * single-zone builds store 10·count (scoring divides back exactly);
    * a ZoneConfig reproduces the reference's C5 weighted-rank semantics
    * (rank = tfBody·0.8 if the term appears in body, else tfTitle·1.0 —
    * the reference's body-overwrites-title rule, Link.java:209-216)
    * with zone counts packed into one Long per term (title in the high
    * 32 bits): zone position is the index among RAW tokens, same as
    * the posexplode the declarative zoned branch used.
    *
    * `role` and `dlE1` (both functionally dependent on docId) ride along
    * so the query path and the segment build never join the TF table
    * back to docs. Determinism: output is a pure per-row function of
    * (docId, role, text) — invariant to partitioning and parallelism;
    * row order within a doc is first-occurrence order of each term. */
  def tfFromDocs(docsRaw: DataFrame, zones: Option[ZoneConfig] = None): DataFrame = {
    val spark = docsRaw.sparkSession
    import spark.implicits._
    val cfg = Analyzer.config
    val zoned = zones.isDefined
    val titleTokens = zones.map(_.titleTokens).getOrElse(0)
    val titleW = zones.map(_.titleWeightE1).getOrElse(Scoring.TfScaleE1)
    val bodyW = zones.map(_.bodyWeightE1).getOrElse(Scoring.TfScaleE1)
    docsRaw.select(col("docId"), col("role"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (docId, role, text) =>
          val toks = cfg.tokenize(text)
          // per-term packed counts: title occurrences in the high 32
          // bits, body (or all, unzoned) in the low 32 — one map pass
          val m = new java.util.LinkedHashMap[String, java.lang.Long]()
          var i = 0
          while (i < toks.length) {
            val t = toks(i)
            if (cfg.keepToken(t) && cfg.notStopword(t)) {
              val add = if (zoned && i < titleTokens) 1L << 32 else 1L
              val term = cfg.lemma(t)
              val prev = m.get(term)
              m.put(term, if (prev == null) add else prev + add)
            }
            i += 1
          }
          if (m.isEmpty) Iterator.empty
          else {
            val n = m.size
            val terms = new Array[String](n)
            val tfs = new Array[Int](n)
            var dl = 0L
            var j = 0
            val it = m.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              val packed = e.getValue.longValue()
              val tfT = (packed >>> 32).toInt
              val tfB = (packed & 0xffffffffL).toInt
              val tfE1 =
                if (!zoned) tfB * Scoring.TfScaleE1
                else if (tfB > 0) tfB * bodyW
                else tfT * titleW
              terms(j) = e.getKey
              tfs(j) = tfE1
              dl += tfE1
              j += 1
            }
            (0 until n).iterator.map(k => TfRow(docId, role, dl, terms(k), tfs(k)))
          }
        }
      }
      .toDF("docId", "role", "dlE1", "term", "tfE1")
  }

  /** The declarative (Catalyst groupBy + dl-join) TF form the kernel
    * above replaced — kept ONLY as the independent cross-check oracle
    * (StabilitySpec asserts kernel == declarative row-for-row, zoned
    * and unzoned). Not on any production path. */
  def tfFromDocsDeclarative(docsRaw: DataFrame, zones: Option[ZoneConfig] = None): DataFrame = {
    val tok = col("tok")
    val tf0 = zones match {
      case None =>
        docsRaw
          .select(col("docId"), col("role"), explode(Analyzer.tokensCol(col("text"))).as("tok"))
          .filter(length(tok) > 1 || tok.isInCollection(Analyzer.KeepShort.toSeq.sorted))
          .filter(!tok.isInCollection(Analyzer.Stopwords.toIndexedSeq))
          .select(col("docId"), col("role"), Analyzer.lemmaCol(tok).as("term"))
          .groupBy(col("docId"), col("role"), col("term"))
          .agg((count(lit(1)) * Scoring.TfScaleE1).cast("int").as("tfE1"))
      case Some(z) =>
        docsRaw
          .select(col("docId"), col("role"),
            posexplode(Analyzer.tokensCol(col("text"))).as(Seq("pos", "tok")))
          .filter(length(tok) > 1 || tok.isInCollection(Analyzer.KeepShort.toSeq.sorted))
          .filter(!tok.isInCollection(Analyzer.Stopwords.toIndexedSeq))
          .select(col("docId"), col("role"),
            (col("pos") < z.titleTokens).as("isTitle"),
            Analyzer.lemmaCol(tok).as("term"))
          .groupBy(col("docId"), col("role"), col("term"))
          .agg(sum(when(col("isTitle"), 1L).otherwise(0L)).as("tfT"),
            sum(when(col("isTitle"), 0L).otherwise(1L)).as("tfB"))
          .select(col("docId"), col("role"), col("term"),
            when(col("tfB") > 0, col("tfB") * z.bodyWeightE1)
              .otherwise(col("tfT") * z.titleWeightE1).cast("int").as("tfE1"))
    }
    // dlE1 = Σ tfE1 per doc, joined back onto the SKINNY tf rows (never
    // the texts table): at bench scale the dl side auto-broadcasts; at
    // cluster scale it's a shuffle join of two narrow tables. (A narrow
    // per-row dl recompute was tried and reverted: higher-order filter()
    // lambdas are interpreted, not codegen'd — it made TF 4x slower.)
    val dl = tf0.groupBy("docId").agg(sum("tfE1").as("dlE1"))
    tf0.join(dl, Seq("docId"))
      .select("docId", "role", "dlE1", "term", "tfE1")
  }

  /** Stage: term dictionary — df = distinct docs (tf rows are unique per
    * (docId, term)), cf = Σ tfE1 (E1 units); termId = rank in term sort
    * order (stable across parallelism, same zipWithIndex as DocIds). */
  def termDict(spark: SparkSession, tf: DataFrame, partitions: Int): DataFrame = {
    val termAgg = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tfE1").as("cf"))
    ZipIndex.withRank(termAgg, Seq(col("term")),
        math.max(1, partitions / 4), "termId")
      .select("term", "termId", "df", "cf")
  }

  /** Stage: scope-local df (reference: per-site lemma rows; per-role).
    * No join — role rides in the TF rows. */
  def termsByRole(tf: DataFrame): DataFrame =
    tf.groupBy("role", "term").agg(count(lit(1)).as("df"))

  /** Build the index over a transcript Dataset. `partitions` sizes the
    * range shuffle for docId assignment (≈ input split count). */
  def build(spark: SparkSession, turns: Dataset[Turn], partitions: Int,
            zones: Option[ZoneConfig] = None): BuiltIndex = {
    // Cache discipline is what makes the build scale with cores: without
    // it every downstream job (TF shuffle, dl join, dict, stats,
    // segments) re-runs the whole upstream lineage — source scan +
    // range shuffle + sort — serially re-paying fixed costs that drown
    // the parallel speedup (measured: 0.36 scaling efficiency uncached
    // at 8→32 cores vs near-linear cached).
    def phase[T](name: String)(body: => T): T =
      if (!sys.env.contains("SPARK_GRAFT_PHASE_TIMING")) body
      else {
        val s = System.nanoTime()
        val r = body
        System.err.println(f"[build-phase] $name: ${(System.nanoTime() - s) / 1e9}%.2f s")
        r
      }
    val timing = sys.env.contains("SPARK_GRAFT_PHASE_TIMING")
    // Input caching is for REPEATABILITY cost, not correctness (the
    // two-pass docId assignment anchors one RDD instance either way).
    // A plain file/table scan is re-scanned instead of cached: the
    // build reads the input twice (narrow key pass, zip walk) and a
    // second parallel columnar scan is cheaper — and scales better —
    // than writing the whole text corpus into the memory cache first
    // (the cache write is the kind of bandwidth-bound stage this
    // build's dataflow otherwise eliminates). Anything non-leaf (a
    // join-derived or generated input) still caches to pin its layout.
    val inputIsTableScan = isRepeatableScan(turns.queryExecution.optimizedPlan)
    val turnsCached = if (inputIsTableScan) turns else turns.cache()
    val totalTurns = phase("scan+count")(turnsCached.count())
    // Zero-text-shuffle assignment: the narrow key pass runs eagerly
    // inside assignWithMeta (rank prefix sums); the text-bearing zip
    // output stays LAZY and materializes exactly once — into the TF
    // kernel below. keyMeta is the cached narrow winner table; every
    // later per-doc question (stats role counts) reads it instead of
    // re-walking texts.
    val (docsRaw, keyMeta) =
      phase("docIds")(DocIds.assignWithMeta(spark, turnsCached, partitions))
    val tf = tfFromDocs(docsRaw, zones).cache()
    if (timing) phase("tf")(tf.count())
    val terms = termDict(spark, tf, partitions)
    if (timing) phase("dict")(terms.count())
    val byRoleDf = termsByRole(tf)

    val (stats, byRole) = phase("stats")(corpusStats(keyMeta, tf, totalTurns))
    if (!inputIsTableScan) turnsCached.unpersist()
    BuiltIndex(docsRaw, tf, terms, byRoleDf, stats, byRole,
      roleList = byRole.keys.toSeq.sorted)
  }

  /** Global + per-role scalar stats. avgdl (E1 units) = exact Long sum /
    * count (NOT avg(): Double partial sums are order-dependent across
    * parallelism; Long sums are exact, so this is bit-identical to the
    * oracle and across cluster sizes). dl sums come from the tf rows
    * (one tf row per (doc, term), dlE1 functionally dependent on docId →
    * use Σ tfE1 which equals Σ_docs dlE1; zero-term docs contribute 0
    * and are counted via docMeta). `docMeta` is any one-row-per-doc
    * frame with a normalized `role` column — the build passes the
    * NARROW cached winner table so this job never touches text bytes;
    * the pipeline's stats stage passes the persisted docs_raw (parquet
    * column pruning reads role only). */
  def corpusStats(docMeta: DataFrame, tf: DataFrame, totalTurns: Long)
    : (CorpusStats, Map[String, (Long, Double)]) = {
    // ONE job total (global scalars derived from the per-role rollups):
    // every extra driver job here is serial time paid identically at
    // every cluster size — pure Amdahl loss on the scaling criterion.
    // The doc-count side scans docsRaw (zero-term docs must count) and
    // the dl side scans tf; a left join runs both aggregations as one
    // job (roles are a handful of rows — the join is a broadcast).
    val roleRows = docMeta.groupBy("role").agg(count(lit(1)).as("n"))
      .join(tf.groupBy("role").agg(sum("tfE1").as("sumdl")), Seq("role"), "left")
      .collect()
    val roleN = roleRows
      .map(r => Option(r.getString(0)).getOrElse("") -> r.getLong(1)).toMap
    val roleDl = roleRows.filter(!_.isNullAt(2))
      .map(r => Option(r.getString(0)).getOrElse("") -> r.getLong(2)).toMap
    val nDocs = roleN.valuesIterator.sum
    val sumDl = roleDl.valuesIterator.sum
    val stats = CorpusStats(nDocs,
      if (nDocs == 0) 0.0 else sumDl.toDouble / nDocs,
      totalTurns, totalTurns - nDocs)
    val byRole = roleN.map { case (role, n) =>
      role -> (n, roleDl.getOrElse(role, 0L).toDouble / n)
    }
    (stats, byRole)
  }

  /** True iff the plan is a bare FILE scan (optionally wrapped in
    * deterministic Project/Filter/alias) — the class of inputs DocIds'
    * repeatable-scan contract names as safe to re-evaluate: file splits
    * are fixed at physical planning, so every pass over the ONE anchored
    * RDD sees the same partition layout without a pinning cache.
    *
    * Everything else falls back to caching (fail-safe): a
    * nondeterministic filter/projection (rand() sampling) would evaluate
    * a DIFFERENT row set on the key pass vs the zip pass, and a non-file
    * relation (JDBC, arbitrary V2 source) gives no per-partition
    * row-order guarantee across re-scans — either silently mis-assigns
    * docIds under the positional zip, so neither may classify as
    * repeatable. V1 must be a HadoopFsRelation; V2 must be a FileTable
    * (parquet/orc/csv/json v2) — the public superclass of every
    * file-based V2 table — not just any relation. */
  private[index] def isRepeatableScan(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Project, SubqueryAlias}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, FileTable}
    def fileBacked(table: org.apache.spark.sql.connector.catalog.Table): Boolean =
      table.isInstanceOf[FileTable] ||
        // Iceberg snapshot tables are repeatable (reads pin a snapshot id)
        // but the jar may be absent at compile time — match by name.
        table.getClass.getName.toLowerCase.contains("iceberg")
    plan match {
      case p: Project =>
        p.projectList.forall(_.deterministic) && isRepeatableScan(p.child)
      case f: LFilter =>
        f.condition.deterministic && isRepeatableScan(f.child)
      case a: SubqueryAlias => isRepeatableScan(a.child)
      case lr: LogicalRelation => lr.relation.isInstanceOf[HadoopFsRelation]
      case r: DataSourceV2ScanRelation => fileBacked(r.relation.table)
      case r: DataSourceV2Relation => fileBacked(r.table)
      case _ => false
    }
  }

  /** Convenience: read a transcripts parquet path as Dataset[Turn]. */
  def readTranscripts(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read.parquet(path).as[Turn]
  }
}
