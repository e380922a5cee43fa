package searchspark.query

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import searchspark.index.{BuiltIndex, Segments}
import searchspark.model.{Hit, PostingBlock, SearchResult, TermPostings}

/** Block-max conjunctive top-k over the compressed posting index — the
  * engine path for the reference's Q2+Q3
  * (SearchingServiceImpl.java:181-213 iterated IN-list intersection +
  * :103-133 relevance CTEs), executed as per-shard scatter-gather:
  *
  *  - driver: analyze + prune query terms (same planTerms as the parity
  *    path — Q1 semantics);
  *  - executors: for each doc-range shard, intersect the query terms'
  *    posting lists driving on the RAREST term (the reference's intended
  *    `ORDER BY part` order, defeated in its own code by a HashSet —
  *    SURVEY.md §2.3 — restored here), skipping other lists block-wise
  *    via firstDoc/lastDoc metadata and decoding lazily; candidates are
  *    always COUNTED (the API returns the total, :123) but exact scoring
  *    is skipped when the Σ block-max bound can't beat the current
  *    heap minimum (strict <: a tied bound may still win on the
  *    docId-asc tie-break, so it must be scored);
  *  - driver: merge per-shard top-(offset+limit) heaps, window, hydrate.
  *
  * Scores are bit-identical to the oracle/parity path: per-term partials
  * summed in ascending TERM order (intersection order ≠ summation
  * order). */
object Wand {

  /** Per-shard result: candidate count + top rows (docId, score). */
  private type ShardTop = (Long, Array[(Long, Double)])

  /** Ordering "better first": score DESC, docId ASC. */
  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  def search(spark: SparkSession, idx: BuiltIndex,
             postings: Dataset[TermPostings], query: String,
             offset: Int = 0, limit: Int = 20): SearchResult =
    searchWith(spark, idx, query, offset, limit, None) {
      case (surviving, bIdf, bOrder, avgdl, k) =>
        val nTerms = surviving.size
        import spark.implicits._
        postings
          .filter(col("term").isInCollection(surviving))
          .groupByKey(_.shard)
          .mapGroups { (_, it) =>
            val lists = it.toArray
            if (lists.length < nTerms) (0L, Array.empty[(Long, Double)])
            else wandShard(lists, bIdf.value, bOrder.value._1, bOrder.value._2, avgdl, k)
          }
          .collect()
    }

  /** Hot path: postings pre-partitioned by shard (SearchEngine.load) —
    * the scatter is a SINGLE stage with no shuffle: filter preserves the
    * partitioning, each partition groups its complete shards locally. */
  def searchPartitioned(spark: SparkSession, idx: BuiltIndex,
                        byShard: org.apache.spark.rdd.RDD[TermPostings],
                        query: String, offset: Int = 0, limit: Int = 20,
                        dfCache: Option[scala.collection.concurrent.Map[String, Long]] = None)
    : SearchResult =
    searchWith(spark, idx, query, offset, limit, dfCache) {
      case (surviving, bIdf, bOrder, avgdl, k) =>
        val survSet = surviving.toSet
        val bSurv = spark.sparkContext.broadcast(survSet)
        val nTerms = surviving.size
        byShard
          .mapPartitions { it =>
            val surv = bSurv.value
            it.filter(p => surv.contains(p.term))
              .toSeq.groupBy(_.shard).iterator
              .map { case (_, rows) =>
                val lists = rows.toArray
                if (lists.length < nTerms) (0L, Array.empty[(Long, Double)])
                else wandShard(lists, bIdf.value, bOrder.value._1, bOrder.value._2, avgdl, k)
              }
          }
          .collect()
    }

  private def searchWith(spark: SparkSession, idx: BuiltIndex, query: String,
                         offset: Int, limit: Int,
                         dfCache: Option[scala.collection.concurrent.Map[String, Long]])(
      scatter: ((Seq[String],
                 org.apache.spark.broadcast.Broadcast[Map[String, Double]],
                 org.apache.spark.broadcast.Broadcast[(Seq[String], Seq[String])],
                 Double, Int)) => Array[ShardTop]): SearchResult = {
    SearchService.planTerms(idx, query, None, dfCache) match {
      case Left(err) => err
      case Right((surviving, dfMap, n, avgdl)) =>
        val k = offset + limit
        val idfByTerm = surviving.map(t => t -> Scoring.idf(dfMap(t), n)).toMap
        val termsAsc = surviving.sorted
        val byRarity = surviving.sortBy(t => (dfMap(t), t))
        val bIdf = spark.sparkContext.broadcast(idfByTerm)
        val bOrder = spark.sparkContext.broadcast((termsAsc, byRarity))
        val shardTops = scatter((surviving, bIdf, bOrder, avgdl, k))

        val total = shardTops.map(_._1).sum
        if (total == 0) return SearchResult(ok = false, 0, Nil, "Nothing found")
        val merged = shardTops.flatMap(_._2)
          .sortWith(better)
        val maxScore = merged.head._2
        val page = merged.slice(offset, offset + limit)

        val ids = page.map(_._1)
        val hydrated = idx.docs
          .filter(col("docId").isInCollection(ids.map(java.lang.Long.valueOf).toSeq))
          .select("docId", "conv_id", "turn_idx", "role", "text")
          .collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getString(3), r.getString(4))))
          .toMap
        val qSet = surviving.toSet
        val hits = page.map { case (d, s) =>
          val (cid, tix, role, text) = hydrated(d)
          Hit(d, cid, tix, role, s, s / maxScore, Snippets.snippet(text, qSet))
        }
        SearchResult(ok = true, total, hits.toIndexedSeq, null)
    }
  }

  /** Lazily-decoded posting list cursor with block skipping. */
  private final class ListCursor(blocks: Array[PostingBlock]) {
    private var bi = 0 // current block index
    private var decoded: (Array[Long], Array[Int], Array[Long]) = _
    private var decodedBi = -1

    /** Advance to the block that could contain `d`; false if exhausted. */
    private def seekBlock(d: Long): Boolean = {
      while (bi < blocks.length && blocks(bi).lastDoc < d) bi += 1
      bi < blocks.length
    }

    /** Current block's max partial score after a successful find. */
    var curBlockMax: Double = 0.0

    /** Find doc `d`; returns (tf, dl) or null. Monotone-increasing `d`
      * across calls (driver list is sorted). */
    def find(d: Long): (Int, Long) = {
      if (!seekBlock(d)) return null
      val b = blocks(bi)
      curBlockMax = b.maxScore
      if (b.firstDoc > d) return null
      if (decodedBi != bi) { decoded = Segments.decodeBlock(b); decodedBi = bi }
      val (docs, tfs, dls) = decoded
      var lo = 0
      var hi = docs.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (docs(mid) < d) lo = mid + 1
        else if (docs(mid) > d) hi = mid - 1
        else return (tfs(mid), dls(mid))
      }
      null
    }
  }

  /** One shard's conjunctive block-max scan. */
  private def wandShard(lists: Array[TermPostings],
                        idfByTerm: Map[String, Double],
                        termsAsc: Seq[String], byRarity: Seq[String],
                        avgdl: Double, k: Int): ShardTop = {
    val byTerm = lists.map(l => l.term -> l).toMap
    val driver = byTerm(byRarity.head)
    val others = byRarity.tail.map(t => t -> new ListCursor(byTerm(t).blocks)).toArray

    // bounded heap of the k best; head (the PQ max) = the WORST kept
    // entry, so "a < b iff a is better than b"
    val heap = mutable.PriorityQueue.empty[(Long, Double)](
      Ordering.fromLessThan[(Long, Double)]((a, b) => better(a, b)))
    var count = 0L

    val found = mutable.HashMap.empty[String, (Int, Long)]
    driver.blocks.foreach { db =>
      val (docs, tfs, dls) = Segments.decodeBlock(db)
      var i = 0
      while (i < docs.length) {
        val d = docs(i)
        found.clear()
        found(driver.term) = (tfs(i), dls(i))
        var bound = db.maxScore
        var ok = true
        var j = 0
        while (ok && j < others.length) {
          val (t, cur) = others(j)
          val hit = cur.find(d)
          if (hit == null) ok = false
          else { found(t) = hit; bound += cur.curBlockMax }
          j += 1
        }
        if (ok) {
          count += 1
          val prune = heap.size >= k && bound < heap.head._2
          if (!prune) {
            // exact score: ascending term order (determinism contract)
            var s = 0.0
            termsAsc.foreach { t =>
              val (tf, dl) = found(t)
              s += Scoring.partial(idfByTerm(t), tf.toLong, dl, avgdl)
            }
            val cand = (d, s)
            if (heap.size < k) heap.enqueue(cand)
            else if (better(cand, heap.head)) { heap.dequeue(); heap.enqueue(cand) }
          }
        }
        i += 1
      }
    }
    (count, heap.dequeueAll.toArray.sortWith(better))
  }
}
