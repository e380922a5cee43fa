package searchspark.index

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import searchspark.model.TermPostings

/** Row shape feeding the segment encoder: FOUR packed Longs. The
  * repartition exchange moves one of these per posting, so row width
  * is the segment build's dominant shuffle cost — the optimized build
  * is memory-bandwidth-bound at high parallelism, and every UnsafeRow
  * slot removed is bandwidth returned to the encode (one extra 8-byte
  * slot alone measured ~14% on the whole phase; the term string and df
  * are attached by a dictionary join on the ~|groups|-row output
  * instead of riding on every posting).
  *
  * key  = shard << 40 | termId  (shard < 2^23, termId < 2^40; termId
  *        headroom is ~30× the 10^12-turn design point of ~10^9 terms,
  *        but the shard field's headroom DEPENDS ON shardSize: shards =
  *        docs / shardSize, so 2^23 shards covers 10^12 docs only at
  *        the cluster-scale shardSize ~2^20 the class doc prescribes —
  *        at the test default 4096 the ceiling is ~3.4·10^10 docs.
  *        Exceeding either field fails CLOSED via the raise_error
  *        guards below, never silently corrupts a key. The layout keeps
  *        (key, docId) ordering == (shard, termId, docId) ordering, so
  *        one binary sort serves the group cut and the codec's
  *        docId-ascending contract)
  * meta = tfE1 << 32 | roleId   (tfE1 is a positive int; roleId < 2^31,
  *        with -1 = the absent-role sentinel mapped to all-ones low
  *        word and caught by the kernel's roleId check) */
final case class PostingRowPacked(key: Long, docId: Long, meta: Long, dlE1: Long)

/** Encoded segment group before the dictionary attach. */
final case class SegGroup(shard: Int, termId: Long, blocks: Array[searchspark.model.PostingBlock])

/** The compressed, sharded posting-list index (SURVEY.md §3.2 build
  * dataflow): shard = docId range (docId / shardSize), so
  *  - a term's per-shard group can never exceed shardSize postings —
  *    the Zipf-head skew bound (SURVEY.md §7.5.2): the "salt" is the doc
  *    range itself, and no term group blows up no matter how hot;
  *  - query-time intersection is shard-local: each shard holds a full
  *    conjunctive sub-problem, so top-k is per-shard WAND + a driver
  *    merge of ≤ (offset+limit) rows per shard — scatter-gather with no
  *    data shuffle (the only moved bytes are the |q| posting rows per
  *    shard and the merged tops).
  *
  * At 10^12 turns: shardSize ~2^20 → ~10^6 shards; per-(shard,term)
  * encode groups stay ≤ 2^20 entries; the postings table is written
  * sorted by (termId) within files so a query's isin(termIds) prunes
  * row groups (min/max stats) before any decode.
  */
object PostingIndex {

  /** Default shard size tuned for the test corpora; at cluster scale
    * pick ~2^20 (see class doc). */
  val DefaultShardSize = 4096

  /** Build compressed posting segments from the relational index.
    * Everything distributed: one join tf⋈dl⋈terms, one groupBy on
    * (shard, termId) whose group size is bounded by shardSize. */
  def build(spark: SparkSession, idx: BuiltIndex,
            shardSize: Int = DefaultShardSize): Dataset[TermPostings] = {
    import spark.implicits._
    // role-dictionary guard (round-2 ADVICE, high): a role present in
    // the corpus but absent from the dictionary must fail the build
    // LOUDLY, never encode under a foreign roleId (scoped queries would
    // silently return foreign docs). statsByRole's keys are derived
    // from the same tf table (corpusStats at build; role.* entries of
    // stats.json on load), so this driver-side set difference is a free,
    // pre-shuffle check that names every offending role.
    val missing = idx.statsByRole.keySet -- idx.roleIds.keySet
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"roles ${missing.toSeq.sorted.map(r => s"'$r'").mkString(", ")} are " +
          "absent from the role dictionary — stats.json roles and the tf " +
          "table disagree; refusing to encode them under foreign roleIds")
    // role → compact id as a literal CASE (roles are low-cardinality;
    // avoids a join); blocks carry per-posting roleIds for scoped scans.
    // Base case is the -1 SENTINEL, not id 0: unreachable after the
    // guard above, but if the stats themselves are inconsistent with tf
    // the encoder below still fails closed instead of mis-encoding.
    val roleIdCol = idx.roleIds.toSeq.sortBy(_._1).foldLeft(lit(-1)) {
      case (acc, (r, id)) => when(col("role") === r, lit(id)).otherwise(acc)
    }
    // Group-and-encode via ONE Tungsten repartition + within-partition
    // sort, then a single streaming mapPartitions pass that cuts group
    // boundaries on (shard, termId) and encodes each run. The
    // groupByKey(lambda).mapGroups form this replaces deserialized
    // every posting row TWICE (once in AppendColumns for the key
    // function, once in the group iterator) and object-sorted every
    // group by docId; here the shuffle, the (shard, termId, docId)
    // sort (which makes each group arrive docId-ascending — exactly
    // what the delta codec needs) and the group clustering all happen
    // on binary rows with codegen, and rows become objects exactly
    // once, inside the encode kernel. Group size stays bounded by
    // shardSize, so the run buffer is bounded too.
    val shardCol = (col("docId") / shardSize).cast("long").as("shard")
    val keyCol = when(col("shard") >= (1L << 23) || col("termId") >= (1L << 40),
        raise_error(concat(lit("posting key overflow: shard="),
          col("shard").cast("string"), lit(" termId="),
          col("termId").cast("string"),
          lit(" exceed the 23/40-bit packed layout"))))
      .otherwise(shiftleft(col("shard"), 40).bitwiseOR(col("termId")))
    val rows = idx.tf // carries role+dlE1 — no docs join needed
      .join(idx.terms.select(col("term"), col("termId")), Seq("term"))
      .select(shardCol, col("termId"), col("docId"),
        col("tfE1").cast("long").as("tfE1"), col("dlE1"),
        roleIdCol.cast("long").as("roleId"))
      .select(keyCol.as("key"), col("docId"),
        shiftleft(col("tfE1"), 32).bitwiseOR(col("roleId").bitwiseAND(lit(0xffffffffL)))
          .as("meta"),
        col("dlE1"))
    val groups = rows
      .repartition(col("key"))
      .sortWithinPartitions("key", "docId")
      .as[PostingRowPacked]
      .mapPartitions { it =>
        new Iterator[SegGroup] {
          private var pending: PostingRowPacked =
            if (it.hasNext) it.next() else null
          override def hasNext: Boolean = pending != null
          override def next(): SegGroup = {
            val key = pending.key
            val shard = (key >>> 40).toInt
            val termId = key & ((1L << 40) - 1)
            val docIds = new scala.collection.mutable.ArrayBuilder.ofLong
            val tfs = new scala.collection.mutable.ArrayBuilder.ofInt
            val dls = new scala.collection.mutable.ArrayBuilder.ofLong
            val roles = new scala.collection.mutable.ArrayBuilder.ofInt
            var r = pending
            var more = true
            while (more) {
              val roleId = (r.meta & 0xffffffffL).toInt
              if (roleId < 0)
                throw new IllegalStateException(
                  s"doc ${r.docId} (shard $shard) carries a role absent from " +
                    "the role dictionary — tf and stats disagree; refusing " +
                    "to encode it under a foreign roleId")
              docIds += r.docId; tfs += (r.meta >>> 32).toInt
              dls += r.dlE1; roles += roleId
              if (it.hasNext) {
                r = it.next()
                more = r.key == key
              } else { r = null; more = false }
            }
            pending = r
            SegGroup(shard, termId,
              Segments.encode(docIds.result(), tfs.result(), dls.result(), roles.result()))
          }
        }
      }
    // dictionary attach on the GROUP rows (|shards|·|terms-per-shard|,
    // orders of magnitude fewer than postings)
    groups.toDF()
      .join(idx.terms.select(col("termId"), col("term"), col("df")), Seq("termId"))
      .select(col("shard"), col("termId"), col("term"), col("df"), col("blocks"))
      .as[TermPostings]
  }
}
