package searchspark.index

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import searchspark.model.TermPostings

/** Row shape feeding the segment encoder. `role` rides along solely so
  * a dictionary miss (roleId == -1) can name the offending role in its
  * error instead of silently mis-encoding (round-2 ADVICE, high). */
final case class PostingRowFlat(
    shard: Int, termId: Long, term: String, df: Long,
    docId: Long, tfE1: Int, dlE1: Long, roleId: Int, role: String)

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
    // role → compact id as a literal CASE (roles are low-cardinality;
    // avoids a join); blocks carry per-posting roleIds for scoped scans.
    // Base case is the -1 SENTINEL, not id 0: a role absent from the
    // dictionary must fail the build loudly below, not silently encode
    // under the first real role (scoped queries would return foreign
    // docs — round-2 ADVICE, high)
    val roleIdCol = idx.roleIds.toSeq.sortBy(_._1).foldLeft(lit(-1)) {
      case (acc, (r, id)) => when(col("role") === r, lit(id)).otherwise(acc)
    }
    val rows = idx.tf // carries role+dlE1 — no docs join needed
      .join(idx.terms.select(col("term"), col("termId"), col("df")), Seq("term"))
      .select(
        (col("docId") / shardSize).cast("int").as("shard"),
        col("termId"), col("term"), col("df"),
        col("docId"), col("tfE1").cast("int").as("tfE1"), col("dlE1"),
        roleIdCol.as("roleId"), col("role"))
      .as[PostingRowFlat]
    rows.groupByKey(r => (r.shard, r.termId))
      .mapGroups { (key: (Int, Long), it: Iterator[PostingRowFlat]) =>
        val (shard, termId) = key
        val buf = it.toArray
        buf.find(_.roleId < 0).foreach { bad =>
          throw new IllegalStateException(
            s"role '${bad.role}' (doc ${bad.docId}, shard $shard) is absent " +
              "from the role dictionary — stats.json roles and the tf table " +
              "disagree; refusing to encode it under a foreign roleId")
        }
        java.util.Arrays.sort(buf, Ordering.by((r: PostingRowFlat) => r.docId))
        val blocks = Segments.encode(
          buf.map(_.docId), buf.map(_.tfE1), buf.map(_.dlE1), buf.map(_.roleId))
        TermPostings(shard, termId, buf.head.term, buf.head.df, blocks)
      }
  }
}
