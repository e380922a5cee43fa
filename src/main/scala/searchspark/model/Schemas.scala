package searchspark.model

import java.sql.Timestamp

/** Core row types of the engine.
  *
  * Data-model mapping from the reference (see SURVEY.md §1.2):
  *  - reference `page` (one crawled URL, key `(site_id, path)`,
  *    /root/reference/src/main/java/searchengine/model/Page.java:7-29) →
  *    [[Turn]]: one transcript turn, key `(conv_id, turn_idx)`.
  *  - reference `lemma(site_id, lemma, frequency)`
  *    (model/Lemma.java:6-25) → [[TermStats]] global term dictionary.
  *  - reference `index(page_id, lemma_id, rank)`
  *    (model/IndexEntity.java:5-23) → [[Posting]] rows at build time,
  *    compressed [[PostingBlock]]s at rest.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** A document = one turn with its stable dense id and doc length (token
  * count after analysis). `dl` is what the reference never stored (its
  * normalization was max-score based, SearchingServiceImpl.java:120-126);
  * BM25 needs it. */
final case class Doc(docId: Long, conv_id: String, turn_idx: Int, role: String, dl: Long)

/** One posting: term t occurs tf times in document docId. The reference
  * materialized this as one MySQL row per (page, lemma) with a
  * zone-weighted rank (Link.java:188-218); transcripts are single-zone so
  * rank == tf (weight 1.0, SURVEY.md §1.2). */
final case class Posting(term: String, docId: Long, tf: Int)

/** Term dictionary entry. `df` = number of distinct documents containing
  * the term (the honest version of the reference's `lemma.frequency`,
  * which could double-count title+body, Link.java:201-207); `cf` = total
  * corpus frequency. */
final case class TermStats(termId: Long, term: String, df: Long, cf: Long)

/** One compressed posting block: up to `count` postings for one term
  * within one shard, docIds delta+varint encoded relative to `firstDoc`,
  * tfs and dls (doc lengths, needed for the BM25 partial at query time)
  * varint encoded. `maxScore` = max BM25 partial of this term over the
  * block's docs (block-max WAND bound). */
final case class PostingBlock(
    firstDoc: Long,
    lastDoc: Long,
    count: Int,
    maxScore: Double,
    docs: Array[Byte],
    tfs: Array[Byte],
    dls: Array[Byte])

/** Posting list of one term within one doc-range shard. Shards are
  * docId ranges (docId / shardSize), so query-time intersection is
  * shard-local (scatter-gather top-k, no cross-shard shuffle). */
final case class TermPostings(
    shard: Int,
    termId: Long,
    term: String,
    df: Long,
    blocks: Array[PostingBlock])

/** Scored search hit (API parity with the reference's response rows:
  * dto/searching/SearchingData fields site/uri/title/snippet/relevance;
  * SearchingServiceImpl.java:62-84). `score` is the raw BM25 value,
  * `relevance` = score / maxScore (the reference's r/max normalization,
  * SearchingServiceImpl.java:124-126). */
final case class Hit(
    docId: Long,
    conv_id: String,
    turn_idx: Int,
    role: String,
    score: Double,
    relevance: Double,
    snippet: String)

/** Search response (reference SearchingResponse: result/count/data/error,
  * dto/searching package). `count` = TOTAL candidate count before
  * pagination (SearchingServiceImpl.java:123). */
final case class SearchResult(
    ok: Boolean,
    count: Long,
    hits: Seq[Hit],
    error: String)
