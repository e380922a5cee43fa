package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import searchspark.ops.{EventOps, MediaOps, SimOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline ops) is exposed as a named query over the driver-provided
  * testdata tables, with DuckDB-equivalent SQL in [[OracleSql]]. The
  * transcript-corpus engine itself (index build, WAND, IceLite,
  * resumability) is exercised by `sbt -batch test` (RankIdentitySpec &
  * co.) since its semantics aren't SQL-expressible.
  */
object SparkEntry {

  private val T = OracleSql.SearchTerms

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * conjunctive BM25 top-k over the documents table. */
  def entry(spark: SparkSession): DataFrame =
    TextOps.bm25TopK(TextOps.documents(spark, "/root/testdata/sf0.001"), T, 20)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — analyzer surface (SURVEY §2.2 B1–B5) —
    "b1_tokenize" -> ((s, d) => TextOps.tokensRaw(TextOps.documents(s, d)).orderBy("doc_id", "tok")),
    "b2b3_token_filter" -> ((s, d) => TextOps.tokensFiltered(TextOps.documents(s, d)).orderBy("doc_id", "tok")),
    "b4_lemmatize" -> ((s, d) => TextOps.lemmaMapping(TextOps.documents(s, d))),
    "b4_lemmatize_ru" -> ((s, _) => TextOps.tfRu(s)),
    "b5_tf" -> ((s, d) => TextOps.tf(TextOps.documents(s, d)).orderBy("doc_id", "term")),
    "c5_zone_weighted_tf" -> ((s, d) => TextOps.zoneWeightedTf(TextOps.documents(s, d))),
    "c6_doc_stats" -> ((s, d) => TextOps.docLengths(TextOps.documents(s, d)).orderBy("doc_id")),
    // — query-side relational stages (SURVEY §2.3 Q1–Q3, Q6–Q7; §2.4 C11) —
    "q1_stopword_prune" -> ((s, d) => {
      val docs = TextOps.documents(s, d)
      TextOps.stopwordPrune(docs, docs.count())
    }),
    "q2_conjunctive" -> ((s, d) => TextOps.conjunctive(TextOps.documents(s, d), T)),
    "q3_relevance" -> ((s, d) => TextOps.relevance(TextOps.documents(s, d), T, 20)),
    "bm25_topk" -> ((s, d) => TextOps.bm25TopK(TextOps.documents(s, d), T, 20)),
    "bm25_paginated" -> ((s, d) => TextOps.bm25TopK(TextOps.documents(s, d), OracleSql.WideTerms, 20, offset = 20)),
    "bm25_scoped" -> ((s, d) => TextOps.bm25TopK(TextOps.documents(s, d), T, 20,
      scopeLang = Some(OracleSql.ScopeLang))),
    "q6_docs_per_scope" -> ((s, d) => TextOps.docsPerScope(TextOps.documents(s, d))),
    "q7_terms_per_scope" -> ((s, d) => TextOps.termsPerScope(TextOps.documents(s, d))),
    "c11_statistics" -> ((s, d) => TextOps.statistics(TextOps.documents(s, d))),
    // — dedup family —
    "a5_dedup_exact" -> ((s, d) => TextOps.dedupExact(TextOps.documents(s, d))),
    "dedup_ngram_jaccard" -> ((s, d) => TextOps.ngramJaccard(TextOps.documents(s, d))),
    "text_minhash_sig" -> ((s, d) => SimOps.minhashSignatures(TextOps.documents(s, d)).orderBy("doc_id", "i")),
    "dedup_minhash_lsh" -> ((s, d) => SimOps.minhashLsh(TextOps.documents(s, d))),
    "dedup_clusters" -> ((s, d) => SimOps.dedupClusters(SimOps.minhashCandidatePairs(TextOps.documents(s, d)))),
    "sample_split" -> ((s, d) => TextOps.sampleSplit(TextOps.documents(s, d))),
    // — event-log sessionization (the events table's pipeline op) —
    "events_sessionize" -> ((s, d) => EventOps.sessionize(EventOps.events(s, d))),
    "events_windowed" -> ((s, d) => EventOps.windowedCounts(EventOps.events(s, d))),
    "text_simhash" -> ((s, d) => SimOps.simhash(TextOps.documents(s, d))),
    "dedup_simhash_pairs" -> ((s, d) => SimOps.simhashPairs(TextOps.documents(s, d))),
    "dedup_embed_cosine" -> ((s, d) => SimOps.embedCosinePairs(SimOps.embeddings(s, d), OracleSql.EmbedDupThreshold)),
    "dedup_embed_lsh" -> ((s, d) => SimOps.embedLshPairs(SimOps.embeddings(s, d), OracleSql.EmbedDupThreshold)),
    // — similarity search —
    "ann_cosine_topk" -> ((s, d) => SimOps.annTopK(SimOps.embeddings(s, d), 0L, 10)),
    "ann_batch_topk" -> ((s, d) => SimOps.annBatchTopK(SimOps.embeddings(s, d), OracleSql.AnnBatchIds, 10)),
    "ann_ivf" -> ((s, d) => searchspark.ops.Ivf.annIvf(s, d, 0L, 10)),
    // — text analysis —
    "text_langid" -> ((s, d) => TextOps.langId(TextOps.documents(s, d))),
    "text_pii_scrub" -> ((s, d) => TextOps.piiScrub(TextOps.documents(s, d))),
    "text_repetition" -> ((s, d) => TextOps.repetition(TextOps.documents(s, d))),
    "decontaminate" -> ((s, d) => TextOps.decontaminate(TextOps.documents(s, d), TextOps.EvalFixture)),
    "decontaminate_overlap" -> ((s, d) => TextOps.decontaminateOverlap(TextOps.documents(s, d), TextOps.EvalFixture)),
    "text_unigram_surprisal" -> ((s, d) => TextOps.unigramSurprisal(TextOps.documents(s, d))),
    "tfidf_top_terms" -> ((s, d) => TextOps.tfidfTopTerms(TextOps.documents(s, d))),
    "text_quality" -> ((s, d) => TextOps.quality(TextOps.documents(s, d))),
    "text_tokcount" -> ((s, d) => TextOps.tokenCounts(TextOps.documents(s, d))),
    "text_fingerprint" -> ((s, d) => TextOps.fingerprint(TextOps.documents(s, d))),
    // — multimodal plumbing: real pure-JVM header parsers over binary
    //   payloads; media_meta sniffs the documents' text bytes (wav/gif/
    //   txt branches), media_meta_bin parses generated PNG/JPEG/WAV/GIF
    //   containers whose header fields the oracle recomputes
    //   arithmetically from doc_id —
    "media_meta" -> ((s, d) => MediaOps.mediaMeta(TextOps.documents(s, d))),
    "media_meta_bin" -> ((s, d) => MediaOps.mediaMetaFixture(TextOps.documents(s, d)))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] = OracleSql.sql
}
