package searchspark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

import searchspark.ops.{SimOps, TextOps}

/** The similarity-op scale paths must be (a) bucketed — no Cartesian
  * node in the plan — and (b) output-identical to their all-pairs
  * oracles (simhash blocking is exact by pigeonhole; the chunk-pair
  * cosine kernel is exact by construction; hyperplane LSH is exact on a
  * planted near-dup fixture where the threshold has margin). */
class SimPairSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("simhashPairs segment blocking == all-pairs, no cartesian in plan") {
    val docs = TextOps.documents(spark, sfDir)
    val blocked = SimOps.simhashPairs(docs)
    assert(rows(blocked) == rows(SimOps.simhashPairsAllPairs(docs)))
    val p = plan(blocked)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"segment blocking must be an equi-join:\n$p")
  }

  test("annTopK on a missing query vec_id fails loudly, naming the id") {
    val emb = SimOps.embeddings(spark, sfDir)
    val e = intercept[IllegalArgumentException] {
      SimOps.annTopK(emb, queryVecId = -987654L, k = 5).collect()
    }
    assert(e.getMessage.contains("-987654"),
      s"error must name the missing vec_id: ${e.getMessage}")
  }

  test("annBatchTopK == per-query annTopK: bit-identical cos_e4, same ranking") {
    val emb = SimOps.embeddings(spark, sfDir)
    val qIds = Seq(0L, 1L, 2L)
    val batch = SimOps.annBatchTopK(emb, qIds, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(t => (t._2, t._3)).toSeq).toMap
    assert(batch.keySet == qIds.toSet)
    qIds.foreach { qid =>
      val single = SimOps.annTopK(emb, qid, 10).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSeq // (vec_id, cos_e4)
      assert(batch(qid) == single,
        s"batched scan diverged from the per-query kernel for query $qid")
    }
  }

  test("annBatchTopK: duplicate query ids collapse; k past corpus size underfills") {
    val spark0 = spark
    import spark0.implicits._
    // 4-vector corpus → each query has only 3 candidates; k=10 must
    // return exactly 3 rows per query, ranked 1..3, not pad or throw
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val out = SimOps.annBatchTopK(emb, Seq(2L, 0L, 2L, 0L), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val byQuery = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(byQuery.keySet == Set(0L, 2L), s"duplicate ids must collapse: $byQuery")
    assert(byQuery(0L) == Seq(1L, 2L, 3L) && byQuery(2L) == Seq(1L, 2L, 3L),
      s"each query must rank exactly its 3 candidates: $byQuery")
    // and the nearest neighbor is the geometrically obvious one
    val top0 = out.filter(t => t._1 == 0L && t._3 == 1L).head._2
    assert(top0 == 1L, s"query 0's nearest must be vec 1, got $top0")
  }

  test("annBatchTopK with a missing query vec_id fails loudly, naming the id") {
    val emb = SimOps.embeddings(spark, sfDir)
    val e = intercept[IllegalArgumentException] {
      SimOps.annBatchTopK(emb, Seq(0L, -424242L), 5).collect()
    }
    assert(e.getMessage.contains("-424242"),
      s"error must name the missing vec_id: ${e.getMessage}")
  }

  test("embedCosinePairs chunk kernel == all-pairs Catalyst form, no cartesian") {
    val emb = SimOps.embeddings(spark, sfDir)
    val chunked = SimOps.embedCosinePairs(emb, 0.45)
    assert(rows(chunked) == rows(SimOps.embedCosinePairsAllPairs(emb, 0.45)))
    val p = plan(chunked)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"chunk-pair kernel must be an equi-join on the chunk-pair key:\n$p")
  }

  test("dedupClusters: min-label components over a multi-hop pair graph") {
    import TestSpark.spark.implicits._
    // components: {1,2,3,4} via a chain (diameter 3), {7,9}, {5,6,8} via
    // a star on 8 — propagation must cross multiple hops
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (7L, 9L), (8L, 5L), (8L, 6L))
      .toDF("a", "b")
    val expect = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 5L, 9L -> 7L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows(SimOps.dedupClusters(pairs)) == expect) // union-find path
    assert(rows(SimOps.dedupClustersDistributed(pairs)) == expect) // fixpoint path
  }

  test("dedupClustersDistributed resolves a >50-hop chain (no pass guard split)") {
    import TestSpark.spark.implicits._
    // a 200-edge path 0-1-2-…-200: diameter 200, which crashed the
    // round-2 fixpoint at its 50-pass guard; pointer jumping converges
    // in O(log d) passes and must label every node with 0
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("a", "b")
    val got = SimOps.dedupClustersDistributed(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == (0L to 200L).map(i => (i, 0L)))
    // and the public entry under a tiny threshold takes the same path
    val got2 = SimOps.dedupClusters(chain, smallGraphMax = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2 == (0L to 200L).map(i => (i, 0L)))
  }

  /** Planted near-dup fixture: 30 base vectors + a close copy of each
    * (cosine ≥ ~0.999) among `dim`-dim noise. Deterministic seed. */
  private def plantedEmb(dim: Int = 64): DataFrame = {
    val rnd = new scala.util.Random(42)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val rows = (0 until 30).flatMap { i =>
      val base = vec()
      val dup = base.map(x => x + (rnd.nextGaussian() * 0.02).toFloat)
      Seq((i.toLong * 2, i, base.toSeq), (i.toLong * 2 + 1, i, dup.toSeq))
    }
    import spark.implicits._
    rows.toDF("vec_id", "label", "embedding")
  }

  test("embedLshPairs: exact on planted near-dups at thr=0.9, bucketed plan") {
    val emb = plantedEmb()
    val lsh = SimOps.embedLshPairs(emb, 0.9)
    val exact = SimOps.embedCosinePairs(emb, 0.9)
    assert(rows(lsh) == rows(exact),
      "LSH must recover every planted pair (margin regime) and nothing else")
    assert(exact.count() >= 30, "fixture must actually contain the planted pairs")
    val p = plan(lsh)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LSH candidates must come from the band equi-join:\n$p")
  }

  test("embedLshPairs at 256-dim: broadcast-kernel signatures, plan free of plane literals") {
    val emb = plantedEmb(dim = 256)
    val lsh = SimOps.embedLshPairs(emb, 0.9)
    val exact = SimOps.embedCosinePairs(emb, 0.9)
    assert(rows(lsh) == rows(exact), "recall must hold at high dim too")
    // the round-2 form baked planes×dim literal hyperplane components
    // into the Catalyst plan (16k literals at 1024-dim); the kernel form
    // must keep the plan size independent of dim
    val p = plan(lsh)
    val w00 = SimOps.planeW(0, 0).toString
    assert(!p.contains(w00), "hyperplane components must be broadcast, not plan literals")
  }
}
