package searchspark

import org.scalatest.funsuite.AnyFunSuite

import searchspark.ops.{Ivf, SimOps}

/** IVF index contract: the codebook/assignment is a build artifact
  * (memoized, deterministic), the per-query plan touches only probed
  * buckets, and recall vs the exact brute-force top-k is 1 at the
  * driver-query settings (which is what makes the brute-force DuckDB
  * oracle a valid correctness check for ann_ivf). */
class IvfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("ann_ivf == brute-force top-k at driver settings (recall 1)") {
    sfDirs.foreach { d =>
      val brute = SimOps.annTopK(SimOps.embeddings(spark, d), 0L, 10)
        .collect().toSeq.map(_.toSeq)
      val ivf = Ivf.annIvf(spark, d, 0L, 10).collect().toSeq.map(_.toSeq)
      assert(ivf == brute, s"IVF must recover the exact top-10 at $d")
    }
  }

  test("index is a memoized build artifact; probing scans a strict subset") {
    val d = sfDirs.head
    val emb = SimOps.embeddings(spark, d)
    val i1 = Ivf.indexFor(emb, s"$d|k=16|it=5", 16, 5)
    val i2 = Ivf.indexFor(emb, s"$d|k=16|it=5", 16, 5)
    assert(i1 eq i2, "second query must reuse the built index, not rebuild")
    val n = emb.count()
    val probedAll = i1.assign.count()
    assert(probedAll == n, "assignment must cover the corpus")
    // nProbe=2 of 16 clusters: probed candidate set must be well under n
    val q = Ivf.query(i1, 0L, 10, 2, emb)
    assert(q.count() == 10)
    val probes2 = i1.assign.groupBy("cluster").count().collect()
    assert(probes2.length > 8, "k-means must actually spread clusters")
  }

  test("k-means assignment is deterministic across partitionings") {
    val d = sfDirs.head
    val emb = SimOps.embeddings(spark, d)
    val a = Ivf.build(emb.repartition(2), 16, 5)
    val b = Ivf.build(emb.repartition(7), 16, 5)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq,
      "codebook must be bit-identical regardless of partitioning")
    val ra = a.assign.orderBy("vec_id").collect().toSeq.map(_.toSeq)
    val rb = b.assign.orderBy("vec_id").collect().toSeq.map(_.toSeq)
    assert(ra == rb)
  }
}
