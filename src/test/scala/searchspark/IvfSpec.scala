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

  test("persisted index cold-loads from disk and still matches brute force") {
    val d = sfDirs.head
    val emb = SimOps.embeddings(spark, d)
    val root = java.nio.file.Files.createTempDirectory("ivf-disk").toString
    val key = s"$d|coldload"
    val built = Ivf.indexFor(emb, key, 16, 5, diskRoot = Some(root))
    val builtCents = built.centroids.map(_.toSeq).toSeq
    val builtAssign = built.assign.orderBy("vec_id").collect().toSeq.map(_.toSeq)

    // forget the session memo: the next indexFor MUST load the artifact,
    // not re-run k-means. A rebuild is detectable on the filesystem — it
    // re-saves, replacing codebook.json — so an unchanged marker mtime
    // proves the load path ran.
    val marker = java.nio.file.Paths.get(root, "codebook.json")
    val savedAt = java.nio.file.Files.getLastModifiedTime(marker)
    Ivf.clearMemo()
    val loaded = Ivf.indexFor(emb, key, 16, 5, diskRoot = Some(root))
    assert(java.nio.file.Files.getLastModifiedTime(marker) == savedAt,
      "post-restart indexFor must cold-load the artifact, not rebuild+resave")
    assert(loaded.centroids.map(_.toSeq).toSeq == builtCents,
      "cold-loaded codebook must be bit-identical to the built one")
    assert(loaded.assign.orderBy("vec_id").collect().toSeq.map(_.toSeq) == builtAssign)

    // and the probed query over the loaded index still recovers the
    // exact brute-force top-k
    val brute = SimOps.annTopK(emb, 0L, 10).collect().toSeq.map(_.toSeq)
    val viaDisk = Ivf.query(loaded, 0L, 10, 8, emb).collect().toSeq.map(_.toSeq)
    assert(viaDisk == brute)

    // the probed scan prunes partitions: a cluster IN (...) filter over
    // the partitioned layout must not read every directory
    val probes = Seq(0, 1).map(Integer.valueOf)
    val pruned = loaded.assign
      .filter(org.apache.spark.sql.functions.col("cluster").isInCollection(probes))
    assert(pruned.count() < loaded.assign.count(),
      "cluster-partitioned artifact must restrict the probed scan")
    Ivf.clearMemo()
  }

  test("stale artifact is rejected: corpus fingerprint mismatch → rebuild") {
    // simulate "data regenerated under the same path": build + persist
    // the index over sf0.001, then ask for the SAME artifact root with a
    // different corpus — load must refuse the stale codebook and rebuild
    // (observable: the commit marker is re-written)
    val root = java.nio.file.Files.createTempDirectory("ivf-stale").toString
    val embA = SimOps.embeddings(spark, sfDirs.head)
    val embB = SimOps.embeddings(spark, sfDirs(1))
    Ivf.indexFor(embA, "stale|a", 16, 5, diskRoot = Some(root))
    val marker = java.nio.file.Paths.get(root, "codebook.json")
    val savedAt = java.nio.file.Files.getLastModifiedTime(marker)
    Ivf.clearMemo()
    assert(Ivf.load(spark, root, embB).isEmpty,
      "a changed corpus must fail the fingerprint check")
    Ivf.indexFor(embB, "stale|b", 16, 5, diskRoot = Some(root))
    assert(java.nio.file.Files.getLastModifiedTime(marker) != savedAt,
      "indexFor over the changed corpus must rebuild + re-commit")
    // and the refreshed artifact now loads for B
    Ivf.clearMemo()
    assert(Ivf.load(spark, root, embB).isDefined)
    Ivf.clearMemo()
  }

  test("auto-k (≈√n) index at a corpus-adjacent root matches brute force") {
    val d = sfDirs.head
    val emb = SimOps.embeddings(spark, d)
    val n = emb.count()
    val k = Ivf.autoK(n)
    assert(k == math.max(4, math.round(math.sqrt(n.toDouble)).toInt))
    // artifactRoot stands in for a corpus-adjacent index dir on a real
    // cluster (the testdata dir itself is read-only here)
    val root = java.nio.file.Files.createTempDirectory("ivf-adjacent").toString
    val brute = SimOps.annTopK(emb, 0L, 10).collect().toSeq.map(_.toSeq)
    val auto = Ivf.annIvf(spark, d, 0L, 10, k = 0, nProbe = k,
      artifactRoot = Some(root)).collect().toSeq.map(_.toSeq)
    assert(auto == brute, "auto-k full-probe IVF must recover the exact top-k")
    // the artifact landed under the passed root and cold-loads from it
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(root)).count()
    assert(dirs == 1, "index artifact must live under the corpus-adjacent root")
    Ivf.clearMemo()
    val again = Ivf.annIvf(spark, d, 0L, 10, k = 0, nProbe = k,
      artifactRoot = Some(root)).collect().toSeq.map(_.toSeq)
    assert(again == brute)
    // probing fewer clusters really prunes the candidate scan
    val idx = Ivf.indexFor(emb, s"$d|k=$k|it=5", k, 5)
    val pruned = idx.assign.filter(
      org.apache.spark.sql.functions.col("cluster").isInCollection(Seq(0, 1).map(Integer.valueOf)))
    assert(pruned.count() < idx.assign.count())
    Ivf.clearMemo()
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
