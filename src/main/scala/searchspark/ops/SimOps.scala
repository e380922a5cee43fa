package searchspark.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication + similarity-search operators for training-data
  * pipelines: MinHash+LSH, SimHash, embedding cosine ANN. All hashes are
  * md5-derived (60-bit hex prefix → BIGINT) so Spark and the DuckDB
  * oracle compute IDENTICAL integers — no engine-specific hash().
  *
  * Scale notes: every op is a shuffle-on-key plan — shingle/band/cluster
  * keys — with bounded fan-out (df caps, band widths, cluster counts),
  * no driver-side loops; the brute-force cosine ops exist as the exact
  * baseline and the LSH/IVF variants are the 100 TB path.
  */
object SimOps {

  val NumHashes = 12
  val Bands = 3 // 4 rows per band
  val RowsPerBand: Int = NumHashes / Bands

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** 60-bit integer hash of a string column: first 15 hex chars of md5.
    * DuckDB equivalent: ('0x' || substr(md5(x),1,15))::UBIGINT. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** MinHash signatures in long format: (doc_id, i, minh), i ∈ [0,12).
    * h_i(shingle) = hash60(i || ':' || shingle); minh = min over the
    * doc's distinct 3-gram shingles. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sh = TextOps.shingles(docs)
    sh.select(col("doc_id"), col("shingle"),
        explode(expr(s"sequence(0, ${NumHashes - 1})")).as("i"))
      .select(col("doc_id"), col("i"),
        hash60(concat(col("i").cast("string"), lit(":"), col("shingle"))).as("h"))
      .groupBy("doc_id", "i").agg(min("h").as("minh"))
      .select(col("doc_id"), col("i").cast("long").as("i"), col("minh"))
  }

  /** MinHash LSH candidate pairs: docs sharing ≥1 of 3 bands (4 rows
    * each), with estimated similarity = matching-minhash fraction.
    * The band bucket join is the scale path: shuffle on (band, key),
    * never all-pairs. */
  def minhashLsh(docs: DataFrame): DataFrame = {
    val sig = minhashSignatures(docs).cache()
    val bands = sig
      .withColumn("band", (col("i") / RowsPerBand).cast("int"))
      .groupBy("doc_id", "band")
      .agg(array_sort(collect_list(struct(col("i"), col("minh")))).as("rows"))
      .select(col("doc_id"), col("band"),
        array_join(expr("transform(rows, r -> cast(r.minh as string))"), "-").as("key"))
    val cand = bands.select(col("doc_id").as("a"), col("band"), col("key"))
      .join(bands.select(col("doc_id").as("b"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    // candidates FIRST, then widen by the 12 signature rows — |cand|·12
    // rows, never the sig×sig-on-i cross product
    val est = cand
      .join(sig.select(col("doc_id").as("a"), col("i"), col("minh").as("ma")), Seq("a"))
      .join(sig.select(col("doc_id").as("b"), col("i"), col("minh").as("mb")), Seq("b", "i"))
      .groupBy("a", "b")
      .agg(sum(when(col("ma") === col("mb"), 1L).otherwise(0L)).as("matches"))
      .withColumn("est_sim_e6", expr(s"matches * 1000000 div $NumHashes"))
      .select("a", "b", "est_sim_e6")
    est.orderBy("a", "b")
  }

  /** SimHash 60-bit fingerprints: bit j of the fingerprint is the sign
    * of Σ_terms tf · (bit_j(hash60(term)) ? +1 : −1) (≥0 → 1). */
  def simhash(docs: DataFrame): DataFrame =
    TextOps.tf(docs)
      .select(col("doc_id"), col("tf"), hash60(col("term")).as("h"),
        explode(expr("sequence(0, 59)")).as("j"))
      .withColumn("w", col("tf") * (expr("(h >> j) & 1") * 2 - 1))
      .groupBy("doc_id", "j")
      .agg(sum("w").as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") >= 0, expr("shiftleft(cast(1 as bigint), j)"))
        .otherwise(lit(0L))).as("simhash"))
      .orderBy("doc_id")

  /** SimHash near-dup pairs: hamming distance ≤ maxDist. All-pairs here
    * (exact baseline); the scale path blocks on 4 fingerprint segments
    * (any segment equal → candidate), which is minhashLsh-shaped. */
  def simhashPairs(docs: DataFrame, maxDist: Int = 6): DataFrame = {
    val fp = simhash(docs)
    fp.select(col("doc_id").as("a"), col("simhash").as("fa"))
      .crossJoin(fp.select(col("doc_id").as("b"), col("simhash").as("fb")))
      .filter(col("a") < col("b"))
      .withColumn("hamming", expr("bit_count(fa ^ fb)").cast("long"))
      .filter(col("hamming") <= maxDist)
      .select("a", "b", "hamming")
      .orderBy("a", "b")
  }

  // --- embedding similarity -------------------------------------------

  /** Brute-force cosine top-k against the embedding of `queryVecId`
    * (exact ANN baseline; ordering on rounded score + vec_id for
    * cross-engine determinism). */
  def annTopK(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val spark = emb.sparkSession
    val q = emb.filter(col("vec_id") === queryVecId)
      .select("embedding").head.getSeq[Float](0).toArray
    val qNorm = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    val qArr = array(q.map(x => lit(x.toDouble)): _*)
    emb.filter(col("vec_id") =!= queryVecId)
      .withColumn("emb_d", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("q_d", qArr)
      .withColumn("dot", expr(
        "aggregate(zip_with(emb_d, q_d, (x, y) -> x * y), cast(0.0 as double), (a, x) -> a + x)"))
      .withColumn("norm", sqrt(expr(
        "aggregate(transform(emb_d, x -> x * x), cast(0.0 as double), (a, x) -> a + x)")))
      .withColumn("cos_e4", floor(col("dot") / (col("norm") * lit(qNorm)) * 10000.0).cast("long"))
      .select(col("vec_id"), col("label"), col("cos_e4"))
      .orderBy(col("cos_e4").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF-bucketed ANN (the scale path): centroids = first `nCentroids`
    * vectors (deterministic stand-in for k-means — the bucketing
    * plumbing, not the codebook, is what scales); assign every vector to
    * its max-cosine centroid; probe the query's top-`nProbe` centroids;
    * exact top-k within probed buckets. At 100 TB: assignment is one
    * broadcast-join scan, search touches nProbe/nCentroids of the data. */
  def annIvf(emb: DataFrame, queryVecId: Long, k: Int,
             nCentroids: Int = 8, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = emb.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val withD = emb
      .withColumn("emb_d", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("norm", sqrt(expr(
        "aggregate(transform(emb_d, x -> x * x), cast(0.0 as double), (a, x) -> a + x)")))
    val scored = withD.crossJoin(broadcast(cents))
      .withColumn("c_d", expr("transform(cemb, x -> cast(x as double))"))
      .withColumn("cnorm", sqrt(expr(
        "aggregate(transform(c_d, x -> x * x), cast(0.0 as double), (a, x) -> a + x)")))
      .withColumn("cos_c", floor(expr(
        "aggregate(zip_with(emb_d, c_d, (x, y) -> x * y), cast(0.0 as double), (a, x) -> a + x)") /
        (col("norm") * col("cnorm")) * 1000000.0).cast("long"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos_c").desc, col("cid").asc)
    val assigned = scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("cluster"))
    val probes = scored.filter(col("vec_id") === queryVecId)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nProbe)
      .select(col("cid").as("cluster"))
    val inProbed = assigned.join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= queryVecId)
      .select("vec_id")
    annTopKWithin(emb, inProbed, queryVecId, k)
  }

  private def annTopKWithin(emb: DataFrame, ids: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") === queryVecId)
      .select("embedding").head.getSeq[Float](0).toArray
    val qNorm = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    val qArr = array(q.map(x => lit(x.toDouble)): _*)
    emb.join(ids, Seq("vec_id"))
      .withColumn("emb_d", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("q_d", qArr)
      .withColumn("dot", expr(
        "aggregate(zip_with(emb_d, q_d, (x, y) -> x * y), cast(0.0 as double), (a, x) -> a + x)"))
      .withColumn("norm", sqrt(expr(
        "aggregate(transform(emb_d, x -> x * x), cast(0.0 as double), (a, x) -> a + x)")))
      .withColumn("cos_e4", floor(col("dot") / (col("norm") * lit(qNorm)) * 10000.0).cast("long"))
      .select(col("vec_id"), col("label"), col("cos_e4"))
      .orderBy(col("cos_e4").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Embedding near-dup pairs: all pairs with cosine ≥ threshold (the
    * exact counterpart of minhashLsh for dense vectors). */
  def embedCosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    val v = emb
      .withColumn("emb_d", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("norm", sqrt(expr(
        "aggregate(transform(emb_d, x -> x * x), cast(0.0 as double), (a, x) -> a + x)")))
      .select(col("vec_id"), col("emb_d"), col("norm"))
    v.select(col("vec_id").as("a"), col("emb_d").as("ea"), col("norm").as("na"))
      .crossJoin(v.select(col("vec_id").as("b"), col("emb_d").as("eb"), col("norm").as("nb")))
      .filter(col("a") < col("b"))
      .withColumn("cos_e4", floor(expr(
        "aggregate(zip_with(ea, eb, (x, y) -> x * y), cast(0.0 as double), (a, x) -> a + x)") /
        (col("na") * col("nb")) * 10000.0).cast("long"))
      .filter(col("cos_e4") >= math.round(threshold * 1e4))
      .select("a", "b", "cos_e4")
      .orderBy("a", "b")
  }
}
