package searchspark.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import searchspark.ops.SimOps

/** ANN scoring-kernel bench (round-3 VERDICT wrong #1/#2 done-check):
  * times the typed broadcast-kernel `SimOps.annTopK` against the
  * interpreted Catalyst form it replaced (query vector as plan
  * literals + `aggregate(zip_with(...))` per row, reproduced inline
  * here as the comparison arm) on a high-dim synthetic corpus, and
  * asserts the two produce identical rows.
  *
  * Usage: runMain searchspark.bench.AnnBench [nVecs] [dim] [cores]
  * Prints one JSON line.
  */
object AnnBench {

  /** The replaced implementation, verbatim shape: dim plan literals,
    * interpreted higher-order aggregates per row. */
  private def annTopKInterpreted(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
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

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(200000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(256)
    val cores = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb = spark.range(n).map { id =>
      // deterministic per-(id, d) floats in [-1, 1) — no Random state
      val v = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        var h = id * 0x9E3779B97F4A7C15L + d * 0xC2B2AE3D27D4EB4FL
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        v(d) = ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
        d += 1
      }
      (id, v, (id % 5).toInt)
    }.toDF("vec_id", "embedding", "label").cache()
    emb.count()

    def time(body: => Array[org.apache.spark.sql.Row]): (Double, Seq[Seq[Any]]) = {
      val t0 = System.nanoTime()
      val rows = body
      ((System.nanoTime() - t0) / 1e9, rows.toSeq.map(_.toSeq))
    }
    // warm both paths once (JIT + codegen), then measure best-of-3
    SimOps.annTopK(emb, 0L, 10).collect()
    annTopKInterpreted(emb, 0L, 10).collect()
    val kernel = (1 to 3).map(_ => time(SimOps.annTopK(emb, 0L, 10).collect()))
    val interp = (1 to 3).map(_ => time(annTopKInterpreted(emb, 0L, 10).collect()))
    require(kernel.head._2 == interp.head._2,
      "kernel and interpreted forms must produce identical top-k rows")
    val kSec = kernel.map(_._1).min
    val iSec = interp.map(_._1).min
    println(s"""{"bench":"ann-kernel","n":$n,"dim":$dim,"cores":$cores,""" +
      s""""sec_kernel":${f"$kSec%.3f"},"sec_interpreted":${f"$iSec%.3f"},""" +
      s""""speedup":${f"${iSec / kSec}%.2f"}}""")
    spark.stop()
  }
}
