package searchspark.bench

import org.apache.spark.sql.SparkSession

import searchspark.gen.TranscriptGen
import searchspark.index.{IndexBuild, PostingIndex}

/** Dev probe: decompose the posting-segment phase — raw compute
  * (count, no cache) vs columnar cache build — at one parallelism
  * level. Usage: runMain searchspark.bench.SegProbe [convs] [cores] */
object SegProbe {
  def main(args: Array[String]): Unit = {
    val convs = args.lift(0).map(_.toLong).getOrElse(20000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val turns = TranscriptGen.corpus(spark, TranscriptGen.DefaultSeed, convs, cores * 2).cache()
    turns.count()
    val idx = IndexBuild.build(spark, turns, partitions = cores * 2)
    idx.tf.cache().count() // settle upstream so the probe isolates segments
    idx.terms.cache().count()
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[segprobe $cores] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("warm compute (count, no cache)")(PostingIndex.build(spark, idx, 16384).count())
    time("compute again")(PostingIndex.build(spark, idx, 16384).count())
    val cached = PostingIndex.build(spark, idx, 16384).cache()
    time("cache build + count")(cached.count())
    time("cached re-count")(cached.count())
    spark.stop()
  }
}
