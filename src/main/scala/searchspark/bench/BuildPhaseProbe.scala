package searchspark.bench

import org.apache.spark.sql.SparkSession

import searchspark.gen.TranscriptGen
import searchspark.index.{DocIds, IndexBuild, PostingIndex}

/** Dev probe: per-phase wall breakdown of the flagship index build
  * (gen → docId assignment → IndexBuild materialization → posting
  * segments) at one parallelism level, matching graft.Bench's shape.
  * Usage: runMain searchspark.bench.BuildPhaseProbe [convs] [cores]
  */
object BuildPhaseProbe {
  def main(args: Array[String]): Unit = {
    val convs = args.lift(0).map(_.toLong).getOrElse(5000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[phase $label] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round (${if (round == 1) "cold" else "warm"}) ---")
      val turns = time("gen+materialize") {
        val t = TranscriptGen.corpus(spark, TranscriptGen.DefaultSeed, convs, cores * 2)
        t.cache().count(); t
      }
      val idx = time("IndexBuild.build (docIds+tf+dicts+stats)") {
        IndexBuild.build(spark, turns, partitions = cores * 2)
      }
      val postings = time("PostingIndex.build + cache+count") {
        val p = PostingIndex.build(spark, idx, shardSize = 16384).cache()
        p.count(); p
      }
      time("sub: tf count (already materialized?)") { idx.tf.count() }
      postings.unpersist(); idx.unpersist(); turns.unpersist()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
