package searchspark.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import searchspark.gen.TranscriptGen
import searchspark.index.{IndexBuild, PostingIndex}

/** Dev probe: per-JOB wall trace of the benched build — job durations
  * AND the driver-side gaps between them (the gaps are pure serial time
  * no parallelism level can shrink; the round-4 Amdahl fit puts the
  * build's size-invariant constant at ~6 s, and this probe shows where
  * it lives). Usage: runMain searchspark.bench.JobTraceProbe [convs] [cores] */
object JobTraceProbe {
  def main(args: Array[String]): Unit = {
    val convs = args.lift(0).map(_.toLong).getOrElse(40000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId,
          (js.properties.getProperty("spark.job.description", "?"), js.time))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (desc, t0) = starts.getOrDefault(je.jobId, ("?", je.time))
        events.add((je.jobId, desc, t0, je.time))
      }
    })
    def runOnce(label: String): Unit = {
      events.clear()
      val turns = TranscriptGen.corpus(spark, TranscriptGen.DefaultSeed, convs, cores * 2).cache()
      turns.count()
      events.clear() // corpus materialization is outside the bench timer
      val t0 = System.currentTimeMillis()
      val idx = IndexBuild.build(spark, turns, partitions = cores * 2)
      val postings = PostingIndex.build(spark, idx, shardSize = 16384).cache()
      postings.count()
      val tEnd = System.currentTimeMillis()
      Thread.sleep(300) // let listener drain
      var prevEnd = t0
      var gapSum = 0L
      var jobSum = 0L
      val it = events.iterator()
      println(s"--- $label: total ${(tEnd - t0) / 1000.0} s ---")
      while (it.hasNext) {
        val (id, desc, s, e) = it.next()
        val gap = s - prevEnd
        gapSum += math.max(0, gap); jobSum += e - s
        println(f"job $id%3d  gap=${gap / 1000.0}%6.2f s  run=${(e - s) / 1000.0}%6.2f s  ${desc.take(90)}")
        prevEnd = math.max(prevEnd, e)
      }
      println(f"[jobtrace $cores cores] jobs=${jobSum / 1000.0}%.2f s  driver-gaps=${gapSum / 1000.0}%.2f s  tail=${(tEnd - prevEnd) / 1000.0}%.2f s")
      postings.unpersist(); idx.unpersist(); turns.unpersist()
      spark.sharedState.cacheManager.clearCache()
    }
    runOnce("cold")
    runOnce("warm")
    spark.stop()
  }
}
