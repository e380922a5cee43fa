package searchspark.bench

import org.apache.spark.sql.SparkSession

/** Calibration probe: aggregate DRAM read bandwidth vs task parallelism.
  * Each task streams over a large private Long array (way beyond LLC) —
  * pure memory-bound work, no shuffle, no allocation in the timed loop.
  * If aggregate GB/s saturates below local[8], the host cannot express
  * 4x scaling for bandwidth-bound phases between local[2] and local[8],
  * and the N-vs-4N simulation must run inside the linear region (see
  * BENCH.md calibration). Usage: runMain searchspark.bench.MemBwProbe
  */
object MemBwProbe {
  def main(args: Array[String]): Unit = {
    val words = 64 << 20 // 512 MB per task
    Seq(1, 2, 4, 8, 16).foreach { n =>
      val spark = SparkSession.builder().master(s"local[$n]")
        .appName(s"membw-$n").config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val sc = spark.sparkContext
      def pass(): Double = {
        val t0 = System.nanoTime()
        sc.parallelize(1 to n, n).map { _ =>
          val a = new Array[Long](words)
          java.util.Arrays.fill(a, 3L)
          var s = 0L
          var rep = 0
          while (rep < 4) { // 4 streaming passes over 512 MB
            var i = 0
            while (i < words) { s += a(i); i += 1 }
            rep += 1
          }
          s
        }.reduce(_ + _)
        (System.nanoTime() - t0) / 1e9
      }
      pass() // warm JIT
      val sec = (1 to 3).map(_ => pass()).min
      val gb = n.toLong * words * 8L * 4 / 1e9
      println(f"[membw] local[$n]: ${gb / sec}%.1f GB/s aggregate (${gb / sec / n}%.1f per task)")
      spark.stop()
    }
  }
}
