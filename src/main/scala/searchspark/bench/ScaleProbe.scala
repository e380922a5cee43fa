package searchspark.bench
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleProbe {
  def run(cores: Int): Double = {
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // warmup
      spark.range(0, 1000000, 1, cores * 2).select(sum(expr("conv(substr(md5(cast(id as string)),1,15),16,10)"))).head
      val t0 = System.nanoTime()
      spark.range(0, 60000000L, 1, cores * 2)
        .select(sum(expr("conv(substr(md5(cast(id as string)),1,15),16,10)").cast("double"))).head
      (System.nanoTime() - t0) / 1e9
    } finally spark.stop()
  }
  def main(args: Array[String]): Unit = {
    val a = run(2); val b = run(8)
    println(f"probe md5-cpu: 2c=$a%.2f s 8c=$b%.2f s speedup=${a/b}%.2f eff=${a/b/4}%.3f")
    val c = run(2); val d = run(8)
    println(f"probe repeat:  2c=$c%.2f s 8c=$d%.2f s speedup=${c/d}%.2f eff=${c/d/4}%.3f")
  }
}
