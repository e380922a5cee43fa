package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one SparkEntry query (optionally N reps) and print its
  * formatted physical plan. Usage:
  *   tools/run_main.sh graft.TimeQuery <name> [sfDir] [reps] [explain]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val explain = args.contains("explain")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      println(f"[timequery] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s, $n rows")
      if (explain && i == 1)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
