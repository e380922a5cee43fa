package searchspark.bench
import org.apache.spark.sql.SparkSession

/** Scratch plan probe: run a query warm, then inspect the FINAL adaptive
  * plan (AQE resolves ReusedExchange only after stages materialize, so
  * pre-execution executedPlan understates reuse). */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = searchspark.ops.TextOps.documents(spark, "/root/testdata/sf0.1")
    val q = searchspark.ops.TextOps.ngramJaccard(docs)
    Seq(1, 2, 3).foreach { i =>
      val t0 = System.nanoTime(); val n = q.collect().length
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    val plan = q.queryExecution.executedPlan.toString
    println(plan)
    println("Exchange nodes: " + "Exchange hashpartitioning".r.findAllIn(plan).length)
    println("Generate(explode) nodes: " + "Generate explode".r.findAllIn(plan).length)
    println("Scan parquet nodes: " + "Scan parquet".r.findAllIn(plan).length)
    spark.stop()
  }
}
