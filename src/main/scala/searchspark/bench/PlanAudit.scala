package searchspark.bench

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import searchspark.gen.TranscriptGen
import searchspark.index.BuildPipeline
import searchspark.ops.TextOps

/** Physical-plan audit: dump formatted plans of the load-bearing
  * queries so scan pruning / pushdown / codegen spans can be inspected
  * (and regressions spotted in review). Run: runMain searchspark.bench.PlanAudit */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.001"

    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }

    val docs = TextOps.documents(spark, sfDir)
    show("b5_tf (analyzer + TF agg)", TextOps.tf(docs))
    show("bm25_topk", TextOps.bm25TopK(docs, Seq("dup", "key", "vector"), 20))

    // persisted-index query path: does the term filter prune the
    // postings parquet scan?
    val root = Files.createTempDirectory("planaudit").toString
    import spark.implicits._
    BuildPipeline.run(spark,
      spark.createDataset(TranscriptGen.localCorpus(42L, 10)),
      root, "gen:42:10", partitions = 2)
    val postings = BuildPipeline.loadPostings(spark, root)
    show("postings term filter (WAND scatter input)",
      postings.filter(col("term").isInCollection(Seq("w0001", "w0002"))).toDF())

    spark.stop()
  }
}
