package searchspark.index

import org.apache.spark.sql.functions.{col, rand}
import org.scalatest.funsuite.AnyFunSuite

import searchspark.TestSpark
import searchspark.gen.TranscriptGen

/** Classification gate for the build's input-cache skip (round-4 ADVICE):
  * `isRepeatableScan` must admit ONLY deterministic file scans. A false
  * positive here is a silent-corruption class — DocIds' key pass and zip
  * pass would evaluate different row sets (nondeterministic filter) or
  * differently-ordered partitions (non-file relation) and the positional
  * zip would attach docIds to the wrong rows without tripping the
  * address-misalignment guards. */
class RepeatableScanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val parquetPath = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scan").toFile
    dir.deleteOnExit()
    val p = new java.io.File(dir, "turns.parquet").getAbsolutePath
    import spark.implicits._
    spark.createDataset(TranscriptGen.localCorpus(42L, 20))
      .write.mode("overwrite").parquet(p)
    p
  }

  private def cls(df: org.apache.spark.sql.Dataset[_]): Boolean =
    IndexBuild.isRepeatableScan(df.queryExecution.optimizedPlan)

  test("bare and deterministically-wrapped file scans classify repeatable") {
    val scan = spark.read.parquet(parquetPath)
    assert(cls(scan))
    assert(cls(scan.select("conv_id", "turn_idx", "text")))
    assert(cls(scan.filter(col("turn_idx") >= 0)))
    assert(cls(scan.filter(col("role") === "user")
      .select("conv_id", "turn_idx", "text", "role", "tool", "ts")))
    assert(cls(scan.alias("t")))
  }

  test("nondeterministic filter/projection/sample falls back to caching") {
    val scan = spark.read.parquet(parquetPath)
    // NOT rand() < 2.0: Catalyst folds always-true rand comparisons away
    // (rand ∈ [0,1)), leaving a genuinely-repeatable bare scan
    assert(!cls(scan.filter(rand() < 0.5)))
    assert(!cls(scan.withColumn("r", rand())))
    assert(!cls(scan.sample(0.9)))
    assert(!cls(scan.sample(0.9).select("conv_id", "turn_idx")))
  }

  test("non-file relations fall back to caching") {
    import spark.implicits._
    val local = spark.createDataset(TranscriptGen.localCorpus(42L, 4))
    assert(!cls(local)) // in-memory LocalRelation: no re-scan at all
    val scan = spark.read.parquet(parquetPath)
    assert(!cls(scan.join(scan.select("conv_id").distinct(), "conv_id")))
    assert(!cls(scan.repartition(4)))
  }

  test("V2 parquet (FileTable) classifies repeatable") {
    val prev = spark.conf.getOption("spark.sql.sources.useV1SourceList")
    try {
      spark.conf.set("spark.sql.sources.useV1SourceList", "")
      val scan = spark.read.parquet(parquetPath)
      assert(cls(scan))
      assert(cls(scan.filter(col("turn_idx") >= 0).select("conv_id", "text")))
      assert(!cls(scan.filter(rand() < 0.5)))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.useV1SourceList", v)
      case None => spark.conf.unset("spark.sql.sources.useV1SourceList")
    }
  }
}
