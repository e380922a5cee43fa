package searchspark.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed per-partition in batch (the Spark-side shape of a
  * decode / feature-extract stage for image/audio/video payloads).
  *
  * The decode itself is STUBBED — this container has no media libraries
  * — as a deterministic function of the bytes (length, first byte,
  * format tag). Everything around it is the real thing a media pipeline
  * needs at scale: a binary column carried columnar end-to-end, a
  * per-partition iterator (batch-shaped like Arrow-based `mapInPandas`
  * in PySpark — in Scala the idiomatic equivalent is `mapPartitions`
  * over the binary rows), an explicit output schema, no driver
  * collection.
  */
object MediaOps {

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("first_byte", IntegerType, nullable = false),
    StructField("fmt", StringType, nullable = false)))

  /** STUB decode: replace with a real codec when media libs exist.
    * Deterministic so the DuckDB oracle can check the plumbing. */
  private def decodeStub(payload: Array[Byte]): (Long, Int, String) =
    (payload.length.toLong, if (payload.isEmpty) -1 else payload(0) & 0xff, "txt")

  /** Treat each document's text bytes as an opaque media payload and run
    * the partition-batched extract. */
  def mediaMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val binary = docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val out = binary.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (n, fb, fmt) = decodeStub(r.getAs[Array[Byte]](1))
        Row(id, n, fb, fmt)
      }
    }
    spark.createDataFrame(out, outSchema).orderBy("doc_id")
  }
}
