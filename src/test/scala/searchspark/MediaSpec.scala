package searchspark

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import searchspark.ops.MediaOps

/** Header decode on real container bytes (built in-test: width/height/
  * sample-rate are pure header arithmetic) + the distributed typed
  * pipeline over a binary column. */
class MediaSpec extends AnyFunSuite {

  private def png(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    out.write(Array(0, 0, 0, 13).map(_.toByte), 0, 4) // IHDR length
    out.write("IHDR".getBytes(StandardCharsets.US_ASCII), 0, 4)
    Seq(w, h).foreach { v =>
      out.write(Array(v >>> 24, v >>> 16, v >>> 8, v).map(_.toByte).map(_.toByte), 0, 4)
    }
    out.write(Array(8, 6, 0, 0, 0).map(_.toByte), 0, 5) // bit depth etc
    out.toByteArray
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte), 0, 2) // SOI
    // APP0 segment (len 16) then SOF0
    out.write(Array(0xff, 0xe0, 0x00, 0x10).map(_.toByte), 0, 4)
    out.write(new Array[Byte](14), 0, 14)
    out.write(Array(0xff, 0xc0, 0x00, 0x11, 0x08,
      h >>> 8, h & 0xff, w >>> 8, w & 0xff, 0x03).map(_.toByte), 0, 10)
    out.toByteArray
  }

  private def wav(rate: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes(StandardCharsets.US_ASCII), 0, 4)
    out.write(Array(36, 0, 0, 0).map(_.toByte), 0, 4)
    out.write("WAVE".getBytes(StandardCharsets.US_ASCII), 0, 4)
    out.write("fmt ".getBytes(StandardCharsets.US_ASCII), 0, 4)
    out.write(Array(16, 0, 0, 0).map(_.toByte), 0, 4)
    out.write(Array(1, 0, 2, 0).map(_.toByte), 0, 4) // PCM, stereo
    out.write(Array(rate, rate >>> 8, rate >>> 16, rate >>> 24).map(_.toByte), 0, 4)
    out.write(new Array[Byte](8), 0, 8)
    out.toByteArray
  }

  private def gif(w: Int, h: Int): Array[Byte] =
    ("GIF89a".getBytes(StandardCharsets.US_ASCII) ++
      Array(w & 0xff, w >>> 8, h & 0xff, h >>> 8, 0, 0, 0).map(_.toByte))

  test("sniff extracts header metadata for PNG/JPEG/WAV/GIF, txt fallback") {
    assert(MediaOps.sniff(png(640, 480)) == ("png", Some(640), Some(480), None))
    assert(MediaOps.sniff(jpeg(1920, 1080)) == ("jpeg", Some(1920), Some(1080), None))
    assert(MediaOps.sniff(wav(44100)) == ("wav", None, None, Some(44100)))
    assert(MediaOps.sniff(gif(320, 200)) == ("gif", Some(320), Some(200), None))
    assert(MediaOps.sniff("just some text".getBytes(StandardCharsets.UTF_8)) ==
      ("txt", None, None, None))
    assert(MediaOps.sniff(Array.empty[Byte]) == ("txt", None, None, None))
  }

  test("typed binary pipeline extracts metadata distributed, no shuffle") {
    val spark = TestSpark.spark
    import spark.implicits._
    val payloads = Seq(
      0L -> png(100, 50), 1L -> jpeg(8, 9), 2L -> wav(16000),
      3L -> gif(4, 5), 4L -> "plain".getBytes(StandardCharsets.UTF_8))
    val out = MediaOps.mediaMetaBinary(spark.createDataset(payloads).repartition(3))
      .collect().map(r => (r.getLong(0), r.getString(3),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6)))).toSeq
    assert(out == Seq(
      (0L, "png", Some(100), Some(50), None),
      (1L, "jpeg", Some(8), Some(9), None),
      (2L, "wav", None, None, Some(16000)),
      (3L, "gif", Some(4), Some(5), None),
      (4L, "txt", None, None, None)))
    val plan = MediaOps.mediaMetaBinary(spark.createDataset(payloads))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.contains("rangepartitioning"),
      s"metadata extract must be a narrow pass (only the final sort may shuffle):\n$plan")
  }
}
