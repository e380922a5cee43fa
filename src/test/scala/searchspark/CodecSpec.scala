package searchspark

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import searchspark.index.Segments
import searchspark.query.Scoring

/** Posting-block codec properties (SURVEY.md §5.2) — 200 seeded-random
  * posting lists (deterministic; plain-scalacheck-style without the
  * scalatestplus bridge, which isn't in the offline cache). */
class CodecSpec extends AnyFunSuite {

  test("varint round-trip: 0, small, large, Long.MaxValue") {
    Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Long.MaxValue).foreach { v =>
      val out = new java.io.ByteArrayOutputStream()
      Segments.writeVarLong(out, v)
      val (back, pos) = Segments.readVarLong(out.toByteArray, 0)
      assert(back == v && pos == out.size)
    }
  }

  test("varint rejects negatives") {
    val out = new java.io.ByteArrayOutputStream()
    intercept[IllegalArgumentException](Segments.writeVarLong(out, -1L))
  }

  private def randomPostings(r: Random): (Array[Long], Array[Int], Array[Long]) = {
    val n = 1 + r.nextInt(700)
    val start = math.abs(r.nextLong()) % (1L << 40)
    val docIds = new Array[Long](n)
    var d = start
    var i = 0
    while (i < n) {
      d += 1 + r.nextInt(100000)
      docIds(i) = d
      i += 1
    }
    (docIds, Array.fill(n)(1 + r.nextInt(500)), Array.fill(n)(1L + r.nextInt(3000)))
  }

  test("encode→decode == identity for arbitrary sorted posting lists") {
    val r = new Random(42)
    (1 to 200).foreach { _ =>
      val (docIds, tfs, dls) = randomPostings(r)
      val idfT = Scoring.idf(docIds.length.toLong, 10000L)
      val blocks = Segments.encode(docIds, tfs, dls, idfT, 50.0)
      val (d2, t2, l2) = Segments.decodeAll(blocks)
      assert(d2.toSeq == docIds.toSeq)
      assert(t2.toSeq == tfs.toSeq)
      assert(l2.toSeq == dls.toSeq)
      assert(blocks.forall(_.count <= Segments.BlockSize))
      assert(blocks.map(_.count).sum == docIds.length)
      blocks.foreach { b =>
        val (bd, _, _) = Segments.decodeBlock(b)
        assert(b.firstDoc == bd.head && b.lastDoc == bd.last)
      }
    }
  }

  test("block maxScore == max of exact partials in the block") {
    val r = new Random(7)
    (1 to 100).foreach { _ =>
      val (docIds, tfs, dls) = randomPostings(r)
      val idfT = Scoring.idf(math.max(1, docIds.length / 2).toLong, 10000L)
      val avgdl = 47.3
      val blocks = Segments.encode(docIds, tfs, dls, idfT, avgdl)
      var off = 0
      blocks.foreach { b =>
        val exact = (off until off + b.count).map(i =>
          Scoring.partial(idfT, tfs(i).toLong, dls(i), avgdl)).max
        assert(b.maxScore == exact)
        off += b.count
      }
    }
  }

  test("compression is effective on dense lists") {
    val docIds = Array.tabulate(10000)(i => 1000L + i)
    val tfs = Array.fill(10000)(3)
    val dls = Array.fill(10000)(100L)
    val blocks = Segments.encode(docIds, tfs, dls, 1.0, 50.0)
    val bytes = blocks.map(b => b.docs.length + b.tfs.length + b.dls.length).sum
    assert(bytes < 10000 * 4) // ~1 byte/field/posting vs 8+4+8 raw
  }
}
