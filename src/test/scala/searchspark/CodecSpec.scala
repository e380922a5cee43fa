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

  private def randomPostings(r: Random)
    : (Array[Long], Array[Int], Array[Long], Array[Int]) = {
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
    (docIds, Array.fill(n)(10 * (1 + r.nextInt(500))),
      Array.fill(n)(10L + 10L * r.nextInt(3000)), Array.fill(n)(r.nextInt(5)))
  }

  test("encode→decode == identity for arbitrary sorted posting lists") {
    val r = new Random(42)
    (1 to 200).foreach { _ =>
      val (docIds, tfs, dls, roles) = randomPostings(r)
      val blocks = Segments.encode(docIds, tfs, dls, roles)
      val (d2, t2, l2, r2) = Segments.decodeAll(blocks)
      assert(d2.toSeq == docIds.toSeq)
      assert(t2.toSeq == tfs.toSeq)
      assert(l2.toSeq == dls.toSeq)
      assert(r2.toSeq == roles.toSeq)
      assert(blocks.forall(_.count <= Segments.BlockSize))
      assert(blocks.map(_.count).sum == docIds.length)
      blocks.foreach { b =>
        val (bd, _, _, _) = Segments.decodeBlock(b)
        assert(b.firstDoc == bd.head && b.lastDoc == bd.last)
      }
    }
  }

  test("block (maxTfE1, minDl) bound >= every exact partial, under ANY stats") {
    val r = new Random(7)
    (1 to 100).foreach { _ =>
      val (docIds, tfs, dls, roles) = randomPostings(r)
      val blocks = Segments.encode(docIds, tfs, dls, roles)
      var off = 0
      blocks.foreach { b =>
        assert(b.maxTfE1 == (off until off + b.count).map(tfs(_)).max)
        assert(b.minDl == (off until off + b.count).map(dls(_)).min)
        // the query-time bound dominates exact partials for arbitrary
        // current stats (the incremental/scoped soundness property)
        Seq((1.3, 470.0), (0.2, 51.0), (4.0, 12345.0)).foreach { case (idfT, avgdl) =>
          val bound = Scoring.blockBound(idfT, b.maxTfE1, b.minDl, avgdl)
          (off until off + b.count).foreach { i =>
            assert(Scoring.partialE1(idfT, tfs(i).toLong, dls(i), avgdl) <= bound)
          }
        }
        off += b.count
      }
    }
  }

  test("compression is effective on dense lists") {
    val docIds = Array.tabulate(10000)(i => 1000L + i)
    val tfs = Array.fill(10000)(30)
    val dls = Array.fill(10000)(1000L)
    val blocks = Segments.encode(docIds, tfs, dls, Array.fill(10000)(1))
    val bytes = blocks.map(b => b.docs.length + b.tfs.length + b.dls.length + b.roles.length).sum
    // docs delta 1B + tfE1 1B + dlE1 2B + role 1B = 5 B/posting vs 24 raw
    assert(bytes <= 10000 * 5)
  }
}
