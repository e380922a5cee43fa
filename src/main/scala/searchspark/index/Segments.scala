package searchspark.index

import java.io.ByteArrayOutputStream

import searchspark.model.PostingBlock
import searchspark.query.Scoring

/** Posting-block codec: docID-delta + varint encoding with per-block
  * max-score metadata (the at-rest replacement for the reference's
  * row-per-posting `index` table,
  * /root/reference/src/main/java/searchengine/model/IndexEntity.java:5-23).
  *
  * Layout per term (within one doc-range shard): postings sorted by
  * docId, cut into blocks of [[BlockSize]]; per block
  *  - docs: varint(docId_0 − firstDocBase), varint(delta_1), …
  *  - tfs:  varint(tf_i)
  *  - maxScore: max BM25 partial of this term over the block's docs
  *    (block-max WAND bound, computed at build when df/N/avgdl/dl are
  *    known).
  *
  * Pure Scala, no Catalyst involvement (SURVEY.md §7.6): executed inside
  * `mapGroups` at build and decoded inside `mapPartitions` at query.
  * Round-trip identity is property-tested (CodecSpec, scalacheck).
  */
object Segments {

  val BlockSize = 128

  // --- varint (LEB128, unsigned) ---------------------------------------

  def writeVarLong(out: ByteArrayOutputStream, v0: Long): Unit = {
    require(v0 >= 0, s"varint requires non-negative, got $v0")
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Decode one varint starting at `pos`; returns (value, nextPos). */
  def readVarLong(buf: Array[Byte], pos: Int): (Long, Int) = {
    var p = pos
    var shift = 0
    var v = 0L
    var b = 0
    do {
      b = buf(p) & 0xff
      v |= (b & 0x7fL) << shift
      shift += 7
      p += 1
    } while ((b & 0x80) != 0)
    (v, p)
  }

  // --- block encode/decode ---------------------------------------------

  /** Encode one term's postings (docIds ASC, same length tfs/dls).
    * `dls` are the doc lengths (for block-max partials); `idfT` the
    * term's idf under the stats the index is built with. */
  def encode(docIds: Array[Long], tfs: Array[Int], dls: Array[Long],
             idfT: Double, avgdl: Double): Array[PostingBlock] = {
    require(docIds.length == tfs.length && tfs.length == dls.length)
    val blocks = Vector.newBuilder[PostingBlock]
    var i = 0
    while (i < docIds.length) {
      val end = math.min(i + BlockSize, docIds.length)
      val docsOut = new ByteArrayOutputStream()
      val tfsOut = new ByteArrayOutputStream()
      val dlsOut = new ByteArrayOutputStream()
      var prev = docIds(i)
      writeVarLong(docsOut, 0L) // first doc stored as delta from itself
      writeVarLong(tfsOut, tfs(i).toLong)
      writeVarLong(dlsOut, dls(i))
      var maxScore = Scoring.partial(idfT, tfs(i).toLong, dls(i), avgdl)
      var j = i + 1
      while (j < end) {
        writeVarLong(docsOut, docIds(j) - prev)
        writeVarLong(tfsOut, tfs(j).toLong)
        writeVarLong(dlsOut, dls(j))
        val p = Scoring.partial(idfT, tfs(j).toLong, dls(j), avgdl)
        if (p > maxScore) maxScore = p
        prev = docIds(j)
        j += 1
      }
      blocks += PostingBlock(docIds(i), docIds(end - 1), end - i, maxScore,
        docsOut.toByteArray, tfsOut.toByteArray, dlsOut.toByteArray)
      i = end
    }
    blocks.result().toArray
  }

  /** Decode one block to (docIds, tfs, dls). */
  def decodeBlock(b: PostingBlock): (Array[Long], Array[Int], Array[Long]) = {
    val docs = new Array[Long](b.count)
    val tfs = new Array[Int](b.count)
    val dls = new Array[Long](b.count)
    var pd = 0
    var pt = 0
    var pl = 0
    var prev = b.firstDoc
    var i = 0
    while (i < b.count) {
      val (delta, npd) = readVarLong(b.docs, pd)
      pd = npd
      prev += delta
      docs(i) = prev
      val (tf, npt) = readVarLong(b.tfs, pt)
      pt = npt
      tfs(i) = tf.toInt
      val (dl, npl) = readVarLong(b.dls, pl)
      pl = npl
      dls(i) = dl
      i += 1
    }
    (docs, tfs, dls)
  }

  /** Decode a whole posting list. */
  def decodeAll(blocks: Array[PostingBlock]): (Array[Long], Array[Int], Array[Long]) = {
    val n = blocks.map(_.count).sum
    val docs = new Array[Long](n)
    val tfs = new Array[Int](n)
    val dls = new Array[Long](n)
    var off = 0
    blocks.foreach { b =>
      val (d, t, l) = decodeBlock(b)
      System.arraycopy(d, 0, docs, off, d.length)
      System.arraycopy(t, 0, tfs, off, t.length)
      System.arraycopy(l, 0, dls, off, l.length)
      off += d.length
    }
    (docs, tfs, dls)
  }
}
