package searchspark.gen

import java.sql.Timestamp
import java.util.SplittableRandom

import org.apache.spark.sql.{Dataset, SparkSession}

import searchspark.model.Turn

/** Deterministic synthetic transcript corpus (FIXTURES.md §2, seed=42).
  *
  * Replaces the reference's crawl frontier as the corpus source (the
  * reference crawls 11 configured sites, /root/reference/application.yml:20-43;
  * our input is a transcripts table per BASELINE.json input_hint).
  *
  * Pure function of (seed, convIdx): each conversation is generated from
  * its own `SplittableRandom(mix(seed, convIdx))` — no wall clock, no
  * shared state — so the corpus is IDENTICAL at any parallelism level
  * (this is what makes the local[8]-vs-local[32] scaling bench an
  * apples-to-apples comparison) and the distributed and local generators
  * provably agree row-for-row.
  *
  * Content knobs (all deterministic):
  *  - 10,000 content stems `w0000..w9999`, Zipf(s=1.07) draw — the
  *    build-side skew fixture (head terms hit a large share of turns);
  *  - 25 "filler" terms injected into ~90% of turns — these exceed the
  *    reference's 0.85 document-frequency prune threshold
  *    (SearchingServiceImpl.java:254) and MUST be dropped at query time;
  *  - surface inflections (-s/-ing/-ed) so the B4 lemmatizer does real
  *    work; punctuation/case/digit/1-char noise for B1/B2; English
  *    stopwords for B3;
  *  - ~1% empty/whitespace-only turns — the failed-fetch analog
  *    (Link.java:110-116): excluded from the index, counted in metrics.
  */
object TranscriptGen {

  val DefaultSeed = 42L

  /** Content fingerprint of the generator itself: an MD5 over a small
    * deterministic sample, so any change to generation logic changes
    * the value automatically (no manual version constant to forget).
    * Benches key persisted-corpus cache paths by (seed, size, THIS) —
    * a stale on-disk corpus from an older generator is then a cache
    * miss, not a silently-wrong bench input (round-4 ADVICE). */
  lazy val GenFingerprint: String = {
    val sample = localCorpus(DefaultSeed, 3)
      .map(t => s"${t.conv_id}${t.turn_idx}${t.role}${t.text}${t.tool}${t.ts}")
      .mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sample.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map("%02x".format(_)).mkString
  }

  /** 25 corpus-stopword-tier terms (df ≈ 0.9 > 0.85 threshold). */
  val FillerTerms: IndexedSeq[String] = (0 until 25).map(i => f"filler$i%02d")

  val VocabSize = 10000
  private val ZipfS = 1.07

  /** Zipf(s=1.07) cumulative distribution over stems w0000..w9999. */
  private lazy val zipfCdf: Array[Double] = {
    val w = Array.tabulate(VocabSize)(i => 1.0 / math.pow(i + 1.0, ZipfS))
    val total = w.sum
    val cdf = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(VocabSize - 1) = 1.0
    cdf
  }

  def stem(rank: Int): String = f"w$rank%04d"

  private def drawStem(r: SplittableRandom): String = {
    val u = r.nextDouble()
    var lo = 0; var hi = VocabSize - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCdf(mid) < u) lo = mid + 1 else hi = mid
    }
    stem(lo)
  }

  private val Inflections = Array("", "s", "ing", "ed")
  private val Punct = Array(",", ".", "!", "?", ":")
  private val NoiseStops = Array("the", "of", "and", "to", "in", "a", "for")
  private val Tools = Array("bash", "search", "browser", "editor")

  /** SplitMix-style seed mix so conversations are independent streams. */
  private def mix(seed: Long, convIdx: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L * (convIdx + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def convId(convIdx: Long): String = f"conv-$convIdx%06d"

  /** One conversation — the pure generator kernel. */
  def conversation(seed: Long, convIdx: Long): Seq[Turn] = {
    val r = new SplittableRandom(mix(seed, convIdx))
    val nTurns = 2 + r.nextInt(49) // 2..50
    val cid = convId(convIdx)
    val baseTs = 1700000000000L + convIdx * 3600000L
    (0 until nTurns).map { turnIdx =>
      val isTool = r.nextDouble() < 0.10
      val role =
        if (isTool) "tool"
        else if (turnIdx % 2 == 0) "user"
        else "assistant"
      val tool = if (isTool) Tools(r.nextInt(Tools.length)) else null
      val text =
        if (r.nextDouble() < 0.01) { // empty/whitespace analog of a failed fetch
          if (r.nextBoolean()) "" else "   "
        } else genText(r)
      Turn(cid, turnIdx, role, text, tool,
        new Timestamp(baseTs + turnIdx * 60000L + r.nextInt(30000)))
    }
  }

  /** Turn body: log-normal length 5..300 content tokens + filler terms +
    * noise, shuffled deterministically. */
  private def genText(r: SplittableRandom): String = {
    val len = math.min(300, math.max(5,
      math.round(math.exp(3.0 + 0.8 * r.nextGaussian())).toInt))
    val sb = new StringBuilder
    var i = 0
    while (i < len) {
      val u = r.nextDouble()
      val word =
        if (u < 0.06) NoiseStops(r.nextInt(NoiseStops.length)) // B3 fodder
        else if (u < 0.08) String.valueOf(('b' + r.nextInt(20)).toChar) // 1-char, B2-dropped
        else if (u < 0.09) "i" // 1-char keep-list survivor ("я" analog)
        else if (u < 0.11) String.valueOf(100 + r.nextInt(900)) // digit token
        else {
          val s = drawStem(r)
          s + Inflections(r.nextInt(Inflections.length))
        }
      val cased =
        if (r.nextDouble() < 0.08 && word.nonEmpty)
          word.substring(0, 1).toUpperCase(java.util.Locale.ROOT) + word.substring(1)
        else word
      sb.append(cased)
      if (r.nextDouble() < 0.15) sb.append(Punct(r.nextInt(Punct.length)))
      sb.append(' ')
      i += 1
    }
    // filler (stopword-tier) terms: each present with p=0.9 → df ≈ 0.9N
    FillerTerms.foreach { f =>
      if (r.nextDouble() < 0.9) { sb.append(f); sb.append(' ') }
    }
    sb.toString.trim
  }

  /** Local corpus for unit tests / the scalar oracle. */
  def localCorpus(seed: Long, numConvs: Int): Seq[Turn] =
    (0L until numConvs.toLong).flatMap(conversation(seed, _))

  /** Distributed corpus. Content depends only on (seed, convIdx), so any
    * `partitions` value yields the same rows. */
  def corpus(spark: SparkSession, seed: Long, numConvs: Long,
             partitions: Int): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0L, numConvs, 1L, partitions)
      .flatMap(idx => conversation(seed, idx))
  }

  /** Fixture tiers (FIXTURES.md §2). */
  val UnitConvs = 20
  val TestConvs = 500
  val BenchConvs = 20000
}
