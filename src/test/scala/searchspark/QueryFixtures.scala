package searchspark

import searchspark.gen.TranscriptGen
import searchspark.model.Turn
import searchspark.oracle.ScalarOracle

/** The reference query set (FIXTURES.md §3), derived deterministically
  * from the corpus so each case hits its semantic branch regardless of
  * generator tweaks. One case per branch of the reference search flow
  * (SearchingServiceImpl.java:47-67). */
final case class QueryCase(
    id: String,
    query: String,
    scope: Option[String] = None,
    offset: Int = 0,
    limit: Int = 20)

object QueryFixtures {

  def corpus(convs: Int): Seq[Turn] = TranscriptGen.localCorpus(TranscriptGen.DefaultSeed, convs)

  /** Derive q01..q12 from an oracle over the corpus. */
  def deriveQueries(o: ScalarOracle): Seq[QueryCase] = {
    val n = o.docCount
    val vocab = o.vocabulary
    def dfOf(t: String) = o.df(t)

    // content stems only (exclude fillers/digits/noise), by df bands
    val stems = vocab.filter(_.matches("w\\d{4}"))
    val midDf = stems.filter(t => dfOf(t) >= n / 20 && dfOf(t) <= n / 3)
    val rare = stems.filter(t => dfOf(t) >= 2 && dfOf(t) <= math.max(3, n / 25))
    val q01term = midDf.head

    // two rare terms that co-occur in at least one doc
    val rareCooc: (String, String) = {
      val pairs = for {
        a <- rare.iterator
        b <- rare.iterator if b > a
        if o.postingDocs(a).toSet.intersect(o.postingDocs(b).toSet).nonEmpty
      } yield (a, b)
      pairs.next()
    }
    // two rare terms that never co-occur
    val rareDisjoint: (String, String) = {
      val pairs = for {
        a <- rare.iterator
        b <- rare.iterator if b > a
        if o.postingDocs(a).toSet.intersect(o.postingDocs(b).toSet).isEmpty
      } yield (a, b)
      pairs.next()
    }
    val filler = TranscriptGen.FillerTerms.head // df ≈ 0.9N → pruned
    val top5 = stems.sortBy(t => -dfOf(t)).take(5)

    Seq(
      QueryCase("q01", q01term),
      QueryCase("q02", s"${rareCooc._1} ${rareCooc._2}"),
      QueryCase("q03", s"${rareDisjoint._1} ${rareDisjoint._2}"),
      QueryCase("q04", s"${rare.head} $filler"),
      QueryCase("q05", s"$q01term qzzqxjv"),
      QueryCase("q06", TranscriptGen.FillerTerms.take(3).mkString(" ")),
      QueryCase("q07", "   "),
      QueryCase("q08", s"${q01term}s ${q01term}ing"), // inflections of one stem
      QueryCase("q09", q01term, scope = Some("assistant")),
      QueryCase("q10a", top5.head, offset = 20, limit = 20),
      QueryCase("q10b", top5.head, offset = 40, limit = 20),
      QueryCase("q11", top5.mkString(" ")),
      QueryCase("q12", filler + " " + q01term) // pruned + scored path again
    )
  }
}
