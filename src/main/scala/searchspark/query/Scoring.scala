package searchspark.query

/** The scoring contract (SURVEY.md §7.4) — single source of truth for
  * the scalar oracle, the DataFrame parity path, the block-max WAND
  * engine, and the block maxScore metadata written at build time.
  *
  * BM25 with fixed k1=1.2, b=0.75:
  *   score(d, q) = Σ_{t ∈ q'} idf(t) · tf / (tf + k1·(1 − b + b·dl/avgdl))
  *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
  *
  * where q' = query terms surviving the reference pipeline semantics:
  * analyzer B1–B4 → unknown terms silently dropped (SURVEY.md §2.3 Q1
  * corner) → terms with df/N ≥ 0.85 pruned
  * (/root/reference/src/main/java/searchengine/services/SearchingServiceImpl.java:254)
  * → CONJUNCTIVE candidate set (`:181-213`).
  *
  * Determinism rules: Double arithmetic; per-term partials accumulated in
  * ascending term order; no parallel reduction of score terms. Tie-break
  * (score DESC, docId ASC) — the reference leaves ties undefined (MySQL
  * ORDER BY), this is our documented deterministic deviation.
  */
object Scoring {

  val K1 = 1.2
  val B = 0.75

  /** Query-time stopword prune threshold (SearchingServiceImpl.java:254). */
  val PruneThreshold = 0.85

  /** The 0.85 prune in exact integer arithmetic (df·100 < 85·N), the
    * same form as the oracle SQL's `df * 100 < 85 * n` — a double
    * division could disagree with it exactly at the threshold. Single
    * source of truth for the oracle, parity, and WAND paths. */
  def survivesPrune(df: Long, n: Long): Boolean = df * 100 < 85 * n

  def idf(df: Long, n: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  /** One term's BM25 partial for a (tf, dl) pair. */
  def partial(idfT: Double, tf: Long, dl: Long, avgdl: Double): Double =
    idfT * tf / (tf + K1 * (1.0 - B + B * dl / avgdl))

  /** Upper bound of a term's partial over any doc with dl ≥ minDl: the
    * partial is increasing in tf and decreasing in dl, so the bound over
    * a concrete set of (tf, dl) pairs is just the max of their partials.
    * Used for per-block maxScore at build time. */
  def blockMax(idfT: Double, tfs: Array[Int], dls: Array[Long], avgdl: Double): Double = {
    var m = 0.0
    var i = 0
    while (i < tfs.length) {
      val p = partial(idfT, tfs(i).toLong, dls(i), avgdl)
      if (p > m) m = p
      i += 1
    }
    m
  }
}
