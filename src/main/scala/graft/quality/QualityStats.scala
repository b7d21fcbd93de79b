package graft.quality

/** Ranked-retrieval quality metrics — AP@k / P@k / reciprocal rank over a
  * fixed relevance-judgment set (the reference's TREC quality harness:
  * /root/reference/src/Lucene.Net.Benchmark/Quality/QualityBenchmark.cs:32
  * drives queries, QualityStats.cs:44,100-137 accumulates precision-at-rank,
  * average precision and recall against qrels).
  *
  * Pure arithmetic over a ranked id list + a relevance oracle; the engine
  * side (what the qrels are, how the ranking is produced) lives with the
  * caller. Bench uses CONTAINMENT qrels — "relevant = doc contains every
  * query term", derived from the raw postings, independent of any scoring
  * code — so a ranking-affecting change moves these metrics even when the
  * fixed hash-gated queries stay green.
  */
object QualityStats {

  /** One query's quality point: average precision at the cutoff, precision
    * at the cutoff, reciprocal rank of the first relevant hit.
    */
  final case class Point(ap: Double, pAtK: Double, rr: Double)

  /** Compute AP@k / P@k / RR for one ranked list.
    *
    * AP@k normalizes by min(nRel, k) (the best achievable hit count at this
    * cutoff — trec_eval's MAP@k convention), so a perfect ranking scores
    * 1.0 regardless of how many relevant docs exist beyond the cutoff.
    * nRel == 0 yields Point(0,0,0).
    */
  def compute(ranked: Seq[Long], isRel: Long => Boolean, nRel: Long): Point = {
    if (ranked.isEmpty || nRel <= 0) return Point(0.0, 0.0, 0.0)
    var hits = 0
    var sumPrec = 0.0
    var rr = 0.0
    var i = 0
    ranked.foreach { d =>
      i += 1
      if (isRel(d)) {
        hits += 1
        sumPrec += hits.toDouble / i
        if (rr == 0.0) rr = 1.0 / i
      }
    }
    val denom = math.min(nRel, ranked.size.toLong).toDouble
    Point(sumPrec / denom, hits.toDouble / ranked.size, rr)
  }

  /** Arithmetic means over per-query points (MAP / mean P@k / MRR). */
  def mean(points: Seq[Point]): Point = {
    if (points.isEmpty) return Point(0.0, 0.0, 0.0)
    val n = points.size.toDouble
    Point(points.map(_.ap).sum / n, points.map(_.pAtK).sum / n,
      points.map(_.rr).sum / n)
  }
}
