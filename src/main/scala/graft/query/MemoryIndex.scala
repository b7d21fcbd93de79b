package graft.query

import graft.analysis.{Analyzer, TextAnalyzer}
import graft.codec.SmallFloat
import graft.score.Bm25

/** Single-document in-RAM index for percolation/highlighting — the
  * MemoryIndex analog (/root/reference/src/Lucene.Net.Memory/MemoryIndex.cs:159):
  * one analyzed document held as term -> positions, queried with the same
  * Query ADT. Scores use the document's own single-doc statistics
  * (maxDoc = 1, df = 1, sumTtf = field length), exactly how the reference's
  * MemoryIndex scores against itself.
  */
final class MemoryIndex(text: String, analyzer: TextAnalyzer = Analyzer) {

  private val (tp, len) = analyzer.termPositions(text)
  private val nb: Byte = SmallFloat.encodeNorm(len)
  private val cache: Array[Float] =
    Bm25.buildCache(Bm25.avgFieldLength(len.toLong, 1L))

  private def tf(t: String): Int = tp.get(t).map(_.length).getOrElse(0)

  /** Percolation: does the (single) document match the query? */
  def matches(q: Query): Boolean = q match {
    case Query.Term(t, _) => tf(t) > 0
    case Query.Bool(must, should, mustNot, mm) =>
      must.forall(tf(_) > 0) &&
        mustNot.forall(tf(_) == 0) &&
        should.count(tf(_) > 0) >= math.max(mm, if (must.isEmpty) 1 else 0)
    case Query.BoolQ(clauses, mm, _) =>
      // clauses recurse (nested groups / phrases percolate too)
      val must = clauses.collect { case (Query.Must, s) => s }
      val should = clauses.collect { case (Query.Should, s) => s }
      val not = clauses.collect { case (Query.MustNot, s) => s }
      must.forall(matches) && !not.exists(matches) &&
        should.count(matches) >= math.max(mm, if (must.isEmpty) 1 else 0)
    case p: Query.Phrase => phraseFreq(p) > 0.0f
    case other => throw new UnsupportedOperationException(s"MemoryIndex: $other")
  }

  /** BM25 score against the single-doc statistics; 0 when no match. */
  def score(q: Query): Float = q match {
    case Query.Term(t, boost) =>
      val f = tf(t)
      if (f == 0) 0.0f
      else Bm25.score(Bm25.weightValue(Bm25.idf(1L, 1L), boost), f.toFloat, cache, nb)
    case p: Query.Phrase =>
      val pf = phraseFreq(p)
      if (pf <= 0.0f) 0.0f
      else {
        var idfSum = 0.0f
        p.terms.foreach(_ => idfSum += Bm25.idf(1L, 1L))
        Bm25.score(Bm25.weightValue(idfSum, p.boost), pf, cache, nb)
      }
    case other => throw new UnsupportedOperationException(s"MemoryIndex score: $other")
  }

  private def phraseFreq(p: Query.Phrase): Float = {
    if (p.terms.exists(tf(_) == 0)) return 0.0f
    val cp = p.terms.map(t => tp(t).toArray).toArray
    if (p.slop == 0) {
      var c = 0
      cp(0).foreach { p0 =>
        if (cp.indices.drop(1).forall(i =>
          java.util.Arrays.binarySearch(cp(i), p0 + i) >= 0)) c += 1
      }
      c.toFloat
    } else {
      SloppyPhrase.freq(cp.toArray, p.slop)
    }
  }
}
