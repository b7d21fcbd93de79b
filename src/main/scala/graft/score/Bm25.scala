package graft.score

import graft.codec.SmallFloat

/** Exact float32 BM25 scoring kernel (k1 = 1.2, b = 0.75).
  *
  * Every float cast point follows the published BM25 formula semantics of
  * Lucene 4.8's BM25Similarity
  * (/root/reference/src/Lucene.Net/Search/Similarities/BM25Similarity.cs:67-70,
  * 91-102,143-154,226-264): idf in double math with one float cast, avgdl as
  * (float)(sumTtf / (double)maxDoc), the 256-entry decoded-norm table, the
  * per-norm cache, and score = weightValue * tf / (tf + cache[norm]).
  *
  * This single kernel is shared by the brute-force oracle, the exhaustive
  * DataFrame path and the block-max pruned path, so scores are bit-identical
  * across all three by construction (SURVEY.md §7.4 item 1).
  */
object Bm25 extends Serializable {
  final val K1: Float = 1.2f
  final val B: Float = 0.75f

  /** NORM_TABLE[b] = 1f / (f * f) with f = byte315ToSingle(b). Index 0 is +Inf. */
  val NormTable: Array[Float] = Array.tabulate(256) { i =>
    val f = SmallFloat.byte315ToSingle(i.toByte)
    1.0f / (f * f)
  }

  /** idf = (float) ln(1 + (maxDoc - df + 0.5) / (df + 0.5)); double math, one cast. */
  def idf(df: Long, maxDoc: Long): Float =
    math.log(1.0 + (maxDoc - df + 0.5d) / (df + 0.5d)).toFloat

  /** avgdl = (float)(sumTotalTermFreq / (double) maxDoc); 1f when sumTtf <= 0. */
  def avgFieldLength(sumTtf: Long, maxDoc: Long): Float =
    if (sumTtf <= 0) 1.0f else (sumTtf / maxDoc.toDouble).toFloat

  /** Per-term, per-norm-byte cache: cache(i) = k1 * ((1-b) + b * NormTable(i) / avgdl).
    * All operations in float32, left-to-right as written.
    */
  def buildCache(avgdl: Float): Array[Float] = {
    val cache = new Array[Float](256)
    var i = 0
    while (i < 256) {
      cache(i) = K1 * ((1 - B) + B * NormTable(i) / avgdl)
      i += 1
    }
    cache
  }

  /** weightValue = idf * boost * (k1 + 1), float32, in this order (boost = 1 default). */
  def weightValue(idf: Float, boost: Float = 1.0f): Float = idf * boost * (K1 + 1)

  /** score = weightValue * tf / (tf + cache[normByte & 0xFF]) — float32,
    * multiplication before division (Java left-to-right evaluation).
    */
  def score(weightValue: Float, tf: Float, cache: Array[Float], normByte: Byte): Float =
    weightValue * tf / (tf + cache(normByte & 0xff))

  /** Precomputed per-term weight: everything a scorer needs for one term. */
  final case class TermWeight(termId: Long, weightValue: Float, cache: Array[Float])
    extends Serializable

  def termWeight(termId: Long, df: Long, maxDoc: Long, sumTtf: Long,
                 boost: Float = 1.0f): TermWeight = {
    val avgdl = avgFieldLength(sumTtf, maxDoc)
    TermWeight(termId, weightValue(idf(df, maxDoc), boost), buildCache(avgdl))
  }

  /** Canonical multi-clause sum: float32 accumulation in ascending term_id order
    * (documented contract, SURVEY.md §2.4 item 7). `scores` must already be
    * sorted by term_id ascending.
    */
  def sumClauses(scores: Array[Float]): Float = {
    var acc = 0.0f
    var i = 0
    while (i < scores.length) { acc += scores(i); i += 1 }
    acc
  }
}
