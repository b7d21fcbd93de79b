package graft.score

import graft.model.CollectionStats

/** Pluggable similarity seam — the SimWeight/SimScorer shape
  * (/root/reference/src/Lucene.Net/Search/Similarities/Similarity.cs:119-140):
  * `termScorer` binds collection + term statistics once per query term
  * (ComputeWeight), the returned closure scores each (tf, normByte) posting
  * (SimScorer.Score).
  *
  * BM25 remains the engine's default and keeps its specialized bit-exact
  * kernel ([[Bm25]]); [[Bm25Similarity]] wraps that same kernel so plugging
  * the trait changes nothing on the default path.
  */
trait Similarity extends Serializable {
  def termScorer(df: Long, ttf: Long, stats: CollectionStats, boost: Float): Similarity.TermScorer
}

object Similarity {
  trait TermScorer extends Serializable {
    def score(tf: Float, normByte: Byte): Float
  }
}

/** The default: delegates to the float32-exact [[Bm25]] kernel (identical
  * operations, so rank/score-bit-identity with the oracle is preserved).
  */
object Bm25Similarity extends Similarity {
  override def termScorer(df: Long, ttf: Long, stats: CollectionStats,
                          boost: Float): Similarity.TermScorer = {
    val w = Bm25.termWeight(0L, df, stats.max_doc, stats.sum_ttf, boost)
    (tf: Float, nb: Byte) => Bm25.score(w.weightValue, tf, w.cache, nb)
  }
}

/** Classic TF-IDF (DefaultSimilarity semantics,
  * /root/reference/src/Lucene.Net/Search/Similarities/DefaultSimilarity.cs):
  * tf = sqrt(freq), idf = log(numDocs/(df+1)) + 1,
  * fieldNorm = byte315ToSingle(normByte) (the stored 1/sqrt(length)),
  * score = idf^2 * boost * tf * fieldNorm. queryNorm is omitted — it is a
  * per-query positive constant (rank-invariant), same simplification the
  * BM25 path inherits from Similarity.QueryNorm == 1. coord is not applied
  * (BooleanQuery coord differs from BM25's constant 1; documented subset).
  */
object ClassicSimilarity extends Similarity {
  private val normTable: Array[Float] =
    Array.tabulate(256)(i => graft.codec.SmallFloat.byte315ToSingle(i.toByte))
  override def termScorer(df: Long, ttf: Long, stats: CollectionStats,
                          boost: Float): Similarity.TermScorer = {
    val idf = (math.log(stats.max_doc / (df + 1.0)) + 1.0).toFloat
    val weight = idf * idf * boost
    (tf: Float, nb: Byte) =>
      weight * math.sqrt(tf.toDouble).toFloat * normTable(nb & 0xff)
  }
}

/** Divergence-from-randomness, the I(F)L2 combination — BasicModelIF +
  * AfterEffectL + NormalizationH2
  * (/root/reference/src/Lucene.Net/Search/Similarities/DFRSimilarity.cs:121-124:
  * score = boost * basicModel(tfn) * afterEffect(tfn);
  * BasicModelIF.cs:39: tfn * log2(1 + (N+1)/(F+0.5));
  * AfterEffectL.cs:35: 1/(tfn+1);
  * NormalizationH2.cs:55: tfn = tf * log2(1 + c * avgFl / dl)).
  * Doc length decodes from the norm byte exactly as SimilarityBase does
  * (NORM_TABLE = 1/decodedNorm^2 — our [[Bm25.NormTable]]).
  */
final case class DFRSimilarity(c: Float = 1.0f) extends Similarity {
  private def log2(x: Double): Double = math.log(x) / math.log(2.0)
  override def termScorer(df: Long, ttf: Long, stats: CollectionStats,
                          boost: Float): Similarity.TermScorer = {
    val n = stats.max_doc
    val f = if (ttf > 0) ttf else df + 1 // BasicStats TotalTermFreq fallback
    val avgFl =
      if (stats.sum_ttf <= 0) 1.0f
      else (stats.sum_ttf / stats.max_doc.toDouble).toFloat
    val basic = log2(1.0 + (n + 1.0) / (f + 0.5)).toFloat
    (tf: Float, nb: Byte) => {
      val dl = Bm25.NormTable(nb & 0xff)
      val tfn = (tf * log2(1.0 + c * avgFl / dl)).toFloat
      boost * (tfn * basic) * (1.0f / (tfn + 1.0f))
    }
  }
}

/** Information-based model, the LL/DF/H2 combination — DistributionLL +
  * LambdaDF + NormalizationH2
  * (/root/reference/src/Lucene.Net/Search/Similarities/IBSimilarity.cs:113-115:
  * score = boost * distribution(tfn, lambda);
  * DistributionLL.cs: -log(lambda/(tfn+lambda));
  * LambdaDF.cs: (df+1)/(N+1)).
  */
final case class IBSimilarity(c: Float = 1.0f) extends Similarity {
  private def log2(x: Double): Double = math.log(x) / math.log(2.0)
  override def termScorer(df: Long, ttf: Long, stats: CollectionStats,
                          boost: Float): Similarity.TermScorer = {
    val lambda = (df + 1.0f) / (stats.max_doc + 1.0f)
    val avgFl =
      if (stats.sum_ttf <= 0) 1.0f
      else (stats.sum_ttf / stats.max_doc.toDouble).toFloat
    (tf: Float, nb: Byte) => {
      val dl = Bm25.NormTable(nb & 0xff)
      val tfn = (tf * log2(1.0 + c * avgFl / dl)).toFloat
      boost * (-math.log(lambda / (tfn + lambda))).toFloat
    }
  }
}

/** SweetSpotSimilarity — classic TF-IDF with a plateau length norm and a
  * baseline tf (/root/reference/src/Lucene.Net.Misc/Misc/SweetSpotSimilarity.cs:
  * lengthNorm = 1/sqrt(steepness*(|l-min|+|l-max|-(max-min))+1), defaults
  * min=max=1 steepness=0.5 (:127-148); baselineTf = 0 at freq 0, tf_base
  * below tf_min, else sqrt(freq + base^2 - min) (:179)). Divergence note:
  * the reference bakes lengthNorm into the stored norm at INDEX time; our
  * norm byte is the fixed SmallFloat315 1/sqrt(len), so the plateau is
  * applied query-time to the QUANTIZED decoded length — same curve over
  * the quantization grid, and engine == oracle exactly since both decode
  * the same byte.
  */
final case class SweetSpotSimilarity(lnMin: Int = 1, lnMax: Int = 1,
                                     steepness: Float = 0.5f,
                                     tfBase: Float = 0f, tfMin: Float = 0f)
    extends Similarity {
  override def termScorer(df: Long, ttf: Long, stats: CollectionStats,
                          boost: Float): Similarity.TermScorer = {
    val idf = (math.log(stats.max_doc / (df + 1.0)) + 1.0).toFloat
    val weight = idf * idf * boost
    (tf: Float, nb: Byte) => {
      val len = Bm25.NormTable(nb & 0xff) // quantized field length
      val baseline =
        if (tf <= 0f) 0f
        else if (tf <= tfMin) tfBase
        else math.sqrt((tf + tfBase * tfBase - tfMin).toDouble).toFloat
      val lnorm = (1.0 / math.sqrt(
        steepness * (math.abs(len - lnMin) + math.abs(len - lnMax) - (lnMax - lnMin)) + 1.0)).toFloat
      weight * baseline * lnorm
    }
  }
}

/** Jelinek-Mercer-smoothed query-likelihood language model
  * (/root/reference/src/Lucene.Net/Search/Similarities/LMJelinekMercerSimilarity.cs:
  * score = boost * log(1 + ((1-lambda) * tf/dl) / (lambda * P(w|C)));
  * reference default lambda documented 0.1 for short queries, 0.7 long).
  */
final case class LMJelinekMercerSimilarity(lambda: Float = 0.1f) extends Similarity {
  override def termScorer(df: Long, ttf: Long, stats: CollectionStats,
                          boost: Float): Similarity.TermScorer = {
    val pwc = (ttf.toDouble / math.max(stats.sum_ttf, 1L)).toFloat
    (tf: Float, nb: Byte) => {
      val dl = Bm25.NormTable(nb & 0xff)
      val s = (math.log(1.0 + ((1 - lambda) * tf / dl) / (lambda * pwc))).toFloat * boost
      if (s > 0f) s else 0f
    }
  }
}

/** Dirichlet-smoothed query-likelihood language model
  * (LMDirichletSimilarity semantics,
  * /root/reference/src/Lucene.Net/Search/Similarities/LMDirichletSimilarity.cs;
  * mu = 2000 default): score = boost * (log(1 + tf/(mu*P(w|C)))
  * + log(mu/(dl+mu))), clipped at 0, with dl decoded from the norm byte
  * (NORM_TABLE ~ quantized field length) and P(w|C) = ttf/sumTtf.
  */
final case class LMDirichletSimilarity(mu: Float = 2000f) extends Similarity {
  override def termScorer(df: Long, ttf: Long, stats: CollectionStats,
                          boost: Float): Similarity.TermScorer = {
    val pwc = (ttf.toDouble / math.max(stats.sum_ttf, 1L)).toFloat
    (tf: Float, nb: Byte) => {
      val dl = Bm25.NormTable(nb & 0xff) // quantized field length
      val s = (math.log(1.0 + tf / (mu * pwc)) + math.log(mu / (dl + mu))).toFloat * boost
      if (s > 0f) s else 0f
    }
  }
}
