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

private object DfrMath {
  @inline def log2(x: Double): Double = math.log(x) / math.log(2.0)
  val Log2E: Double = log2(math.E)
  def avgFieldLength(stats: CollectionStats): Float =
    if (stats.sum_ttf <= 0) 1.0f
    else (stats.sum_ttf / stats.max_doc.toDouble).toFloat
}

/** Term-frequency normalizations (the DFR/IB "second normalisation";
  * /root/reference/src/Lucene.Net/Search/Similarities/Normalization.cs).
  * `tfn` maps a raw posting tf and the norm-decoded doc length to the
  * normalized frequency; collection stats bind per term. H1's `c` is carried
  * but unused in Tfn — reference 4.8 behavior (NormalizationH1.cs:62:
  * tf * avgFl / len, the hyper-parameter only surfaces in ToString).
  */
sealed trait DfrNormalization extends Serializable {
  def tfn(tf: Float, dl: Float, avgFl: Float, ttf: Long, sumTtf: Long): Float
}
object DfrNormalization {
  import DfrMath.log2
  /** Normalization.NoNormalization (Normalization.cs:105): tfn = tf. */
  case object None extends DfrNormalization {
    def tfn(tf: Float, dl: Float, avgFl: Float, ttf: Long, sumTtf: Long): Float = tf
  }
  /** NormalizationH1.cs:62: tf * avgFl / dl (uniform density). */
  final case class H1(c: Float = 1.0f) extends DfrNormalization {
    def tfn(tf: Float, dl: Float, avgFl: Float, ttf: Long, sumTtf: Long): Float =
      tf * avgFl / dl
  }
  /** NormalizationH2.cs:55: tf * log2(1 + c * avgFl / dl). */
  final case class H2(c: Float = 1.0f) extends DfrNormalization {
    def tfn(tf: Float, dl: Float, avgFl: Float, ttf: Long, sumTtf: Long): Float =
      (tf * log2(1.0 + c * avgFl / dl)).toFloat
  }
  /** NormalizationH3.cs:58 (Dirichlet-prior smoothing, mu=800 default):
    * (tf + mu*((ttf+1)/(sumTtf+1))) / (dl + mu) * mu.
    */
  final case class H3(mu: Float = 800f) extends DfrNormalization {
    def tfn(tf: Float, dl: Float, avgFl: Float, ttf: Long, sumTtf: Long): Float =
      (tf + mu * ((ttf + 1f) / (sumTtf + 1f))) / (dl + mu) * mu
  }
  /** NormalizationZ.cs:54 (Pareto-Zipf, z=0.30 default): tf * (avgFl/dl)^z. */
  final case class Z(z: Float = 0.30f) extends DfrNormalization {
    def tfn(tf: Float, dl: Float, avgFl: Float, ttf: Long, sumTtf: Long): Float =
      (tf * math.pow(avgFl / dl, z)).toFloat
  }
}

/** DFR basic models — information content of tfn occurrences under a
  * randomness model (/root/reference/src/Lucene.Net/Search/Similarities/
  * BasicModel*.cs). `bind` precomputes the per-term constants; the returned
  * closure is the per-posting hot path.
  */
sealed trait DfrBasicModel extends Serializable {
  /** n = numberOfDocuments, df = docFreq, f = totalTermFreq (fallback applied). */
  def bind(n: Long, df: Long, f: Long): Float => Float
}
object DfrBasicModel {
  import DfrMath.{log2, Log2E}
  /** BasicModelIF.cs:43: tfn * log2(1 + (N+1)/(F+0.5)). */
  case object IF extends DfrBasicModel {
    def bind(n: Long, df: Long, f: Long): Float => Float = {
      val k = log2(1 + (n + 1) / (f + 0.5)).toFloat
      tfn => tfn * k
    }
  }
  /** BasicModelIn.cs:42: tfn * log2((N+1)/(df+0.5)). */
  case object In extends DfrBasicModel {
    def bind(n: Long, df: Long, f: Long): Float => Float = {
      val k = log2((n + 1) / (df + 0.5)).toFloat
      tfn => tfn * k
    }
  }
  /** BasicModelIne.cs:42: ne = N*(1-((N-1)/N)^F); tfn * log2((N+1)/(ne+0.5)). */
  case object Ine extends DfrBasicModel {
    def bind(n: Long, df: Long, f: Long): Float => Float = {
      val ne = n * (1 - math.pow((n - 1) / n.toDouble, f.toDouble))
      val k = log2((n + 1) / (ne + 0.5)).toFloat
      tfn => tfn * k
    }
  }
  /** BasicModelG.cs:46 (geometric approximation of Bose-Einstein):
    * lambda = F'/(N+F'), F' = F+1; log2(lambda+1) + tfn*log2((1+lambda)/lambda).
    */
  case object G extends DfrBasicModel {
    def bind(n: Long, df: Long, f: Long): Float => Float = {
      val fp = (f + 1).toDouble
      val lambda = fp / (n + fp)
      val c0 = log2(lambda + 1)
      val k = log2((1 + lambda) / lambda)
      tfn => (c0 + tfn * k).toFloat
    }
  }
  /** BasicModelP.cs:47 (Poisson via Stirling): lambda = (F+1)/(N+1);
    * tfn*log2(tfn/lambda) + (lambda + 1/(12 tfn) - tfn)*log2(e)
    * + 0.5*log2(2 pi tfn).
    */
  case object P extends DfrBasicModel {
    def bind(n: Long, df: Long, f: Long): Float => Float = {
      val lambda = (f + 1).toFloat / (n + 1)
      tfn => (tfn * log2(tfn / lambda) +
        (lambda + 1 / (12 * tfn) - tfn) * Log2E +
        0.5 * log2(2 * math.Pi * tfn)).toFloat
    }
  }
  /** BasicModelD.cs:51 (divergence approximation of the binomial):
    * F = ttf+1+tfn; phi = tfn/F; p = 1/(N+1);
    * D = phi*log2(phi/p) + (1-phi)*log2((1-phi)/(1-p));
    * D*F + 0.5*log2(1 + 2 pi tfn (1-phi)).
    */
  case object D extends DfrBasicModel {
    def bind(n: Long, df: Long, f: Long): Float => Float = { tfn =>
      val bigF = f + 1 + tfn.toDouble
      val phi = tfn / bigF
      val nphi = 1 - phi
      val p = 1.0 / (n + 1)
      val dd = phi * log2(phi / p) + nphi * log2(nphi / (1 - p))
      (dd * bigF + 0.5 * log2(1 + 2 * math.Pi * tfn * nphi)).toFloat
    }
  }
  /** BasicModelBE.cs:50 (Bose-Einstein, Stirling-approximated):
    * F = ttf+1+tfn; N' = F+N; -log2((N'-1)e) + f(N'+F-1, N'+F-tfn-2)
    * - f(F, F-tfn), with f(n,m) = (m+0.5)*log2(n/m) + (n-m)*log2(n).
    */
  case object BE extends DfrBasicModel {
    private def fF(n: Double, m: Double): Double =
      (m + 0.5) * log2(n / m) + (n - m) * log2(n)
    def bind(n: Long, df: Long, f: Long): Float => Float = { tfn =>
      val bigF = f + 1 + tfn.toDouble
      val bigN = bigF + n
      (-log2((bigN - 1) * math.E) +
        fF(bigN + bigF - 1, bigN + bigF - tfn - 2) -
        fF(bigF, bigF - tfn)).toFloat
    }
  }
}

/** DFR first normalisation (information-gain after-effect;
  * /root/reference/src/Lucene.Net/Search/Similarities/AfterEffect.cs).
  */
sealed trait DfrAfterEffect extends Serializable {
  def bind(df: Long, f: Long): Float => Float
}
object DfrAfterEffect {
  /** AfterEffect.NoAfterEffect (AfterEffect.cs:59): gain = 1. */
  case object None extends DfrAfterEffect {
    def bind(df: Long, f: Long): Float => Float = _ => 1f
  }
  /** AfterEffectL.cs:36 (Laplace law of succession): 1/(tfn+1). */
  case object L extends DfrAfterEffect {
    def bind(df: Long, f: Long): Float => Float = tfn => 1 / (tfn + 1)
  }
  /** AfterEffectB.cs:39 (Bernoulli): (F'+1)/(n'*(tfn+1)), F' = ttf+1,
    * n' = df+1.
    */
  case object B extends DfrAfterEffect {
    def bind(df: Long, f: Long): Float => Float = {
      val fp = f + 1L
      val np = df + 1L
      tfn => (fp + 1) / (np * (tfn + 1))
    }
  }
}

/** Divergence-from-randomness, the full model matrix — 7 basic models x
  * 3 after-effects x 5 normalizations
  * (/root/reference/src/Lucene.Net/Search/Similarities/DFRSimilarity.cs:121-124:
  * score = boost * basicModel(tfn) * afterEffect(tfn)). Default is the
  * engine's historical I(F)L2 combination. Doc length decodes from the norm
  * byte exactly as SimilarityBase does (NORM_TABLE = 1/decodedNorm^2 — our
  * [[Bm25.NormTable]]).
  */
final case class DFRSimilarity(
    basicModel: DfrBasicModel = DfrBasicModel.IF,
    afterEffect: DfrAfterEffect = DfrAfterEffect.L,
    normalization: DfrNormalization = DfrNormalization.H2()) extends Similarity {
  override def termScorer(df: Long, ttf: Long, stats: CollectionStats,
                          boost: Float): Similarity.TermScorer = {
    val f = if (ttf > 0) ttf else df + 1 // BasicStats TotalTermFreq fallback
    val avgFl = DfrMath.avgFieldLength(stats)
    val model = basicModel.bind(stats.max_doc, df, f)
    val gain = afterEffect.bind(df, f)
    val sumTtf = stats.sum_ttf
    (tf: Float, nb: Byte) => {
      val dl = Bm25.NormTable(nb & 0xff)
      val tfn = normalization.tfn(tf, dl, avgFl, f, sumTtf)
      boost * model(tfn) * gain(tfn)
    }
  }
}

/** IB distributions (/root/reference/src/Lucene.Net/Search/Similarities/
  * Distribution.cs): score of tfn under the term's burstiness lambda.
  */
sealed trait IbDistribution extends Serializable {
  def score(tfn: Float, lambda: Float): Float
}
object IbDistribution {
  /** DistributionLL.cs:35 (log-logistic): -log(lambda/(tfn+lambda)). */
  case object LL extends IbDistribution {
    def score(tfn: Float, lambda: Float): Float =
      (-math.log(lambda / (tfn + lambda))).toFloat
  }
  /** DistributionSPL.cs:38 (smoothed power-law; lambda==1 clamps to 0.99):
    * -log((lambda^(tfn/(tfn+1)) - lambda)/(1-lambda)).
    */
  case object SPL extends IbDistribution {
    def score(tfn: Float, lambda0: Float): Float = {
      val lambda = if (lambda0 == 1f) 0.99f else lambda0
      (-math.log(
        (math.pow(lambda.toDouble, tfn / (tfn + 1.0)) - lambda) / (1 - lambda))).toFloat
    }
  }
}

/** IB lambda (burstiness) estimators (Lambda.cs). */
sealed trait IbLambda extends Serializable {
  def lambda(n: Long, df: Long, ttf: Long): Float
}
object IbLambda {
  /** LambdaDF.cs:35: (df+1)/(N+1). */
  case object DF extends IbLambda {
    def lambda(n: Long, df: Long, ttf: Long): Float = (df + 1f) / (n + 1f)
  }
  /** LambdaTTF.cs:35: (F+1)/(N+1). */
  case object TTF extends IbLambda {
    def lambda(n: Long, df: Long, ttf: Long): Float = (ttf + 1f) / (n + 1f)
  }
}

/** Information-based model matrix — 2 distributions x 2 lambdas x 5
  * normalizations (/root/reference/src/Lucene.Net/Search/Similarities/
  * IBSimilarity.cs:113-115: score = boost * distribution(tfn, lambda)).
  * Default is the engine's historical LL/DF/H2 combination.
  */
final case class IBSimilarity(
    distribution: IbDistribution = IbDistribution.LL,
    lambdaModel: IbLambda = IbLambda.DF,
    normalization: DfrNormalization = DfrNormalization.H2()) extends Similarity {
  override def termScorer(df: Long, ttf: Long, stats: CollectionStats,
                          boost: Float): Similarity.TermScorer = {
    val f = if (ttf > 0) ttf else df + 1
    val lambda = lambdaModel.lambda(stats.max_doc, df, f)
    val avgFl = DfrMath.avgFieldLength(stats)
    val sumTtf = stats.sum_ttf
    (tf: Float, nb: Byte) => {
      val dl = Bm25.NormTable(nb & 0xff)
      val tfn = normalization.tfn(tf, dl, avgFl, f, sumTtf)
      boost * distribution.score(tfn, lambda)
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

/** Sum-combined similarity (MultiSimilarity,
  * /root/reference/src/Lucene.Net/Search/Similarities/MultiSimilarity.cs:38,
  * MultiSimScorer.Score sums the sub-scorers): each wrapped Similarity binds
  * its own per-term weight once, every posting scores through all of them
  * and the float sums fold left-to-right in constructor order.
  */
final case class MultiSimilarity(sims: Seq[Similarity]) extends Similarity {
  require(sims.nonEmpty, "MultiSimilarity needs at least one sub-similarity")
  override def termScorer(df: Long, ttf: Long, stats: CollectionStats,
                          boost: Float): Similarity.TermScorer = {
    val subs: Array[Similarity.TermScorer] =
      sims.map(_.termScorer(df, ttf, stats, boost)).toArray
    (tf: Float, nb: Byte) => {
      var s = 0.0f
      var i = 0
      while (i < subs.length) { s += subs(i).score(tf, nb); i += 1 }
      s
    }
  }
}

/** Per-field similarity routing (PerFieldSimilarityWrapper,
  * /root/reference/src/Lucene.Net/Search/Similarities/PerFieldSimilarityWrapper.cs:31,63):
  * `get(field)` picks the Similarity whose scorer serves that field's
  * postings. The engine indexes one text field today, so the trait's
  * single-field entry point routes through [[defaultField]]; a multi-field
  * index resolves `forField` per queried field at weight-bind time.
  */
abstract class PerFieldSimilarityWrapper extends Similarity {
  def get(field: String): Similarity
  def defaultField: String = "text"
  final def forField(field: String, df: Long, ttf: Long, stats: CollectionStats,
                     boost: Float): Similarity.TermScorer =
    get(field).termScorer(df, ttf, stats, boost)
  final override def termScorer(df: Long, ttf: Long, stats: CollectionStats,
                                boost: Float): Similarity.TermScorer =
    forField(defaultField, df, ttf, stats, boost)
}
