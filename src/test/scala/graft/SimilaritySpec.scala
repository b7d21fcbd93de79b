package graft

import graft.build.IndexBuilder
import graft.codec.SmallFloat
import graft.fixtures.Transcripts
import graft.model.CollectionStats
import graft.oracle.BruteForce
import graft.query.{Query, Searcher}
import graft.score.{Bm25, Bm25Similarity, ClassicSimilarity, DFRSimilarity,
  DfrAfterEffect, DfrBasicModel, DfrNormalization, IBSimilarity,
  IbDistribution, IbLambda, LMDirichletSimilarity, LMJelinekMercerSimilarity,
  SweetSpotSimilarity}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The pluggable Similarity seam: closed-form checks per model and
  * distributed-vs-oracle identity for each similarity on a real index.
  */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val stats = CollectionStats(100L, 100L, 1000L, 500L)

  test("Bm25Similarity delegates to the exact kernel bit-for-bit") {
    val s = Bm25Similarity.termScorer(df = 7, ttf = 20, stats, boost = 1.5f)
    val w = Bm25.termWeight(0L, 7, 100L, 1000L, 1.5f)
    for (tf <- Seq(1f, 2f, 5f); nb <- Seq(120, 124, 130)) {
      assert(s.score(tf, nb.toByte) == Bm25.score(w.weightValue, tf, w.cache, nb.toByte))
    }
  }

  test("ClassicSimilarity closed form: idf^2 * sqrt(tf) * fieldNorm") {
    val s = ClassicSimilarity.termScorer(df = 9, ttf = 9, stats, boost = 1.0f)
    val idf = (math.log(100.0 / 10.0) + 1.0).toFloat
    val nb = SmallFloat.encodeNorm(16) // 1/sqrt(16) = 0.25 exactly representable
    val fieldNorm = SmallFloat.byte315ToSingle(nb)
    assert(fieldNorm == 0.25f)
    assert(s.score(4f, nb) == idf * idf * math.sqrt(4.0).toFloat * 0.25f)
    // monotone in tf
    assert(s.score(9f, nb) > s.score(4f, nb))
  }

  test("LMDirichlet closed form, clipping at zero") {
    val sim = LMDirichletSimilarity(mu = 2000f)
    val s = sim.termScorer(df = 5, ttf = 100, stats, boost = 1.0f)
    val nb = SmallFloat.encodeNorm(16)
    val dl = Bm25.NormTable(nb & 0xff)
    val want = (math.log(1.0 + 3f / (2000f * 0.1f)) + math.log(2000f / (dl + 2000f))).toFloat
    assert(s.score(3f, nb) == math.max(want, 0f))
    // a background-only match in a long doc scores 0, never negative
    val rare = sim.termScorer(df = 1, ttf = 1000, stats, boost = 1.0f)
    assert(rare.score(0.001f, SmallFloat.encodeNorm(100000)) >= 0f)
  }

  test("DFR I(F)L2 closed form (DFRSimilarity.cs:121, BasicModelIF, AfterEffectL, NormalizationH2)") {
    val sim = DFRSimilarity()
    val s = sim.termScorer(df = 5, ttf = 50, stats, boost = 2.0f)
    val nb = SmallFloat.encodeNorm(16)
    val dl = Bm25.NormTable(nb & 0xff)
    val avgFl = (1000.0 / 100.0).toFloat
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val tfn = (3f * log2(1.0 + avgFl / dl)).toFloat
    val basic = log2(1.0 + 101.0 / 50.5).toFloat
    assert(s.score(3f, nb) == 2.0f * (tfn * basic) * (1.0f / (tfn + 1.0f)))
    assert(s.score(6f, nb) > s.score(3f, nb)) // monotone in tf
    // rarer term scores higher at equal tf (smaller F)
    val rare = sim.termScorer(df = 1, ttf = 2, stats, boost = 2.0f)
    assert(rare.score(3f, nb) > s.score(3f, nb))
  }

  test("IB LL/DF/H2 closed form (IBSimilarity.cs:113, DistributionLL, LambdaDF)") {
    val sim = IBSimilarity()
    val s = sim.termScorer(df = 5, ttf = 50, stats, boost = 1.0f)
    val nb = SmallFloat.encodeNorm(16)
    val dl = Bm25.NormTable(nb & 0xff)
    val avgFl = (1000.0 / 100.0).toFloat
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val tfn = (2f * log2(1.0 + avgFl / dl)).toFloat
    val lambda = 6.0f / 101.0f
    assert(s.score(2f, nb) == (-math.log(lambda / (tfn + lambda))).toFloat)
    assert(s.score(4f, nb) > s.score(2f, nb))
    // rarer term (smaller lambda) scores higher at equal tf
    val rare = sim.termScorer(df = 1, ttf = 2, stats, boost = 1.0f)
    assert(rare.score(2f, nb) > s.score(2f, nb))
  }

  test("DFR basic-model matrix closed forms (BasicModel{In,Ine,G,P,D,BE}.cs)") {
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val n = 100L; val df = 5L; val f = 50L
    // isolate the basic model: no after-effect, no tf normalization
    def score(m: DfrBasicModel, tf: Float): Float = {
      val s = DFRSimilarity(m, DfrAfterEffect.None, DfrNormalization.None)
        .termScorer(df, f, stats, 1.0f)
      s.score(tf, SmallFloat.encodeNorm(16))
    }
    val tfn = 3f
    assert(score(DfrBasicModel.In, tfn) ==
      tfn * log2((n + 1) / (df + 0.5)).toFloat)
    val ne = n * (1 - math.pow((n - 1) / n.toDouble, f.toDouble))
    assert(score(DfrBasicModel.Ine, tfn) ==
      tfn * log2((n + 1) / (ne + 0.5)).toFloat)
    val lamG = (f + 1.0) / (n + f + 1.0)
    assert(score(DfrBasicModel.G, tfn) ==
      (log2(lamG + 1) + tfn * log2((1 + lamG) / lamG)).toFloat)
    val lamP = (f + 1).toFloat / (n + 1)
    assert(score(DfrBasicModel.P, tfn) ==
      (tfn * log2(tfn / lamP) + (lamP + 1 / (12 * tfn) - tfn) * log2(math.E) +
        0.5 * log2(2 * math.Pi * tfn)).toFloat)
    val bigF = f + 1 + tfn.toDouble
    val phi = tfn / bigF; val nphi = 1 - phi; val p = 1.0 / (n + 1)
    val dD = phi * log2(phi / p) + nphi * log2(nphi / (1 - p))
    assert(score(DfrBasicModel.D, tfn) ==
      (dD * bigF + 0.5 * log2(1 + 2 * math.Pi * tfn * nphi)).toFloat)
    def fF(a: Double, m: Double) = (m + 0.5) * log2(a / m) + (a - m) * log2(a)
    val bigN = bigF + n
    assert(score(DfrBasicModel.BE, tfn) ==
      (-log2((bigN - 1) * math.E) + fF(bigN + bigF - 1, bigN + bigF - tfn - 2)
        - fF(bigF, bigF - tfn)).toFloat)
    // every model is monotone in tfn on this configuration
    for (m <- Seq(DfrBasicModel.IF, DfrBasicModel.In, DfrBasicModel.Ine,
      DfrBasicModel.G, DfrBasicModel.P, DfrBasicModel.D, DfrBasicModel.BE))
      assert(score(m, 6f) > score(m, 3f), s"model $m not monotone")
  }

  test("DFR after-effects and normalizations closed forms (AfterEffectB, H1/H3/Z)") {
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val df = 5L; val f = 50L
    val nb = SmallFloat.encodeNorm(16)
    val dl = Bm25.NormTable(nb & 0xff)
    val avgFl = (1000.0 / 100.0).toFloat
    val kIn = log2(101.0 / 5.5).toFloat // BasicModelIn constant at these stats
    // AfterEffectB over Normalization.None: (F+2)/((df+1)(tfn+1))
    val b = DFRSimilarity(DfrBasicModel.In, DfrAfterEffect.B, DfrNormalization.None)
      .termScorer(df, f, stats, 1.0f)
    assert(b.score(3f, nb) == 1.0f * (3f * kIn) * ((f + 2) / ((df + 1) * 4f)))
    // H1: tfn = tf * avgFl / dl (reference 4.8: the c parameter is unused)
    val h1 = DFRSimilarity(DfrBasicModel.In, DfrAfterEffect.None, DfrNormalization.H1())
      .termScorer(df, f, stats, 1.0f)
    assert(h1.score(3f, nb) == (3f * avgFl / dl) * kIn)
    // H3: (tf + mu*((ttf+1)/(sumTtf+1)))/(dl+mu)*mu
    val mu = 800f
    val h3 = DFRSimilarity(DfrBasicModel.In, DfrAfterEffect.None, DfrNormalization.H3(mu))
      .termScorer(df, f, stats, 1.0f)
    val tfnH3 = (3f + mu * ((f + 1f) / (stats.sum_ttf + 1f))) / (dl + mu) * mu
    assert(h3.score(3f, nb) == tfnH3 * kIn)
    // Z: tf * (avgFl/dl)^z
    val z = 0.30f
    val hz = DFRSimilarity(DfrBasicModel.In, DfrAfterEffect.None, DfrNormalization.Z(z))
      .termScorer(df, f, stats, 1.0f)
    assert(hz.score(3f, nb) == (3f * math.pow(avgFl / dl, z)).toFloat * kIn)
  }

  test("IB distribution/lambda matrix closed forms (DistributionSPL, LambdaTTF)") {
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val df = 5L; val f = 50L
    val nb = SmallFloat.encodeNorm(16)
    val dl = Bm25.NormTable(nb & 0xff)
    val avgFl = (1000.0 / 100.0).toFloat
    val tfn = (2f * log2(1.0 + avgFl / dl)).toFloat
    // LambdaTTF: (F+1)/(N+1)
    val lamTtf = (f + 1f) / (stats.max_doc + 1f)
    val ll = IBSimilarity(IbDistribution.LL, IbLambda.TTF, DfrNormalization.H2())
      .termScorer(df, f, stats, 1.0f)
    assert(ll.score(2f, nb) == (-math.log(lamTtf / (tfn + lamTtf))).toFloat)
    // SPL: -log((lambda^(tfn/(tfn+1)) - lambda)/(1-lambda))
    val lamDf = 6f / 101f
    val spl = IBSimilarity(IbDistribution.SPL, IbLambda.DF, DfrNormalization.H2())
      .termScorer(df, f, stats, 1.0f)
    val want = (-math.log(
      (math.pow(lamDf.toDouble, tfn / (tfn + 1.0)) - lamDf) / (1 - lamDf))).toFloat
    assert(spl.score(2f, nb) == want)
    assert(spl.score(4f, nb) > spl.score(2f, nb))
  }

  test("MultiSimilarity sums its sub-scorers (MultiSimilarity.cs:38)") {
    val m = graft.score.MultiSimilarity(Seq(Bm25Similarity, ClassicSimilarity))
      .termScorer(df = 7, ttf = 20, stats, boost = 1.0f)
    val a = Bm25Similarity.termScorer(7, 20, stats, 1.0f)
    val b = ClassicSimilarity.termScorer(7, 20, stats, 1.0f)
    for (tf <- Seq(1f, 2f, 5f); nb <- Seq(0x40.toByte, 0x7f.toByte))
      assert(m.score(tf, nb) == a.score(tf, nb) + b.score(tf, nb))
  }

  test("alternate similarities: distributed engine == oracle on a real index") {
    val dir = Files.createTempDirectory("graft_sim").toString
    IndexBuilder.buildFromTurns(Transcripts.dataset(spark, 120), dir)
    val turns = Transcripts.local(120).sortBy(t => (t.conv_id, t.turn_idx))
      .zipWithIndex.map { case (t, i) => (i.toLong, t.text) }
    for (sim <- Seq(ClassicSimilarity, LMDirichletSimilarity(),
      DFRSimilarity(), IBSimilarity(), LMJelinekMercerSimilarity(),
      SweetSpotSimilarity(),
      // matrix configs: distinct basic model / after-effect / normalization
      DFRSimilarity(DfrBasicModel.In, DfrAfterEffect.B, DfrNormalization.H1()),
      DFRSimilarity(DfrBasicModel.G, DfrAfterEffect.L, DfrNormalization.Z()),
      DFRSimilarity(DfrBasicModel.Ine, DfrAfterEffect.B, DfrNormalization.H3()),
      DFRSimilarity(DfrBasicModel.P, DfrAfterEffect.L, DfrNormalization.H2()),
      IBSimilarity(IbDistribution.SPL, IbLambda.TTF, DfrNormalization.H2()),
      IBSimilarity(IbDistribution.LL, IbLambda.TTF, DfrNormalization.Z()),
      // combined + per-field routed (MultiSimilarity.cs, PerFieldSimilarityWrapper.cs)
      graft.score.MultiSimilarity(Seq(Bm25Similarity, ClassicSimilarity)),
      new graft.score.PerFieldSimilarityWrapper {
        override def get(field: String) =
          if (field == "text") LMDirichletSimilarity() else Bm25Similarity
        override def toString = "PerFieldWrapper(text->LMDirichlet)"
      })) {
      val searcher = new Searcher(spark, dir, sim)
      val oracle = new BruteForce(turns, sim)
      for (q <- Seq(Query.Term("time"), Query.parse("time person"),
        Query.parse("+spark query"), Query.Term("w001234"))) {
        val got = searcher.search(q, 10).collect()
          .map(r => (r.getLong(0), r.getFloat(1))).toSeq
        val want = oracle.search(q, 10)
        assert(got == want, s"$sim diverged on $q\n got: $got\nwant: $want")
      }
    }
  }
}
