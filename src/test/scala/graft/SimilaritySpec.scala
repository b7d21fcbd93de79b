package graft

import graft.build.IndexBuilder
import graft.codec.SmallFloat
import graft.fixtures.Transcripts
import graft.model.CollectionStats
import graft.oracle.BruteForce
import graft.query.{Query, Searcher}
import graft.score.{Bm25, Bm25Similarity, ClassicSimilarity, DFRSimilarity,
  IBSimilarity, LMDirichletSimilarity, LMJelinekMercerSimilarity,
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

  test("alternate similarities: distributed engine == oracle on a real index") {
    val dir = Files.createTempDirectory("graft_sim").toString
    IndexBuilder.buildFromTurns(Transcripts.dataset(spark, 120), dir)
    val turns = Transcripts.local(120).sortBy(t => (t.conv_id, t.turn_idx))
      .zipWithIndex.map { case (t, i) => (i.toLong, t.text) }
    for (sim <- Seq(ClassicSimilarity, LMDirichletSimilarity(),
      DFRSimilarity(), IBSimilarity(), LMJelinekMercerSimilarity(),
      SweetSpotSimilarity())) {
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
