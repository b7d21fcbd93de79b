package graft

import graft.codec.SmallFloat
import graft.score.Bm25
import org.scalatest.funsuite.AnyFunSuite

class Bm25Spec extends AnyFunSuite {

  test("norm table: byte 124 decodes to field length 1") {
    assert(Bm25.NormTable(124) == 1.0f)
    assert(Bm25.NormTable(0).isPosInfinity)
  }

  test("closed-form single-doc score (TestSimilarityBase-style hand computation)") {
    // Corpus: 2 docs, term appears in doc0 once, doc0 has 1 emitted token,
    // avgdl = 1.0. idf = ln(1 + (2 - 1 + 0.5)/(1 + 0.5)) = ln(2).
    val idf = Bm25.idf(df = 1, maxDoc = 2)
    assert(idf == math.log(2.0).toFloat)
    val avgdl = Bm25.avgFieldLength(sumTtf = 2, maxDoc = 2)
    assert(avgdl == 1.0f)
    val cache = Bm25.buildCache(avgdl)
    // cache[124] = 1.2 * ((1 - 0.75) + 0.75 * 1.0 / 1.0) = 1.2
    assert(cache(124) == 1.2f * (0.25f + 0.75f))
    val w = Bm25.weightValue(idf)
    // score = idf*2.2 * 1 / (1 + 1.2) = idf (since 2.2/2.2 = 1 exactly in f32? verify numerically)
    val s = Bm25.score(w, 1.0f, cache, 124.toByte)
    val expected = (math.log(2.0).toFloat * 2.2f) * 1.0f / (1.0f + 1.2f)
    assert(s == expected)
  }

  test("score is monotone increasing in tf and decreasing in doc length") {
    val cache = Bm25.buildCache(10.0f)
    val w = Bm25.weightValue(Bm25.idf(5, 100))
    val byTf = (1 to 20).map(tf => Bm25.score(w, tf.toFloat, cache, SmallFloat.encodeNorm(10)))
    assert(byTf == byTf.sorted)
    val byLen = Seq(1, 2, 4, 16, 64, 256).map(l => Bm25.score(w, 2.0f, cache, SmallFloat.encodeNorm(l)))
    assert(byLen == byLen.sorted.reverse)
  }

  test("clause sum order matters and is ascending term_id") {
    val xs = Array(0.1f, 0.2f, 0.3f, 1e-8f, 7.7f)
    val s = Bm25.sumClauses(xs)
    assert(s == ((((0.1f + 0.2f) + 0.3f) + 1e-8f) + 7.7f))
  }
}
