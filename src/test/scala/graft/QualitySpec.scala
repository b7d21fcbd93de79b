package graft

import graft.quality.QualityStats
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed vectors for the ranked-quality metrics (reference
  * QualityStats.cs:100-137 semantics at a fixed cutoff).
  */
class QualitySpec extends AnyFunSuite {

  test("AP@k / P@k / RR hand vectors") {
    val rel = Set(1L, 3L, 7L)
    // ranked: rel at positions 1 and 3 of 5; first rel at rank 1
    val p = QualityStats.compute(Seq(1L, 2L, 3L, 4L, 5L), rel.contains, nRel = 3)
    // precisions at hits: 1/1, 2/3; denom = min(3, 5) = 3
    assert(math.abs(p.ap - (1.0 + 2.0 / 3) / 3) < 1e-12)
    assert(math.abs(p.pAtK - 2.0 / 5) < 1e-12)
    assert(p.rr == 1.0)
    // first rel at rank 2
    val q = QualityStats.compute(Seq(9L, 3L, 8L), rel.contains, nRel = 3)
    assert(q.rr == 0.5)
    assert(math.abs(q.ap - (1.0 / 2) / 3) < 1e-12)
  }

  test("perfect ranking scores MAP 1.0 at the cutoff") {
    val rel = (1L to 100L).toSet // many more relevant than k
    val p = QualityStats.compute(Seq(1L, 2L, 3L), rel.contains, nRel = 100)
    assert(p.ap == 1.0 && p.pAtK == 1.0 && p.rr == 1.0)
  }

  test("edges: no relevant docs, empty ranking, mean") {
    assert(QualityStats.compute(Seq(1L, 2L), _ => false, nRel = 0) ==
      QualityStats.Point(0.0, 0.0, 0.0))
    assert(QualityStats.compute(Nil, _ => true, nRel = 5) ==
      QualityStats.Point(0.0, 0.0, 0.0))
    val m = QualityStats.mean(Seq(QualityStats.Point(1, 1, 1),
      QualityStats.Point(0, 0.5, 0)))
    assert(m == QualityStats.Point(0.5, 0.75, 0.5))
  }
}
