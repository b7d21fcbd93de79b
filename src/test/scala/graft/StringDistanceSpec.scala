package graft

import graft.query.StringDistance
import org.scalatest.funsuite.AnyFunSuite

/** Jaro / Jaro-Winkler golden vectors (the published examples from
  * Winkler's record-linkage papers, used by every implementation including
  * the reference JaroWinklerDistance tests) + invariants. Bit-parity with
  * the SQL oracle is pinned separately by the ft_suggest_jaro gate hash.
  */
class StringDistanceSpec extends AnyFunSuite {

  private def approx(a: Double, b: Double, eps: Double = 1e-3): Boolean =
    math.abs(a - b) <= eps

  test("published golden vectors") {
    assert(approx(StringDistance.jaro("MARTHA", "MARHTA"), 0.9444))
    assert(approx(StringDistance.jaroWinkler("MARTHA", "MARHTA"), 0.9611))
    assert(approx(StringDistance.jaro("DIXON", "DICKSONX"), 0.7667))
    assert(approx(StringDistance.jaroWinkler("DIXON", "DICKSONX"), 0.8133))
    assert(approx(StringDistance.jaro("JELLYFISH", "SMELLYFISH"), 0.8963))
    assert(approx(StringDistance.jaroWinkler("JELLYFISH", "SMELLYFISH"), 0.8963))
  }

  test("invariants: identity, empty, symmetry, bonus threshold") {
    assert(StringDistance.jaro("abc", "abc") == 1.0)
    assert(StringDistance.jaroWinkler("abc", "abc") == 1.0)
    assert(StringDistance.jaro("", "abc") == 0.0)
    assert(StringDistance.jaro("abc", "") == 0.0)
    assert(StringDistance.jaro("xyz", "abc") == 0.0)
    for ((a, b) <- Seq(("table", "tabel"), ("window", "widow"), ("proces", "process"))) {
      assert(StringDistance.jaro(a, b) == StringDistance.jaro(b, a))
      assert(StringDistance.jaroWinkler(a, b) == StringDistance.jaroWinkler(b, a))
      assert(StringDistance.jaroWinkler(a, b) >= StringDistance.jaro(a, b))
    }
    // below the 0.7 threshold the Winkler bonus must NOT apply even with a
    // shared prefix (the rule DuckDB and the reference both implement):
    // jaro("abcdef","abzzzzzzzzzz") = (2/6 + 2/12 + 2/2)/3 = 0.5 exactly
    val low = StringDistance.jaro("abcdef", "abzzzzzzzzzz")
    assert(low == 0.5)
    assert(StringDistance.jaroWinkler("abcdef", "abzzzzzzzzzz") == low)
    // and just above it the bonus applies
    val j = StringDistance.jaro("dwayne", "duane")
    assert(j > 0.7 && StringDistance.jaroWinkler("dwayne", "duane") > j)
  }
}
