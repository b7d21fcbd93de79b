package graft

import graft.query.SloppyPhrase
import org.scalatest.funsuite.AnyFunSuite

/** Hand-verified windows for the reference sloppy match loop
  * (SloppyPhraseScorer.PhraseFreq semantics; SloppyFreq = 1/(1+matchLength)).
  * slotPositions are RAW token positions; slot i is adjusted by -i inside.
  */
class SloppyPhraseSpec extends AnyFunSuite {

  private def f(slop: Int, slots: Array[Int]*): Float =
    SloppyPhrase.freq(slots.toArray, slop)

  test("exact adjacency scores 1 at any slop") {
    // "a b": a@0, b@1 -> matchLength 0
    assert(f(0, Array(0), Array(1)) == 1.0f)
    assert(f(3, Array(0), Array(1)) == 1.0f)
  }

  test("transposed pair needs slop 2 (the classic Lucene example)") {
    // doc "a b", phrase "b a": b@1 (adj 1), a@0 (adj -1) -> matchLength 2
    assert(f(1, Array(1), Array(0)) == 0.0f)
    assert(f(2, Array(1), Array(0)) == 1.0f / 3)
  }

  test("gap of g tokens needs slop g and scores 1/(1+g)") {
    // "a x b": a@0, b@2 -> matchLength 1
    assert(f(0, Array(0), Array(2)) == 0.0f)
    assert(f(1, Array(0), Array(2)) == 0.5f)
    // "a x x b": matchLength 2
    assert(f(2, Array(0), Array(3)) == 1.0f / 3)
  }

  test("multiple occurrences: minimal windows found while advancing") {
    // doc "x a x b a": a@{1,4}, b@3; phrase "a b"~1:
    // window a@1..b@3 has matchLength 1 -> one match at 1/2
    assert(f(1, Array(1, 4), Array(3)) == 0.5f)
    // with slop 2 the trailing a@4 (adj 4) vs b@3 (adj 2) window scores too
    assert(f(2, Array(1, 4), Array(3)) == 0.5f + 1.0f / 3)
  }

  test("three-term phrase windows") {
    // doc "a b c": contiguous -> matchLength 0
    assert(f(0, Array(0), Array(1), Array(2)) == 1.0f)
    // doc "a x b c": a@0, b@2, c@3 -> minimal window length 1
    assert(f(0, Array(0), Array(2), Array(3)) == 0.0f)
    assert(f(1, Array(0), Array(2), Array(3)) == 0.5f)
  }

  test("empty slot matches nothing") {
    assert(f(5, Array(0), Array.emptyIntArray) == 0.0f)
  }
}
