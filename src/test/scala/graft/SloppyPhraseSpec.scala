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

  test("single-slot degenerate: each occurrence is a zero-length window") {
    // the reference rewrites 1-term phrases to TermQuery; direct callers
    // (MemoryIndex.phraseFreq) still reach freq() with one slot
    assert(f(0, Array(1, 5, 9)) == 3.0f)
    assert(f(2, Array(4)) == 1.0f)
    val mi = new graft.query.MemoryIndex("foo bar foo baz foo")
    assert(mi.matches(graft.query.Query.Phrase(Seq("foo"), slop = 1)))
  }

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

  // ---- repetition machinery: goldens from TestSloppyPhraseQuery.cs --------

  /** Whitespace-doc helper: per query slot, the raw positions of its term. */
  private def slots(doc: String, query: String): Array[Array[Int]] = {
    val toks = doc.split(" ")
    val posOf: Map[String, Array[Int]] =
      toks.zipWithIndex.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    query.split(" ").map(t => posOf.getOrElse(t, Array.emptyIntArray))
  }
  private val Doc1 = "X A A A Y"                      // S_1 wrapped
  private val Doc1B = "X A A A Y N N N N A A A Z"
  private val Doc2 = "X A 1 2 3 A 4 5 6 A Y"          // S_2 wrapped
  private val Doc2B = "X A 1 2 3 A 4 5 6 A Y N N N N A 1 2 3 A 4 5 6 A Z"
  private val Doc3 = "X A A A A Y"
  private val Doc3B = "X A A A A Y N N N N A A A A Y"
  private val Doc4 = "A A X A X B A X B B A A X B A A"

  test("repeats: Doc4/\"X A A\" — slop 0 no match, any slop >= 1 matches (TestDoc4_Query4)") {
    assert(f(0, slots(Doc4, "X A A"): _*) == 0.0f)
    for (slop <- 1 until 30)
      assert(f(slop, slots(Doc4, "X A A"): _*) > 0.0f, s"slop=$slop")
  }

  test("repeats: Doc1/\"A A A\" matches at every slop incl. 1 (LUCENE-1310)") {
    for (slop <- 0 until 30) {
      val f1 = f(slop, slots(Doc1, "A A A"): _*)
      val f2 = f(slop, slots(Doc1B, "A A A"): _*)
      assert(f1 > 0.0f, s"slop=$slop")
      assert(f2 > f1, s"slop=$slop: doubled doc must score higher")
    }
  }

  test("repeats: Doc2/\"A A A\" needs slop >= 6 (TestDoc2_Query1)") {
    for (slop <- 0 until 30) {
      val f1 = f(slop, slots(Doc2, "A A A"): _*)
      if (slop < 6) assert(f1 == 0.0f, s"slop=$slop")
      else {
        assert(f1 > 0.0f, s"slop=$slop")
        assert(f(slop, slots(Doc2B, "A A A"): _*) > f1, s"slop=$slop")
      }
    }
  }

  test("repeats: Doc2/\"A 1 2 3 A 4 5 6 A\" exact text matches at every slop (TestDoc2_Query2)") {
    for (slop <- 0 until 30) {
      val f1 = f(slop, slots(Doc2, "A 1 2 3 A 4 5 6 A"): _*)
      assert(f1 > 0.0f, s"slop=$slop")
      assert(f(slop, slots(Doc2B, "A 1 2 3 A 4 5 6 A"): _*) > f1, s"slop=$slop")
    }
  }

  test("repeats: Doc3/\"A A A\" with an extra A matches at every slop (TestDoc3_Query1)") {
    for (slop <- 0 until 30) {
      val f1 = f(slop, slots(Doc3, "A A A"): _*)
      assert(f1 > 0.0f, s"slop=$slop")
      assert(f(slop, slots(Doc3B, "A A A"): _*) > f1, s"slop=$slop")
    }
  }

  test("hidden collisions: one token cannot fill two overlapping slots") {
    val terms = Array(Array(0, 1), Array(1, 2)) // slot0={a,b}, slot1={b,c}
    // doc "b": both slot unions = [0]; only one b exists -> no match
    assert(SloppyPhrase.freq(Array(Array(0), Array(0)), 2, terms) == 0.0f)
    // doc "c b": slot0 union=[1] (b), slot1 union=[0,1] (c@0, b@1). Without
    // the repeat machinery the walk aligns slot0 and slot1 BOTH on b@1
    // (window length 1, matches slop 1); the hidden-collision resolution
    // forces slot1 onto c@0 -> true window length 2: no match at slop 1,
    // 1/(1+2) at slop 2 (SloppyPhraseScorer.cs:395-408)
    val cb = Array(Array(1), Array(0, 1))
    assert(SloppyPhrase.freq(cb, 1, null) == 0.5f) // naive walk over-matches
    assert(SloppyPhrase.freq(cb, 1, terms) == 0.0f)
    assert(SloppyPhrase.freq(cb, 2, terms) == 1.0f / 3)
  }

  test("hidden collisions: \"b b\" fills both overlapping slots adjacently") {
    // doc "b b": slot unions both [0,1]; b@0 takes slot0, b@1 takes slot1
    // -> perfect alignment, freq 1.0
    val terms = Array(Array(0, 1), Array(1, 2))
    val bb = Array(Array(0, 1), Array(0, 1))
    assert(SloppyPhrase.freq(bb, 1, terms) == 1.0f)
  }

  test("hidden collisions: the reference's \"A C B\" example matches via A,C") {
    // P1={A,B}, P2={B,C}, doc "A C B" (SloppyPhraseScorer.cs:395 example):
    // slot0 union = [0,2] (A@0, B@2), slot1 union = [1,2] (C@1, B@2).
    // A@0/C@1 is the perfect window; B@2 may serve only ONE of the slots.
    val terms = Array(Array(0, 1), Array(1, 2))
    val acb = Array(Array(0, 2), Array(1, 2))
    assert(SloppyPhrase.freq(acb, 1, terms) == 1.0f)
  }

  test("disjoint and identical slot sets behave as before with term identities") {
    // disjoint slots: identities present but no repeats -> same walk
    assert(SloppyPhrase.freq(Array(Array(0), Array(1)), 3,
      Array(Array(0), Array(1))) == 1.0f)
    // identical slots = single-term repeat group: "A A A" vs "A A A"~1
    // (LUCENE-1310 shape, same value as the positions-only path)
    val a3 = Array(Array(0, 1, 2), Array(0, 1, 2), Array(0, 1, 2))
    val ids = Array(Array(7), Array(7), Array(7))
    assert(SloppyPhrase.freq(a3, 1, ids) == SloppyPhrase.freq(a3, 1, null))
  }

  test("repeats: \"H H H H\" needs four H's — never three (LUCENE-3412)") {
    val doc54 = "H H H H"
    val doc53 = "H H H X X X H H H X X X H H H"
    for (slop <- 0 until 3) {
      assert(f(slop, slots(doc54, "H H H H"): _*) > 0.0f, s"slop=$slop")
      assert(f(slop, slots(doc53, "H H H H"): _*) == 0.0f, s"slop=$slop")
    }
  }
}
