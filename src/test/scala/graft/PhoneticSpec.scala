package graft

import graft.analysis.TokenFilters
import org.scalatest.funsuite.AnyFunSuite

/** Soundex golden vectors from the commons-codec/reference documentation
  * (Soundex.cs wraps the same US_ENGLISH mapping; the H-W merge rule and
  * vowel reset are the differentiators vs naive soundex).
  */
class PhoneticSpec extends AnyFunSuite {

  test("soundex golden vectors incl. H-W rule and vowel reset") {
    val golden = Map(
      "Robert" -> "R163", "Rupert" -> "R163",
      "Ashcraft" -> "A261", "Ashcroft" -> "A261", // H-W rule
      "Tymczak" -> "T522", "Pfister" -> "P236",
      "Honeyman" -> "H555", "Hanna" -> "H500",
      "Washington" -> "W252", "Lee" -> "L000",
      "Gutierrez" -> "G362", "Jackson" -> "J250", "Williams" -> "W452",
      "o'brien" -> "O165", // non-letters transparent
      "a" -> "A000", "w" -> "W000")
    golden.foreach { case (in, want) =>
      assert(TokenFilters.soundex(in) == want, s"soundex($in)")
      assert(TokenFilters.soundex(in.toLowerCase) == want, s"soundex(lower $in)")
    }
    assert(TokenFilters.soundex("3.14") == "")
    assert(TokenFilters.soundex("") == "")
  }

  test("double metaphone: all 1221 reference surname vectors (primary+alternate)") {
    // Vector set extracted from the reference's own test data
    // (Lucene.Net.Tests.Analysis.Phonetic/Language/DoubleMetaphone2Test.cs,
    // originally Stephen Woodbridge's surnames.txt): word, primary, alternate.
    val in = getClass.getResourceAsStream("/double_metaphone_vectors.tsv")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    assert(lines.size >= 1200)
    val bad = lines.flatMap { l =>
      val Array(w, p, a) = l.split('\t')
      val (gp, ga) = graft.analysis.DoubleMetaphone.encode(w)
      if (gp == p && ga == a) None else Some(s"$w: got ($gp,$ga) want ($p,$a)")
    }
    assert(bad.isEmpty, s"${bad.size} mismatches, first 20:\n${bad.take(20).mkString("\n")}")
  }

  test("double metaphone: edge inputs") {
    assert(graft.analysis.DoubleMetaphone.encode("") == ("", ""))
    assert(graft.analysis.DoubleMetaphone.encode("   ") == ("", ""))
    assert(graft.analysis.DoubleMetaphone.encode(null) == ("", ""))
    // lowercase input equals uppercase input
    assert(graft.analysis.DoubleMetaphone.encode("smith") ==
      graft.analysis.DoubleMetaphone.encode("SMITH"))
  }

  test("phonetic filter: inject vs replace") {
    val terms = Array("robert", "3.14")
    assert(TokenFilters.phonetic(terms, inject = true).toSeq ==
      Seq("robert", "R163", "3.14"))
    assert(TokenFilters.phonetic(terms, inject = false).toSeq ==
      Seq("R163", "3.14"))
  }
}
