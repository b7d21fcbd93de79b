package graft

import graft.analysis.{Analyzer, EnglishAnalyzer, PorterStemmer, TokenFilters}
import org.scalatest.funsuite.AnyFunSuite

/** Porter 1980 golden vectors (sampled from the published algorithm's
  * example set, spanning every step) + EnglishAnalyzer chain behavior +
  * token-filter combinators.
  */
class PorterSpec extends AnyFunSuite {

  private val golden = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "radicalli" -> "radic", "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens", "irritant" -> "irrit",
    "replacement" -> "replac", "adjustment" -> "adjust",
    "dependent" -> "depend", "adoption" -> "adopt", "homologou" -> "homolog",
    "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll",
    // common English words through the full pipeline
    "running" -> "run", "flies" -> "fli", "dogs" -> "dog",
    "searching" -> "search", "searches" -> "search", "indexed" -> "index",
    "indexing" -> "index", "merges" -> "merg", "merge" -> "merg",
    "merged" -> "merg", "merging" -> "merg")

  test("Porter golden vectors across all steps") {
    golden.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("EnglishAnalyzer chain: possessive strip, stop holes, stemming") {
    // possessive then stop then stem; holes still consume positions
    assert(EnglishAnalyzer.terms("The dog's bones were buried").toSeq ==
      Seq("dog", "bone", "were", "buri"))
    val (tp, len) = EnglishAnalyzer.termPositions("the running dogs are running")
    assert(len == 3)
    assert(tp("run").toSeq == Seq(1, 4)) // positions keep the stop holes
    assert(tp("dog").toSeq == Seq(2))
  }

  test("stem groups are singletons over the gate corpus vocabulary") {
    // documented precondition of the ft_q_term_stemmed oracle equivalence
    val spark = SparkTestSession.spark
    import spark.implicits._
    val vocab = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").as[String].collect()
      .flatMap(Analyzer.terms).distinct
    val byStem = vocab.groupBy(PorterStemmer.stem)
    val collisions = byStem.filter(_._2.length > 1)
    assert(collisions.isEmpty, s"stem collisions: $collisions")
  }

  test("alternate core analyzers: whitespace, simple, keyword") {
    import graft.analysis.{KeywordAnalyzer, SimpleAnalyzer, WhitespaceAnalyzer}
    assert(WhitespaceAnalyzer.terms("The QUICK  brown-fox 3.14").toSeq ==
      Seq("The", "QUICK", "brown-fox", "3.14"))
    assert(SimpleAnalyzer.terms("The QUICK brown-fox 3.14").toSeq ==
      Seq("the", "quick", "brown", "fox"))
    assert(KeywordAnalyzer.terms("The QUICK brown").toSeq == Seq("The QUICK brown"))
    assert(KeywordAnalyzer.terms("").isEmpty)
    // derived methods come from the shared trait
    assert(SimpleAnalyzer.termFreqs("a b a")._1("a") == 2)
  }

  test("token-filter combinators: shingles, ngrams, synonyms, folding") {
    assert(TokenFilters.shingles(Array("a", "b", "c"), 2, 3).toSeq ==
      Seq("a", "a b", "a b c", "b", "b c", "c"))
    assert(TokenFilters.ngrams("abcd", 2, 3).toSeq ==
      Seq("ab", "bc", "cd", "abc", "bcd"))
    assert(TokenFilters.edgeNgrams("abcd", 1, 3).toSeq == Seq("a", "ab", "abc"))
    assert(TokenFilters.synonyms(Array("fast", "dog"),
      Map("fast" -> Seq("quick", "rapid"))).toSeq ==
      Seq("fast", "quick", "rapid", "dog"))
    assert(TokenFilters.asciiFold("café") == "cafe")
    assert(TokenFilters.asciiFold("über") == "uber")
    assert(TokenFilters.asciiFold("straße") == "strasse")
    assert(TokenFilters.asciiFold("łódź") == "lodz")
  }
}
