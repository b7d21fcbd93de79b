package graft

import graft.analysis.{Analyzer, Token}
import org.scalatest.funsuite.AnyFunSuite

class AnalyzerSpec extends AnyFunSuite {

  test("golden token tables (FIXTURES.md §2)") {
    assert(Analyzer.analyze("The Quick-Brown FOX").toSeq ==
      Seq(Token("quick", 2), Token("brown", 1), Token("fox", 1)))
    // "stop" is not one of the 33 stopwords, so it is emitted too
    assert(Analyzer.analyze("don't stop").toSeq ==
      Seq(Token("don't", 1), Token("stop", 1)))
    assert(Analyzer.analyze("3.14 IPv6 a b").toSeq ==
      Seq(Token("3.14", 1), Token("ipv6", 1), Token("b", 2)))
    val long = "x" * 300 + " ok"
    assert(Analyzer.analyze(long).toSeq == Seq(Token("ok", 2)))
    assert(Analyzer.analyze("").isEmpty)
    assert(Analyzer.analyze("the and of to").isEmpty)
  }

  test("joiners: apostrophe/period join, others split; trailing joiner excluded") {
    assert(Analyzer.terms("foo.bar baz").toSeq == Seq("foo.bar", "baz"))
    assert(Analyzer.terms("end. next").toSeq == Seq("end", "next"))
    assert(Analyzer.terms("foo-bar").toSeq == Seq("foo", "bar"))
    assert(Analyzer.terms("a_b c'd'e 1.2.3").toSeq == Seq("a_b", "c'd'e", "1.2.3"))
    assert(Analyzer.terms("it's").toSeq == Seq("it's"))
    assert(Analyzer.terms("O'Neil").toSeq == Seq("o'neil"))
  }

  test("UAX#29 script classes: CJK + SE-Asian goldens (TestStandardAnalyzer.cs)") {
    // Chinese: one token per ideograph; fullwidth digits/letters are ALNUM
    // (TestStandardAnalyzer.cs TestChinese)
    assert(Analyzer.terms("我是中国人。 １２３４ Ｔｅｓｔｓ").toSeq ==
      Seq("我", "是", "中", "国", "人", "１２３４", "ｔｅｓｔｓ"))
    // supplementary-plane ideographs stay single (TestKorean/TestJapanese area)
    assert(Analyzer.terms("𩬅艱鍟䇹愯瀛").toSeq ==
      Seq("𩬅", "艱", "鍟", "䇹", "愯", "瀛"))
    // Korean: Hangul runs hold together (TestKorean)
    assert(Analyzer.terms("훈민정음").toSeq == Seq("훈민정음"))
    // Japanese: Han/Hiragana single chars, Katakana runs (TestJapanese)
    assert(Analyzer.terms("仮名遣い カタカナ").toSeq ==
      Seq("仮", "名", "遣", "い", "カタカナ"))
    // prolonged sound mark stays inside a katakana run
    assert(Analyzer.terms("コーヒー 珈琲").toSeq == Seq("コーヒー", "珈", "琲"))
    // Thai: tone marks are Extend (no break); Thai digits run (TestThai)
    assert(Analyzer.terms("การที่ได้ต้องแสดงว่างานดี. แล้วเธอจะไปไหน? ๑๒๓๔").toSeq ==
      Seq("การที่ได้ต้องแสดงว่างานดี", "แล้วเธอจะไปไหน", "๑๒๓๔"))
    // Lao (TestLao)
    assert(Analyzer.terms("ສາທາລະນະລັດ ປະຊາທິປະໄຕ ປະຊາຊົນລາວ").toSeq ==
      Seq("ສາທາລະນະລັດ", "ປະຊາທິປະໄຕ", "ປະຊາຊົນລາວ"))
    // Tibetan: subjoined consonants glue, tsheg breaks (TestTibetan)
    assert(Analyzer.terms("སྣོན་མཛོད་དང་ལས་འདིས་").toSeq ==
      Seq("སྣོན", "མཛོད", "དང", "ལས", "འདིས"))
    // script boundaries split even without spaces
    assert(Analyzer.terms("latin漢字かなカナ한글").toSeq ==
      Seq("latin", "漢", "字", "か", "な", "カナ", "한글"))
  }

  test("CJKAnalyzer bigrams (TestCJKAnalyzer.cs / TestCJKBigramFilter.cs goldens)") {
    import graft.analysis.CJKAnalyzer
    // unbroken Han run -> overlapping bigrams (TestJa1)
    assert(CJKAnalyzer.terms("一二三四五六七八九十").toSeq ==
      Seq("一二", "二三", "三四", "四五", "五六", "六七", "七八", "八九", "九十"))
    // isolated chars stay single; runs bigram within their whitespace span (TestJa2)
    assert(CJKAnalyzer.terms("一 二三四 五六七八九 十").toSeq ==
      Seq("一", "二三", "三四", "五六", "六七", "七八", "八九", "十"))
    // non-CJK text is the standard chain (TestC)
    assert(CJKAnalyzer.terms("abc defgh spark").toSeq == Seq("abc", "defgh", "spark"))
    // Hiragana pairs bigram too (TestJ)
    assert(CJKAnalyzer.terms("あい").toSeq == Seq("あい"))
    // mixed Han+Hiragana runs merge across classes (TestAllScripts shape)
    assert(CJKAnalyzer.terms("多くの学生が試験に落ちた。").toSeq ==
      Seq("多く", "くの", "の学", "学生", "生が", "が試", "試験", "験に", "に落", "落ち", "ちた"))
  }

  test("termFreqs counts only emitted tokens (norm length contract)") {
    val (tf, len) = Analyzer.termFreqs("the cat and the cat sat on a MAT " + ("y" * 300))
    assert(tf == scala.collection.mutable.HashMap("cat" -> 2, "sat" -> 1, "mat" -> 1))
    assert(len == 4)
  }

  test("tokenizer matches the documented RE2 regex on random ASCII text") {
    val re = """[\p{L}\p{N}_]+(?:['.][\p{L}\p{N}_]+)*""".r
    val rnd = new scala.util.Random(7)
    val alphabet = "abcXYZ019_'.,-!? \t\n"
    for (_ <- 1 to 500) {
      val s = Array.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val viaRegex = re.findAllIn(s.toLowerCase).toSeq
        .filter(t => t.length <= Analyzer.MaxTokenLength && !Analyzer.Stopwords.contains(t))
      assert(Analyzer.terms(s).toSeq == viaRegex, s"input=[$s]")
    }
  }
}
