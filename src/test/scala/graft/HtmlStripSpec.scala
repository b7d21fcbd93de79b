package graft

import graft.analysis.{Analyzer, HtmlStrip, HtmlStripAnalyzer}
import org.scalatest.funsuite.AnyFunSuite

/** Goldens from the reference HTMLStripCharFilterTest.cs (cited per case). */
class HtmlStripSpec extends AnyFunSuite {

  test("main golden: tags, links, entities, comments (Test())") {
    val html = "<div class=\"foo\">this is some text</div> here is a " +
      "<a href=\"#bar\">link</a> and another " +
      "<a href=\"http://lucene.apache.org/\">link</a>. " +
      "This is an entity: &amp; plus a &lt;.  Here is an &. <!-- is a comment -->"
    val gold = "\nthis is some text\n here is a link and " +
      "another link. " +
      "This is an entity: & plus a <.  Here is an &. "
    assert(HtmlStrip.strip(html) == gold)
  }

  test("entities: named, numeric decimal and hex (TestGamma/TestEntities)") {
    assert(HtmlStrip.strip("&Gamma;") == "Γ")
    assert(HtmlStrip.strip("&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;") ==
      "  <foo> Übermensch = Γ bar Γ")
    assert(HtmlStrip.strip("&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; and &#8217;") ==
      "  <junk/>   ! @ and ’")
  }

  test("script/style elements drop their content (TestServerSideIncludes)") {
    val ssi = "one<img src=\"image.png\"\n" +
      " alt =  \"Alt: <!--#echo var='${IMAGE_CAPTION:<!--comment-->\\'Comment\\'}'  -->\"\n\n" +
      " title=\"Title: <!--#echo var=\"IMAGE_CAPTION\"-->\">two"
    assert(HtmlStrip.strip(ssi) == "onetwo")
    assert(HtmlStrip.strip("one<script><!-- <!--#config comment=\"<!-- " +
      "\\\"comment\\\"-->\"--> --></script>two") == "one\ntwo")
    assert(HtmlStrip.strip("a<style>p { color: red }</style>b") == "a\nb")
  }

  test("bare < and & stay literal; unterminated constructs consume safely") {
    assert(HtmlStrip.strip("2 < 3 & 4 > 1") == "2 < 3 & 4 > 1")
    assert(HtmlStrip.strip("x &unknown; y") == "x &unknown; y")
    assert(HtmlStrip.strip("trailing <") == "trailing <")
    assert(HtmlStrip.strip("open <div never closed") == "open ")
  }

  test("analyzer combinator: markup never glues words, block breaks do split") {
    val a = new HtmlStripAnalyzer(Analyzer)
    assert(a.tokens("<p>Hello <b>world</b></p><p>again</p>").filter(_ != null).toSeq ==
      Seq("hello", "world", "again"))
    // inline tag inside a word does not split it
    assert(a.tokens("anti<b>dis</b>establishment").filter(_ != null).toSeq ==
      Seq("antidisestablishment"))
  }
}
