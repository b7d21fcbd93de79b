package graft

import graft.query.Query
import graft.query.Query._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-table coverage of the classic query-parser surface
  * (reference grammar: QueryParser.cs:104 clause loop :137-229; builders
  * QueryParserBase.cs:445-498,479,750,784).
  */
class ParserSpec extends AnyFunSuite {

  test("bare terms default to SHOULD; modifiers set MUST/MUST_NOT") {
    assert(Query.parse("time person") ==
      BoolQ(Seq((Should, Term("time")), (Should, Term("person")))))
    assert(Query.parse("+time person -man") ==
      BoolQ(Seq((Must, Term("time")), (Should, Term("person")), (MustNot, Term("man")))))
  }

  test("single SHOULD clause collapses to its leaf") {
    assert(Query.parse("time") == Term("time"))
    assert(Query.parse("time^2") == Term("time", 2.0f))
  }

  test("AND promotes both neighbours to MUST; OR keeps SHOULD") {
    assert(Query.parse("time AND person") ==
      BoolQ(Seq((Must, Term("time")), (Must, Term("person")))))
    assert(Query.parse("time OR person") ==
      BoolQ(Seq((Should, Term("time")), (Should, Term("person")))))
    assert(Query.parse("time && person") == Query.parse("time AND person"))
    assert(Query.parse("time || person") == Query.parse("time OR person"))
    assert(Query.parse("time AND NOT person") ==
      BoolQ(Seq((Must, Term("time")), (MustNot, Term("person")))))
    assert(Query.parse("NOT person") == BoolQ(Seq((MustNot, Term("person")))))
  }

  test("quoted phrases, slop and boost") {
    assert(Query.parse("\"fast table\"") == Phrase(Seq("fast", "table")))
    assert(Query.parse("\"fast table\"~2") == Phrase(Seq("fast", "table"), 2))
    assert(Query.parse("\"fast table\"^3") == Phrase(Seq("fast", "table"), 0, 3.0f))
    // stopwords vanish inside the phrase body; a 1-term phrase is a term
    assert(Query.parse("\"the table\"") == Term("table"))
  }

  test("field prefix: only the indexed field") {
    assert(Query.parse("text:time") == Term("time"))
    assertThrows[IllegalArgumentException](Query.parse("title:time"))
  }

  test("prefix, wildcard, fuzzy, regexp-free surface") {
    assert(Query.parse("wind*") == Prefix("wind"))
    assert(Query.parse("w?ndow") == Wildcard("w?ndow"))
    assert(Query.parse("wi*ow") == Wildcard("wi*ow"))
    assert(Query.parse("soft~") == Fuzzy("soft", 2))
    assert(Query.parse("soft~1") == Fuzzy("soft", 1))
  }

  test("term ranges, inclusive and exclusive") {
    assert(Query.parse("[batch TO data]") == TermRange("batch", "data"))
    assert(Query.parse("{batch TO data}") ==
      TermRange("batch", "data", includeLo = false, includeHi = false))
  }

  test("analysis applies to query terms (case, joiners, hyphens)") {
    assert(Query.parse("don't") == Term("don't"))
    assert(Query.parse("3.14") == Term("3.14"))
    assert(Query.parse("The Quick-Brown index") ==
      BoolQ(Seq((Should, Term("quick")), (Should, Term("brown")), (Should, Term("index")))))
    // a modifier applies to every token of a multi-token word
    assert(Query.parse("+quick-brown time") ==
      BoolQ(Seq((Must, Term("quick")), (Must, Term("brown")), (Should, Term("time")))))
  }

  test("parenthesized groups nest (QueryParserBase.cs:445 group production)") {
    // stopword 'a'/'b' would vanish — use corpus-ish words
    assert(Query.parse("(time OR person) AND year") ==
      BoolQ(Seq(
        (Must, BoolQ(Seq((Should, Term("time")), (Should, Term("person"))))),
        (Must, Term("year")))))
    // group boost carries on the BooleanQuery
    assert(Query.parse("(time person)^2") ==
      BoolQ(Seq((Should, Term("time")), (Should, Term("person"))), 0, 2.0f))
    // single-clause group with unit boost collapses to its leaf
    assert(Query.parse("(time) person") ==
      BoolQ(Seq((Should, Term("time")), (Should, Term("person")))))
    // +/- modifiers apply to whole groups; groups nest recursively
    assert(Query.parse("+(spark index) -(slow down)") ==
      BoolQ(Seq(
        (Must, BoolQ(Seq((Should, Term("spark")), (Should, Term("index"))))),
        (MustNot, BoolQ(Seq((Should, Term("slow")), (Should, Term("down"))))))))
    assert(Query.parse("((time OR person) year) spark") ==
      BoolQ(Seq(
        (Should, BoolQ(Seq(
          (Should, BoolQ(Seq((Should, Term("time")), (Should, Term("person"))))),
          (Should, Term("year"))))),
        (Should, Term("spark")))))
    // phrases nest inside groups
    assert(Query.parse("(\"time person\" OR year) spark") ==
      BoolQ(Seq(
        (Should, BoolQ(Seq(
          (Should, Phrase(Seq("time", "person"))), (Should, Term("year"))))),
        (Should, Term("spark")))))
    // unbalanced parens still rejected
    assertThrows[IllegalArgumentException](Query.parse("time) person"))
    assertThrows[IllegalArgumentException](Query.parse("(time person"))
  }

  test("mixed clause kinds parse together") {
    assert(Query.parse("+time wind* soft~1 [aa TO ab] -person") ==
      BoolQ(Seq((Must, Term("time")), (Should, Prefix("wind")),
        (Should, Fuzzy("soft", 1)), (Should, TermRange("aa", "ab")),
        (MustNot, Term("person")))))
  }
}
