package graft.query

/** Minimal query algebra over the index — the analog of the reference's
  * Query tree (/root/reference/src/Lucene.Net/Search/BooleanQuery.cs,
  * TermQuery.cs). Multi-term expansion queries (prefix/wildcard/fuzzy/range)
  * rewrite to Bool-of-Terms against the term dictionary before execution
  * (MultiTermQuery rewrite semantics,
  * /root/reference/src/Lucene.Net/Search/MultiTermQuery.cs:65-121).
  */
sealed trait Query

object Query {
  final val MaxClauseCount = 1024 // BooleanQuery.MaxClauseCount guard

  final case class Term(term: String, boost: Float = 1.0f) extends Query

  final case class Bool(
      must: Seq[String] = Nil,
      should: Seq[String] = Nil,
      mustNot: Seq[String] = Nil,
      minShouldMatch: Int = 0) extends Query

  /** Positional phrase query scored from the postings positions index.
    *
    * slop = 0 is the reference's exact phrase (conjunction + position
    * alignment, freq = number of alignments,
    * /root/reference/src/Lucene.Net/Search/ExactPhraseScorer.cs:237-349).
    * slop > 0 (two terms) uses the reference's per-match weighting
    * SloppyFreq = 1/(distance+1)
    * (/root/reference/src/Lucene.Net/Search/Similarities/BM25Similarity.cs:74-77)
    * summed over each leading-term occurrence's nearest in-slop partner —
    * a documented simplification of SloppyPhraseScorer's repetition-handling
    * window algorithm (724 LoC), identical whenever occurrences don't overlap.
    */
  final case class Phrase(terms: Seq[String], slop: Int = 0,
                          boost: Float = 1.0f) extends Query

  /** Parse a tiny subset of the classic query syntax: whitespace-separated
    * clauses, `+term` = MUST, `-term` = MUST_NOT, bare = SHOULD. Terms are
    * analyzed with the same chain as indexing
    * (QueryParserBase.GetFieldQuery semantics,
    * /root/reference/src/Lucene.Net.QueryParser/Classic/QueryParserBase.cs:445-498).
    */
  def parse(q: String): Bool = {
    var must = Vector.empty[String]
    var should = Vector.empty[String]
    var mustNot = Vector.empty[String]
    q.trim.split("\\s+").filter(_.nonEmpty).foreach { raw =>
      val (kind, body) =
        if (raw.startsWith("+")) ('+', raw.substring(1))
        else if (raw.startsWith("-")) ('-', raw.substring(1))
        else (' ', raw)
      graft.analysis.Analyzer.terms(body).foreach { t =>
        kind match {
          case '+' => must :+= t
          case '-' => mustNot :+= t
          case _   => should :+= t
        }
      }
    }
    require(must.size + should.size + mustNot.size <= MaxClauseCount,
      s"too many clauses (> $MaxClauseCount)")
    Bool(must, should, mustNot)
  }
}
