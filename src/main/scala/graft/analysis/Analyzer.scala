package graft.analysis

import scala.collection.mutable

/** A token emitted by the analysis chain. `posIncr` is the position increment
  * relative to the previous emitted token (holes left by dropped stopwords or
  * over-long tokens bump it, reference semantics:
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Core/StopFilter.cs +
  * FilteringTokenFilter.cs:38-65).
  */
final case class Token(term: String, posIncr: Int)

/** StandardAnalyzer-equivalent analysis chain, built fresh for Spark:
  * tokenizer -> per-codepoint lowercase -> 33-word English stop filter
  * (chain: /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Standard/StandardAnalyzer.cs:102-110).
  *
  * The tokenizer is a UAX#29-subset hand-rolled scanner (no regex in the hot
  * path): a token is a run of Unicode letters/digits/underscore, where a single
  * `'` (Single_Quote, WB6/WB7) or `.` (MidNumLet, WB6/WB7/WB11/WB12) joins two
  * such runs — so `don't`, `3.14`, `foo.bar` are single tokens while hyphens
  * and other punctuation split. Tokens longer than `MaxTokenLength` (255) are
  * dropped but still consume a position
  * (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Standard/StandardTokenizer.cs:108,196-248).
  *
  * Equivalent RE2 regex (used verbatim by the DuckDB oracle SQL so both sides
  * tokenize identically): `[\p{L}\p{N}_]+(?:['.][\p{L}\p{N}_]+)*`
  * applied to the lowercased text, then length<=255 + stopword filters.
  */
object Analyzer extends Serializable {

  /** The classic 33 English stopwords
    * (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Core/StopAnalyzer.cs:48-56).
    */
  val Stopwords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by",
    "for", "if", "in", "into", "is", "it",
    "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with")

  final val MaxTokenLength = 255

  @inline private def isTokenChar(cp: Int): Boolean =
    Character.isLetterOrDigit(cp) || cp == '_'

  @inline private def isJoiner(cp: Int): Boolean = cp == '\'' || cp == '.'

  /** Raw tokenizer: lowercased token strings in order, >MaxTokenLength dropped
    * as `null` placeholders so callers can track position holes.
    */
  private def rawTokens(text: String): mutable.ArrayBuffer[String] = {
    val out = new mutable.ArrayBuffer[String]()
    val n = text.length
    var i = 0
    while (i < n) {
      val cp = text.codePointAt(i)
      if (isTokenChar(cp)) {
        val sb = new java.lang.StringBuilder()
        var j = i
        var continue = true
        while (continue && j < n) {
          val c = text.codePointAt(j)
          if (isTokenChar(c)) {
            sb.appendCodePoint(Character.toLowerCase(c))
            j += Character.charCount(c)
          } else if (isJoiner(c) && j + 1 < n && isTokenChar(text.codePointAt(j + 1))) {
            sb.appendCodePoint(c)
            j += 1
          } else {
            continue = false
          }
        }
        out += (if (sb.length() > MaxTokenLength) null else sb.toString)
        i = j
      } else {
        i += Character.charCount(cp)
      }
    }
    out
  }

  /** Full chain with position increments (golden-table semantics, FIXTURES.md §2). */
  def analyze(text: String): Array[Token] = {
    val out = new mutable.ArrayBuffer[Token]()
    var pending = 1
    rawTokens(text).foreach { t =>
      if (t == null || Stopwords.contains(t)) pending += 1
      else { out += Token(t, pending); pending = 1 }
    }
    out.toArray
  }

  /** Emitted terms in order (no position bookkeeping) — for phrase matching. */
  def terms(text: String): Array[String] =
    rawTokens(text).iterator.filter(t => t != null && !Stopwords.contains(t)).toArray

  /** Indexing path with positions: per-term sorted position lists (tf =
    * list length) plus the emitted-token count. A position is the raw token
    * ordinal — stopword and overlong holes still consume one position, which
    * is exactly the accumulated position-increment bookkeeping of the
    * reference's DocInverter
    * (/root/reference/src/Lucene.Net/Index/DocInverterPerField.cs:131-195).
    */
  def termPositions(text: String): (mutable.HashMap[String, mutable.ArrayBuffer[Int]], Int) = {
    val m = new mutable.HashMap[String, mutable.ArrayBuffer[Int]]()
    var len = 0
    var p = -1
    rawTokens(text).foreach { t =>
      p += 1
      if (t != null && !Stopwords.contains(t)) {
        m.getOrElseUpdate(t, new mutable.ArrayBuffer[Int](1)) += p
        len += 1
      }
    }
    (m, len)
  }

  /** Indexing fast path: per-term frequency map plus emitted-token count
    * (the BM25 norm length; counts only emitted tokens, SURVEY.md §2.4 item 1).
    */
  def termFreqs(text: String): (mutable.HashMap[String, Int], Int) = {
    val tf = new mutable.HashMap[String, Int]()
    var len = 0
    rawTokens(text).foreach { t =>
      if (t != null && !Stopwords.contains(t)) {
        tf.updateWith(t) { case Some(c) => Some(c + 1); case None => Some(1) }
        len += 1
      }
    }
    (tf, len)
  }
}
