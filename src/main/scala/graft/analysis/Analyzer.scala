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
/** An analysis chain: tokenizer + filters collapsed to a post-chain token
  * stream where `null` marks a consumed-position hole (a dropped stopword or
  * over-long token). Every index/query consumer (positions, term
  * frequencies, norms length) derives from this one method, so alternate
  * chains (EnglishAnalyzer, custom combinators) plug in by overriding it —
  * the functional analog of Analyzer.CreateComponents
  * (/root/reference/src/Lucene.Net/Analysis/Analyzer.cs:33-116).
  */
trait TextAnalyzer extends Serializable {

  /** Post-chain token stream; null = hole (position consumed, no term). */
  def tokens(text: String): mutable.ArrayBuffer[String]

  /** Post-chain tokens plus source character spans, parallel to [[tokens]]:
    * `starts(p)`/`ends(p)` bound position p's token in the ORIGINAL text
    * (start inclusive, end exclusive; holes keep their tokenizer span).
    * Offsets always point into the untouched input — token filters rewrite
    * terms, never spans — the reference's OffsetAttribute contract
    * (/root/reference/src/Lucene.Net/Analysis/TokenAttributes/OffsetAttribute.cs:26-42,
    * and e.g. PorterStemFilter/StopFilter leaving offsets untouched). Chains
    * whose tokenizer does not track offsets don't support term vectors with
    * offsets and say so.
    */
  def tokenSpans(text: String): (mutable.ArrayBuffer[String], Array[Int], Array[Int]) =
    throw new UnsupportedOperationException(
      getClass.getSimpleName + " does not track character offsets")

  /** Per-term sorted position lists (tf = list length) plus emitted-token
    * count. A position is the raw token ordinal — holes still consume one,
    * exactly the accumulated position-increment bookkeeping of the
    * reference's DocInverter
    * (/root/reference/src/Lucene.Net/Index/DocInverterPerField.cs:131-195).
    */
  final def termPositions(text: String): (mutable.HashMap[String, mutable.ArrayBuffer[Int]], Int) = {
    val m = new mutable.HashMap[String, mutable.ArrayBuffer[Int]]()
    var len = 0
    var p = -1
    tokens(text).foreach { t =>
      p += 1
      if (t != null) {
        m.getOrElseUpdate(t, new mutable.ArrayBuffer[Int](1)) += p
        len += 1
      }
    }
    (m, len)
  }

  /** Emitted terms in order (no position bookkeeping). */
  final def terms(text: String): Array[String] =
    tokens(text).iterator.filter(_ != null).toArray

  /** Per-term frequency map plus emitted-token count (the BM25 norm length;
    * counts only emitted tokens, SURVEY.md §2.4 item 1).
    */
  final def termFreqs(text: String): (mutable.HashMap[String, Int], Int) = {
    val tf = new mutable.HashMap[String, Int]()
    var len = 0
    tokens(text).foreach { t =>
      if (t != null) {
        tf.updateWith(t) { case Some(c) => Some(c + 1); case None => Some(1) }
        len += 1
      }
    }
    (tf, len)
  }

  /** Full chain with position increments (golden-table semantics). */
  final def analyze(text: String): Array[Token] = {
    val out = new mutable.ArrayBuffer[Token]()
    var pending = 1
    tokens(text).foreach { t =>
      if (t == null) pending += 1
      else { out += Token(t, pending); pending = 1 }
    }
    out.toArray
  }
}

object Analyzer extends TextAnalyzer {

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

  /** UAX#29 Extend: combining marks glue to the preceding base character
    * instead of breaking the token (Thai/Lao tone marks, Tibetan subjoined
    * consonants, Hebrew niqqud, ...).
    */
  @inline private def isMark(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK
  }

  // Word-break classes mirroring the reference StandardTokenizer's UAX#29
  // grammar (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Standard/
  // StandardTokenizerImpl.cs token types; goldens in
  // Lucene.Net.Tests.Analysis.Common/Analysis/Core/TestStandardAnalyzer.cs):
  // Han and Hiragana emit ONE token per character (ideograph bigramming is a
  // downstream filter's job), Katakana / Hangul / Southeast-Asian scripts
  // emit same-class runs, everything else letter/digit/_ runs.
  private final val ClsOther = 0
  private final val ClsAlnum = 1
  private final val ClsHan = 2
  private final val ClsHiragana = 3
  private final val ClsKatakana = 4
  private final val ClsHangul = 5
  private final val ClsSeAsian = 6

  private def charClass(cp: Int): Int = {
    if (cp == '_') ClsAlnum
    else if (cp == 0x30FC) ClsKatakana // prolonged sound mark (WB: Katakana)
    else if (!Character.isLetterOrDigit(cp)) ClsOther
    else if (cp < 0x0E00) ClsAlnum
    else {
      import Character.UnicodeScript
      UnicodeScript.of(cp) match {
        case UnicodeScript.HAN      => ClsHan
        case UnicodeScript.HIRAGANA => ClsHiragana
        case UnicodeScript.KATAKANA => ClsKatakana
        case UnicodeScript.HANGUL   => ClsHangul
        case UnicodeScript.THAI | UnicodeScript.LAO | UnicodeScript.MYANMAR |
             UnicodeScript.KHMER    => ClsSeAsian
        case _                      => ClsAlnum
      }
    }
  }

  @inline private def isCjkClass(cls: Int): Boolean =
    cls == ClsHan || cls == ClsHiragana || cls == ClsKatakana || cls == ClsHangul

  /** Raw tokenizer: lowercased token strings in order, >MaxTokenLength dropped
    * as `null` placeholders so callers can track position holes. With
    * `cjkBigrams`, maximal runs of adjacent CJK characters (Han, Hiragana,
    * Katakana, Hangul — merged across classes) emit overlapping character
    * BIGRAMS, isolated CJK characters emit alone — CJKBigramFilter with all
    * flags (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Cjk/
    * CJKBigramFilter.cs; goldens TestCJKAnalyzer.cs/TestCJKBigramFilter.cs).
    */
  private[analysis] def rawTokens(text: String,
                                  cjkBigrams: Boolean = false,
                                  spans: mutable.ArrayBuffer[Int] = null): mutable.ArrayBuffer[String] = {
    val out = new mutable.ArrayBuffer[String]()
    @inline def span(a: Int, b: Int): Unit = if (spans != null) { spans += a; spans += b }
    val n = text.length
    var i = 0
    while (i < n) {
      val cp = text.codePointAt(i)
      val cls = charClass(cp)
      if (cls == ClsOther) {
        i += Character.charCount(cp)
      } else if (cjkBigrams && isCjkClass(cls)) {
        // maximal CJK run -> overlapping bigrams (or a lone single)
        val run = new mutable.ArrayBuffer[Int]()
        val offs = new mutable.ArrayBuffer[Int]() // char offset at each run cp
        var j = i
        while (j < n && { val c = text.codePointAt(j); isCjkClass(charClass(c)) }) {
          run += text.codePointAt(j)
          offs += j
          j += Character.charCount(text.codePointAt(j))
        }
        offs += j
        if (run.length == 1) {
          val sb = new java.lang.StringBuilder()
          sb.appendCodePoint(run(0))
          out += sb.toString
          span(offs(0), offs(1))
        } else {
          var r = 0
          while (r < run.length - 1) {
            val sb = new java.lang.StringBuilder()
            sb.appendCodePoint(run(r))
            sb.appendCodePoint(run(r + 1))
            out += sb.toString
            span(offs(r), offs(r + 2))
            r += 1
          }
        }
        i = j
      } else if (cls == ClsHan || cls == ClsHiragana) {
        // single-character token (IDEOGRAPHIC / HIRAGANA)
        val sb = new java.lang.StringBuilder()
        sb.appendCodePoint(cp)
        out += sb.toString
        span(i, i + Character.charCount(cp))
        i += Character.charCount(cp)
      } else {
        val sb = new java.lang.StringBuilder()
        var j = i
        var continue = true
        while (continue && j < n) {
          val c = text.codePointAt(j)
          val cc = charClass(c)
          if (cc == cls) {
            sb.appendCodePoint(Character.toLowerCase(c))
            j += Character.charCount(c)
          } else if (isMark(c) && sb.length() > 0) {
            sb.appendCodePoint(c) // Extend: glue combining marks to the base
            j += Character.charCount(c)
          } else if (cls == ClsAlnum && isJoiner(c) && j + 1 < n &&
            charClass(text.codePointAt(j + 1)) == ClsAlnum) {
            sb.appendCodePoint(c)
            j += 1
          } else {
            continue = false
          }
        }
        out += (if (sb.length() > MaxTokenLength) null else sb.toString)
        span(i, j)
        i = j
      }
    }
    out
  }

  /** StandardAnalyzer chain: tokenize -> lowercase -> stop (nulls = holes). */
  override def tokens(text: String): mutable.ArrayBuffer[String] = {
    val raw = rawTokens(text)
    var i = 0
    while (i < raw.length) {
      if (raw(i) != null && Stopwords.contains(raw(i))) raw(i) = null
      i += 1
    }
    raw
  }

  /** Shared spans helper for chains built on the standard tokenizer: run the
    * tokenizer once with span recording, then apply `filter` per slot (null
    * result = hole; spans stay tokenizer-true).
    */
  private[analysis] def chainSpans(text: String)(filter: String => String)
      : (mutable.ArrayBuffer[String], Array[Int], Array[Int]) = {
    val sp = new mutable.ArrayBuffer[Int]()
    val raw = rawTokens(text, spans = sp)
    val starts = new Array[Int](raw.length)
    val ends = new Array[Int](raw.length)
    var i = 0
    while (i < raw.length) {
      starts(i) = sp(2 * i); ends(i) = sp(2 * i + 1)
      if (raw(i) != null) raw(i) = filter(raw(i))
      i += 1
    }
    (raw, starts, ends)
  }

  override def tokenSpans(text: String): (mutable.ArrayBuffer[String], Array[Int], Array[Int]) =
    chainSpans(text)(t => if (Stopwords.contains(t)) null else t)
}

/** CJKAnalyzer-equivalent chain: the standard tokenizer with CJK character
  * bigramming (adjacent Han/Hiragana/Katakana/Hangul runs -> overlapping
  * bigrams, isolated chars stay single), lowercase, English stopwords
  * (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Cjk/CJKAnalyzer.cs
  * = StandardTokenizer + CJKBigramFilter + LowerCaseFilter + StopFilter).
  */
object CJKAnalyzer extends TextAnalyzer {
  override def tokens(text: String): mutable.ArrayBuffer[String] = {
    val raw = Analyzer.rawTokens(text, cjkBigrams = true)
    var i = 0
    while (i < raw.length) {
      if (raw(i) != null && Analyzer.Stopwords.contains(raw(i))) raw(i) = null
      i += 1
    }
    raw
  }

  /** Bigram spans cover BOTH source characters (reference CJKBigramFilter
    * sets the composed token's offsets to first char start / second char end).
    */
  override def tokenSpans(text: String): (mutable.ArrayBuffer[String], Array[Int], Array[Int]) = {
    val sp = new mutable.ArrayBuffer[Int]()
    val raw = Analyzer.rawTokens(text, cjkBigrams = true, spans = sp)
    val starts = new Array[Int](raw.length)
    val ends = new Array[Int](raw.length)
    var i = 0
    while (i < raw.length) {
      starts(i) = sp(2 * i); ends(i) = sp(2 * i + 1)
      if (raw(i) != null && Analyzer.Stopwords.contains(raw(i))) raw(i) = null
      i += 1
    }
    (raw, starts, ends)
  }
}

/** WhitespaceAnalyzer: split on whitespace, case preserved, no filters
  * (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Core/WhitespaceTokenizer.cs).
  */
object WhitespaceAnalyzer extends TextAnalyzer {
  override def tokens(text: String): mutable.ArrayBuffer[String] = {
    val out = new mutable.ArrayBuffer[String]()
    text.split("\\s+").foreach(t => if (t.nonEmpty) out += t)
    out
  }
}

/** SimpleAnalyzer: maximal letter runs, lowercased
  * (LetterTokenizer + LowerCaseFilter,
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Core/SimpleAnalyzer.cs).
  */
object SimpleAnalyzer extends TextAnalyzer {
  override def tokens(text: String): mutable.ArrayBuffer[String] = {
    val out = new mutable.ArrayBuffer[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    val n = text.length
    while (i < n) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp)) sb.appendCodePoint(Character.toLowerCase(cp))
      else if (sb.length() > 0) { out += sb.toString; sb.setLength(0) }
      i += Character.charCount(cp)
    }
    if (sb.length() > 0) out += sb.toString
    out
  }
}

/** KeywordAnalyzer: the whole input as ONE untouched token
  * (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Core/KeywordAnalyzer.cs).
  */
object KeywordAnalyzer extends TextAnalyzer {
  override def tokens(text: String): mutable.ArrayBuffer[String] = {
    val out = new mutable.ArrayBuffer[String]()
    if (text.nonEmpty) out += text
    out
  }
}

/** EnglishAnalyzer-equivalent chain: tokenizer -> possessive strip ->
  * lowercase -> stop -> Porter stem
  * (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/En/EnglishAnalyzer.cs
  * component order; possessive filter EnglishPossessiveFilter.cs, stemmer
  * PorterStemFilter.cs:53).
  */
object EnglishAnalyzer extends TextAnalyzer {
  override def tokens(text: String): mutable.ArrayBuffer[String] = {
    val raw = Analyzer.rawTokens(text)
    var i = 0
    while (i < raw.length) {
      val t0 = raw(i)
      if (t0 != null) {
        val t1 = if (t0.endsWith("'s")) t0.dropRight(2) else t0 // possessive
        raw(i) = if (Analyzer.Stopwords.contains(t1)) null else PorterStemmer.stem(t1)
      }
      i += 1
    }
    raw
  }

  /** Spans cover the ORIGINAL surface form (incl. a stripped possessive) —
    * stemming rewrites the term only.
    */
  override def tokenSpans(text: String): (mutable.ArrayBuffer[String], Array[Int], Array[Int]) =
    Analyzer.chainSpans(text) { t0 =>
      val t1 = if (t0.endsWith("'s")) t0.dropRight(2) else t0
      if (Analyzer.Stopwords.contains(t1)) null else PorterStemmer.stem(t1)
    }
}
