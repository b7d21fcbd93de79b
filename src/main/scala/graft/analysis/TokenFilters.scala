package graft.analysis

/** Stand-alone token-stream combinators — the functional analogs of the
  * reference's most-used TokenFilters beyond the two built-in chains. Each
  * is a pure `Array[String] -> Array[String]` (or per-term) transform
  * composable into a [[TextAnalyzer]].
  */
object TokenFilters {

  /** Word shingles (token n-grams) of sizes minN..maxN over consecutive
    * emitted tokens, original unigrams included when `keepUnigrams`
    * (ShingleFilter semantics,
    * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Shingle/ShingleFilter.cs:44).
    */
  def shingles(terms: Array[String], minN: Int, maxN: Int,
               sep: String = " ", keepUnigrams: Boolean = true): Array[String] = {
    require(minN >= 2 && maxN >= minN)
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    terms.indices.foreach { i =>
      if (keepUnigrams) out += terms(i)
      var n = minN
      while (n <= maxN && i + n <= terms.length) {
        out += terms.slice(i, i + n).mkString(sep)
        n += 1
      }
    }
    out.toArray
  }

  /** Character n-grams of one term, sizes minN..maxN, front-to-back order
    * (NGramTokenFilter,
    * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/NGram/NGramTokenFilter.cs:51).
    */
  def ngrams(term: String, minN: Int, maxN: Int): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var n = minN
    while (n <= maxN) {
      var i = 0
      while (i + n <= term.length) { out += term.substring(i, i + n); i += 1 }
      n += 1
    }
    out.toArray
  }

  /** Front-edge n-grams (EdgeNGramTokenFilter,
    * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/NGram/EdgeNGramTokenFilter.cs:37).
    */
  def edgeNgrams(term: String, minN: Int, maxN: Int): Array[String] =
    (minN to math.min(maxN, term.length)).map(term.substring(0, _)).toArray

  /** Map-driven single-token synonym expansion, originals kept
    * (SynonymFilter with keepOrig,
    * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Synonym/SynonymFilter.cs:99 —
    * without the FST multi-word machinery; synonyms share the original's
    * position, which a posIncr-aware consumer models as duplicates at one
    * ordinal).
    */
  def synonyms(terms: Array[String], map: Map[String, Seq[String]]): Array[String] =
    terms.flatMap(t => t +: map.getOrElse(t, Nil))

  /** Latin-1 supplement / Latin-extended-A folding to ASCII
    * (ASCIIFoldingFilter subset,
    * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Miscellaneous/ASCIIFoldingFilter.cs:56):
    * NFD-decompose and strip combining marks, plus the common non-decomposing
    * letters.
    */
  def asciiFold(term: String): String = {
    val decomposed = java.text.Normalizer.normalize(term, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}+", "")
    decomposed
      .replace("æ", "ae").replace("Æ", "AE")
      .replace("ø", "o").replace("Ø", "O")
      .replace("ß", "ss").replace("đ", "d").replace("Đ", "D")
      .replace("þ", "th").replace("Þ", "TH")
      .replace("œ", "oe").replace("Œ", "OE")
      .replace("ł", "l").replace("Ł", "L")
  }
}
