package graft.analysis

import scala.collection.mutable

/** HTML char filter — HTMLStripCharFilter semantics
  * (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/CharFilter/HTMLStripCharFilter.cs;
  * goldens: Lucene.Net.Tests.Analysis.Common/Analysis/CharFilters/HTMLStripCharFilterTest.cs):
  *
  *  - BLOCK-level tags (open or close) are replaced by a newline; inline
  *    tags (a, img, span, b, ...) are removed outright, so inline markup
  *    never splits a word but block boundaries do.
  *  - <script> / <style> elements are dropped INCLUDING their content
  *    (one newline remains for the element).
  *  - Comments <!-- ... --> (and other <! / <? declarations) are removed.
  *  - Character entities decode: named HTML4 subset, &#NNN; and &#xHHH;
  *    numeric forms; `&nbsp;` becomes a plain space; an `&` that starts no
  *    entity stays literal, as does a `<` that opens no tag.
  *
  * Runs BEFORE tokenization (a CharFilter in the reference chain); compose
  * via [[HtmlStripAnalyzer]].
  */
object HtmlStrip {

  private val BlockTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "center", "col", "colgroup", "dd", "dir", "div", "dl", "dt", "fieldset",
    "figcaption", "figure", "footer", "form", "frame", "frameset", "h1",
    "h2", "h3", "h4", "h5", "h6", "head", "header", "hgroup", "hr", "html",
    "iframe", "isindex", "li", "main", "menu", "nav", "noframes", "noscript",
    "ol", "p", "pre", "script", "section", "style", "table", "tbody", "td",
    "tfoot", "th", "thead", "title", "tr", "ul")

  /** HTML4 named entities — the commonly used subset (full numeric forms
    * cover the rest). Names are case-sensitive per the HTML4 DTD.
    */
  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", // the reference maps the no-break space to a plain space
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "deg" -> "°", "plusmn" -> "±", "middot" -> "·",
    "laquo" -> "«", "raquo" -> "»", "iquest" -> "¿",
    "szlig" -> "ß", "agrave" -> "à", "aacute" -> "á",
    "acirc" -> "â", "atilde" -> "ã", "auml" -> "ä",
    "aring" -> "å", "aelig" -> "æ", "ccedil" -> "ç",
    "egrave" -> "è", "eacute" -> "é", "ecirc" -> "ê",
    "euml" -> "ë", "igrave" -> "ì", "iacute" -> "í",
    "icirc" -> "î", "iuml" -> "ï", "ntilde" -> "ñ",
    "ograve" -> "ò", "oacute" -> "ó", "ocirc" -> "ô",
    "otilde" -> "õ", "ouml" -> "ö", "oslash" -> "ø",
    "ugrave" -> "ù", "uacute" -> "ú", "ucirc" -> "û",
    "uuml" -> "ü", "yacute" -> "ý", "yuml" -> "ÿ",
    "Agrave" -> "À", "Aacute" -> "Á", "Acirc" -> "Â",
    "Atilde" -> "Ã", "Auml" -> "Ä", "Aring" -> "Å",
    "AElig" -> "Æ", "Ccedil" -> "Ç", "Egrave" -> "È",
    "Eacute" -> "É", "Ecirc" -> "Ê", "Euml" -> "Ë",
    "Igrave" -> "Ì", "Iacute" -> "Í", "Icirc" -> "Î",
    "Iuml" -> "Ï", "Ntilde" -> "Ñ", "Ograve" -> "Ò",
    "Oacute" -> "Ó", "Ocirc" -> "Ô", "Otilde" -> "Õ",
    "Ouml" -> "Ö", "Oslash" -> "Ø", "Ugrave" -> "Ù",
    "Uacute" -> "Ú", "Ucirc" -> "Û", "Uuml" -> "Ü",
    "Yacute" -> "Ý",
    "alpha" -> "α", "beta" -> "β", "gamma" -> "γ",
    "delta" -> "δ", "epsilon" -> "ε", "zeta" -> "ζ",
    "eta" -> "η", "theta" -> "θ", "iota" -> "ι",
    "kappa" -> "κ", "lambda" -> "λ", "mu" -> "μ",
    "nu" -> "ν", "xi" -> "ξ", "omicron" -> "ο",
    "pi" -> "π", "rho" -> "ρ", "sigma" -> "σ",
    "tau" -> "τ", "upsilon" -> "υ", "phi" -> "φ",
    "chi" -> "χ", "psi" -> "ψ", "omega" -> "ω",
    "Alpha" -> "Α", "Beta" -> "Β", "Gamma" -> "Γ",
    "Delta" -> "Δ", "Epsilon" -> "Ε", "Zeta" -> "Ζ",
    "Eta" -> "Η", "Theta" -> "Θ", "Iota" -> "Ι",
    "Kappa" -> "Κ", "Lambda" -> "Λ", "Mu" -> "Μ",
    "Nu" -> "Ν", "Xi" -> "Ξ", "Omicron" -> "Ο",
    "Pi" -> "Π", "Rho" -> "Ρ", "Sigma" -> "Σ",
    "Tau" -> "Τ", "Upsilon" -> "Υ", "Phi" -> "Φ",
    "Chi" -> "Χ", "Psi" -> "Ψ", "Omega" -> "Ω",
    "hellip" -> "…", "mdash" -> "—", "ndash" -> "–",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "bull" -> "•", "dagger" -> "†",
    "euro" -> "€", "pound" -> "£", "cent" -> "¢",
    "yen" -> "¥", "sect" -> "§", "para" -> "¶",
    "times" -> "×", "divide" -> "÷", "frac12" -> "½",
    "frac14" -> "¼", "frac34" -> "¾", "sup1" -> "¹",
    "sup2" -> "²", "sup3" -> "³", "micro" -> "µ",
    "shy" -> "­", "iexcl" -> "¡", "curren" -> "¤",
    "brvbar" -> "¦", "uml" -> "¨", "ordf" -> "ª",
    "not" -> "¬", "macr" -> "¯", "acute" -> "´",
    "cedil" -> "¸", "ordm" -> "º")

  /** Strip markup from `html`, decoding entities. */
  def strip(html: String): String = {
    val out = new java.lang.StringBuilder(html.length)
    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        i = handleTag(html, i, out)
      } else if (c == '&') {
        i = handleEntity(html, i, out)
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** Parse from the '<' at `i`; append the replacement; return the next
    * index. A '<' that opens nothing valid is emitted literally.
    */
  private def handleTag(s: String, i: Int, out: java.lang.StringBuilder): Int = {
    val n = s.length
    if (i + 1 >= n) { out.append('<'); return i + 1 }
    if (s.startsWith("<!--", i)) {
      val end = s.indexOf("-->", i + 4)
      return if (end < 0) n else end + 3
    }
    val c1 = s.charAt(i + 1)
    if (c1 == '!' || c1 == '?') {
      // declaration / processing instruction
      val end = s.indexOf('>', i + 1)
      return if (end < 0) n else end + 1
    }
    val closing = c1 == '/'
    val nameStart = if (closing) i + 2 else i + 1
    var j = nameStart
    while (j < n && Character.isLetterOrDigit(s.charAt(j))) j += 1
    if (j == nameStart) { out.append('<'); return i + 1 } // not a tag
    val name = s.substring(nameStart, j).toLowerCase
    // scan to the tag's '>' honoring quoted attribute values
    var q = 0.toChar
    var end = -1
    var k = j
    while (end < 0 && k < n) {
      val ck = s.charAt(k)
      if (q != 0) { if (ck == q) q = 0.toChar }
      else if (ck == '"' || ck == '\'') q = ck
      else if (ck == '>') end = k
      k += 1
    }
    if (end < 0) return n
    var next = end + 1
    val selfClosed = end > i && s.charAt(end - 1) == '/'
    if (!closing && !selfClosed && (name == "script" || name == "style")) {
      // drop the element content through its closing tag
      val close = s.toLowerCase.indexOf(s"</$name", next)
      next =
        if (close < 0) n
        else {
          val gt = s.indexOf('>', close)
          if (gt < 0) n else gt + 1
        }
    }
    if (BlockTags.contains(name)) out.append('\n')
    next
  }

  /** Parse from the '&' at `i`; append the decoded entity or the literal
    * '&'; return the next index.
    */
  private def handleEntity(s: String, i: Int, out: java.lang.StringBuilder): Int = {
    val n = s.length
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 12) { out.append('&'); return i + 1 }
    val body = s.substring(i + 1, semi)
    if (body.startsWith("#")) {
      val num = body.substring(1)
      val cp =
        try {
          if (num.startsWith("x") || num.startsWith("X"))
            Integer.parseInt(num.substring(1), 16)
          else Integer.parseInt(num)
        } catch { case _: NumberFormatException => -1 }
      if (cp >= 0 && cp <= 0x10FFFF && Character.isValidCodePoint(cp)) {
        out.appendCodePoint(cp)
        semi + 1
      } else { out.append('&'); i + 1 }
    } else Entities.get(body) match {
      case Some(repl) => out.append(repl); semi + 1
      case None       => out.append('&'); i + 1
    }
  }
}

/** Analyzer combinator: strip HTML markup, then run `inner` — the
  * CharFilter position in the reference chain (CharFilter -> Tokenizer ->
  * TokenFilters).
  */
final class HtmlStripAnalyzer(inner: TextAnalyzer) extends TextAnalyzer {
  override def tokens(text: String): mutable.ArrayBuffer[String] =
    inner.tokens(HtmlStrip.strip(text))
}
