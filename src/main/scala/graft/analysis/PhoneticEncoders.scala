package graft.analysis

/** The reference's remaining commons-codec phonetic encoders beyond
  * American Soundex ([[TokenFilters.soundex]]) and [[DoubleMetaphone]]:
  *
  *  - NYSIIS (New York State Identification and Intelligence System, 1970;
  *    reference /root/reference/src/Lucene.Net.Analysis.Phonetic/Language/Nysiis.cs)
  *  - Refined Soundex (commons-codec variant: no length cap, vowels as
  *    separators, first letter kept;
  *    reference .../Language/RefinedSoundex.cs:34 US_ENGLISH mapping)
  *  - Caverphone 2.0 (David Hood, University of Otago, 2004 — the published
  *    revisited rule pipeline; reference .../Language/Caverphone2.cs:47)
  *  - Cologne Phonetic (Postel 1969 Kölner Phonetik;
  *    reference .../Language/ColognePhonetic.cs)
  *  - Match Rating Approach encoder + comparator (Moore et al. 1977;
  *    reference .../Language/MatchRatingApproachEncoder.cs)
  *
  * All of these are pure per-term functions, so at scale they run inside the
  * analyzer chain or a `mapPartitions` with zero shuffle impact; each is
  * golden-tested in PhoneticSpec against the reference test suites' vectors
  * and hash-gated (text_phonetic).
  */
object PhoneticEncoders {

  private def clean(s: String): String = {
    if (s == null) return ""
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) sb.append(Character.toUpperCase(c))
      i += 1
    }
    sb.toString
  }

  private def isVowel(c: Char): Boolean =
    c == 'A' || c == 'E' || c == 'I' || c == 'O' || c == 'U'

  // ---------------------------------------------------------------- NYSIIS

  /** One step of the NYSIIS body transcription. Operates on the 4-char
    * window [prev, curr, next, afterNext]; returns the replacement for the
    * window starting at curr (1..3 chars, written back over the input so
    * later windows see transcribed text — the algorithm is defined over the
    * partially-rewritten string).
    */
  private def nysiisStep(prev: Char, curr: Char, next: Char, aNext: Char): Array[Char] =
    curr match {
      case 'E' if next == 'V'                            => Array('A', 'F')
      case v if isVowel(v)                               => Array('A')
      case 'Q'                                           => Array('G')
      case 'Z'                                           => Array('S')
      case 'M'                                           => Array('N')
      case 'K'                                           => if (next == 'N') Array('N', 'N') else Array('C')
      case 'S' if next == 'C' && aNext == 'H'            => Array('S', 'S', 'S')
      case 'P' if next == 'H'                            => Array('F', 'F')
      case 'H' if !isVowel(prev) || !isVowel(next)       => Array(prev)
      case 'W' if isVowel(prev)                          => Array(prev)
      case other                                         => Array(other)
    }

  /** NYSIIS code. `strict = true` caps the key at the original 6 characters
    * (the 1970 scheme); `strict = false` keeps the full-length key
    * (commons-codec's relaxed mode).
    */
  def nysiis(term: String, strict: Boolean = true): String = {
    var t = clean(term)
    if (t.isEmpty) return t
    // Head rewrites, applied in sequence (each anchored at the start).
    if (t.startsWith("MAC")) t = "MCC" + t.substring(3)
    if (t.startsWith("KN")) t = "NN" + t.substring(2)
    if (t.startsWith("K")) t = "C" + t.substring(1)
    if (t.startsWith("PH") || t.startsWith("PF")) t = "FF" + t.substring(2)
    if (t.startsWith("SCH")) t = "SSS" + t.substring(3)
    // Tail rewrites.
    if (t.endsWith("EE") || t.endsWith("IE")) t = t.substring(0, t.length - 2) + "Y"
    if (t.endsWith("DT") || t.endsWith("RT") || t.endsWith("RD") ||
        t.endsWith("NT") || t.endsWith("ND")) t = t.substring(0, t.length - 2) + "D"

    val chars = t.toCharArray
    val key = new StringBuilder(chars.length)
    key.append(chars(0))
    var i = 1
    while (i < chars.length) {
      val next = if (i < chars.length - 1) chars(i + 1) else ' '
      val aNext = if (i < chars.length - 2) chars(i + 2) else ' '
      val out = nysiisStep(chars(i - 1), chars(i), next, aNext)
      // Multi-char outputs only fire when the window chars they overwrite
      // exist (NN needs next, SSS needs next+afterNext).
      System.arraycopy(out, 0, chars, i, out.length)
      if (chars(i) != chars(i - 1)) key.append(chars(i)) // collapse repeats
      i += 1
    }

    // Trailing trims: S, then the A of a final AY, then a final A.
    if (key.length > 1 && key.charAt(key.length - 1) == 'S') key.length_=(key.length - 1)
    if (key.length > 2 && key.charAt(key.length - 2) == 'A' && key.charAt(key.length - 1) == 'Y')
      key.deleteCharAt(key.length - 2)
    if (key.length > 1 && key.charAt(key.length - 1) == 'A') key.length_=(key.length - 1)

    val full = key.toString
    if (strict) full.substring(0, math.min(6, full.length)) else full
  }

  // ------------------------------------------------------- Refined Soundex

  /** commons-codec US-English refined-soundex letter codes (A..Z). */
  private final val RefinedMap = "01360240043788015936020505"

  /** Refined Soundex: first letter verbatim, then the code of EVERY letter
    * (vowels are 0-coded separators), adjacent equal codes collapsed, no
    * length cap and no trailing-zero trim — higher-resolution keys than
    * classic soundex ("testing" -> T6036084).
    */
  def refinedSoundex(term: String): String = {
    val t = clean(term)
    if (t.isEmpty) return t
    val sb = new StringBuilder(t.length + 1)
    sb.append(t.charAt(0))
    var last = '*'
    var i = 0
    while (i < t.length) {
      val code = RefinedMap.charAt(t.charAt(i) - 'A')
      if (code != last) { sb.append(code); last = code }
      i += 1
    }
    sb.toString
  }

  // ---------------------------------------------------------- Caverphone 2

  /** The published Caverphone 2.0 rewrite pipeline: each (regex,
    * replacement) applied globally, in order, over the lowercased
    * letters-only input. '2' marks a consonant to drop, '3' a vowel to drop
    * (a final vowel survives as 'A'); uppercase letters are final output.
    */
  private final val CaverRules: Array[(java.util.regex.Pattern, String)] = Array(
    "e$" -> "", "^cough" -> "cou2f", "^rough" -> "rou2f", "^tough" -> "tou2f",
    "^enough" -> "enou2f", "^trough" -> "trou2f", "^gn" -> "2n", "mb$" -> "m2",
    "cq" -> "2q", "ci" -> "si", "ce" -> "se", "cy" -> "sy", "tch" -> "2ch",
    "c" -> "k", "q" -> "k", "x" -> "k", "v" -> "f", "dg" -> "2g",
    "tio" -> "sio", "tia" -> "sia", "d" -> "t", "ph" -> "fh", "b" -> "p",
    "sh" -> "s2", "z" -> "s", "^[aeiou]" -> "A", "[aeiou]" -> "3",
    "j" -> "y", "^y3" -> "Y3", "^y" -> "A", "y" -> "3", "3gh3" -> "3kh3",
    "gh" -> "22", "g" -> "k", "s+" -> "S", "t+" -> "T", "p+" -> "P",
    "k+" -> "K", "f+" -> "F", "m+" -> "M", "n+" -> "N", "w3" -> "W3",
    "wh3" -> "Wh3", "w$" -> "3", "w" -> "2", "^h" -> "A", "h" -> "2",
    "r3" -> "R3", "r$" -> "3", "r" -> "2", "l3" -> "L3", "l$" -> "3",
    "l" -> "2", "2" -> "", "3$" -> "A", "3" -> ""
  ).map { case (p, r) => (java.util.regex.Pattern.compile(p), r) }

  private final val CaverPad = "1111111111"

  /** Caverphone 2.0 code: always exactly 10 characters, '1'-padded. */
  def caverphone2(term: String): String = {
    if (term == null) return CaverPad
    var t = term.toLowerCase(java.util.Locale.ENGLISH).replaceAll("[^a-z]", "")
    var i = 0
    while (i < CaverRules.length) {
      val (p, r) = CaverRules(i)
      t = p.matcher(t).replaceAll(r)
      i += 1
    }
    (t + CaverPad).substring(0, CaverPad.length)
  }

  // ------------------------------------------------------- Kölner Phonetik

  /** Cologne Phonetic (Postel 1969, the German-language soundex; reference
    * .../Language/ColognePhonetic.cs): context-sensitive digit codes 0-8,
    * adjacent-duplicate collapse, '0' kept only word-initially. 'X' expands
    * to "48" unless preceded by C/K/Q (then it is the 8 after their 4);
    * 'H' is transparent; Ä/Ö/Ü/ß pre-map to A/O/U/S.
    */
  def cologne(term: String): String = {
    if (term == null) return ""
    // char-wise uppercase (ß stays ß — .NET ToUpper semantics) + umlaut map
    val in = new java.util.ArrayDeque[Character](term.length + 4)
    term.foreach { c0 =>
      Character.toUpperCase(c0) match {
        case 'Ä' => in.addLast('A')
        case 'Ö' => in.addLast('O')
        case 'Ü' => in.addLast('U')
        case 'ß' => in.addLast('S')
        case u        => in.addLast(u)
      }
    }
    val out = new StringBuilder(term.length)
    var lastChar = '-'
    var lastCode = '/'
    while (!in.isEmpty) {
      val chr: Char = in.pollFirst()
      val next: Char = if (in.isEmpty) '-' else in.peekFirst()
      var skip = false
      val code: Char =
        if ("AEIJOUY".indexOf(chr) >= 0) '0'
        else if (chr == 'H' || chr < 'A' || chr > 'Z') {
          if (lastCode == '/') { skip = true; ' ' } else '-'
        }
        else if (chr == 'B' || (chr == 'P' && next != 'H')) '1'
        else if ((chr == 'D' || chr == 'T') && "SCZ".indexOf(next) < 0) '2'
        else if ("WFPV".indexOf(chr) >= 0) '3'
        else if ("GKQ".indexOf(chr) >= 0) '4'
        else if (chr == 'X' && "CKQ".indexOf(lastChar) < 0) { in.addFirst('S'); '4' }
        else if (chr == 'S' || chr == 'Z') '8'
        else if (chr == 'C') {
          if (lastCode == '/') { if ("AHKLOQRUX".indexOf(next) >= 0) '4' else '8' }
          else if ("SZ".indexOf(lastChar) >= 0 || "AHOUKQX".indexOf(next) < 0) '8'
          else '4'
        }
        else if (chr == 'T' || chr == 'D' || chr == 'X') '8'
        else if (chr == 'R') '7'
        else if (chr == 'L') '5'
        else if (chr == 'M' || chr == 'N') '6'
        else chr
      if (!skip) {
        if (code != '-' &&
            ((lastCode != code && (code != '0' || lastCode == '/')) ||
             code < '0' || code > '8')) out.append(code)
        lastChar = chr
        lastCode = code
      }
    }
    out.toString
  }

  // ------------------------------------------- Match Rating Approach (MRA)

  /** Western Airlines' Match Rating Approach (Moore et al. 1977; reference
    * .../Language/MatchRatingApproachEncoder.cs): both a name ENCODER
    * ([[mra]]: strip vowels + double consonants, keep first-3 + last-3) and
    * a name COMPARATOR ([[mraEquals]]: cross-wise character elimination
    * scored against a length-dependent minimum rating).
    */
  private final val MraPlain =
    "AaEeIiOoUu" + "AaEeIiOoUuYy" + "AaEeIiOoUuYy" + "AaOoNn" +
    "AaEeIiOoUuYy" + "Aa" + "Cc" + "OoUu"
  private final val MraUnicode =
    "ÀàÈèÌìÒòÙù" +
    "ÁáÉéÍíÓóÚúÝý" +
    "ÂâÊêÎîÔôÛûŶŷ" +
    "ÃãÕõÑñ" +
    "ÄäËëÏïÖöÜüŸÿ" +
    "Åå" + "Çç" + "ŐőŰű"

  private[graft] def mraRemoveAccents(s: String): String =
    if (s == null) null
    else s.map { c =>
      val p = MraUnicode.indexOf(c)
      if (p >= 0) MraPlain.charAt(p) else c
    }

  private def mraClean(name: String): String =
    mraRemoveAccents(
      name.toUpperCase(java.util.Locale.ENGLISH)
        .replaceAll("\\-|[&]|\\'|\\.|[\\,]", ""))
      .replaceAll("\\s+", "")

  private[graft] def mraRemoveVowels(name: String): String = {
    if (name.isEmpty) return name
    val first = name.substring(0, 1)
    val v = name.replaceAll("A|E|I|O|U", "").replaceAll("\\s{2,}\\b", " ")
    if ("AEIOU".contains(first.toUpperCase(java.util.Locale.ENGLISH))) first + v else v
  }

  private[graft] def mraRemoveDoubleConsonants(name: String): String = {
    var r = name.toUpperCase(java.util.Locale.ENGLISH)
    "BCDFGHJKLMNPQRSTVWXYZ".foreach { c =>
      val dc = s"$c$c"
      if (r.contains(dc)) r = r.replace(dc, c.toString)
    }
    r
  }

  private[graft] def mraFirst3Last3(name: String): String =
    if (name.length > 6) name.substring(0, 3) + name.substring(name.length - 3)
    else name

  /** MRA encoding ("HARPER" -> "HRPR", "Smith" -> "SMTH"). */
  def mra(name: String): String = {
    if (name == null || name.isEmpty || name == " " || name.length == 1) return ""
    val cleaned = mraClean(name)
    if (cleaned.isEmpty) return ""
    mraFirst3Last3(mraRemoveDoubleConsonants(mraRemoveVowels(cleaned)))
  }

  private[graft] def mraMinRating(sumLength: Int): Int =
    if (sumLength <= 4) 5
    else if (sumLength <= 7) 4
    else if (sumLength <= 11) 3
    else if (sumLength == 12) 2
    else 1

  private[graft] def mraCount(n1: String, n2: String): Int = {
    val a = n1.toCharArray; val b = n2.toCharArray
    val e1 = n1.length - 1; val e2 = n2.length - 1
    var i = 0
    while (i < a.length && i <= e2) {
      if (n1.charAt(i) == n2.charAt(i)) { a(i) = ' '; b(i) = ' ' }
      if (n1.charAt(e1 - i) == n2.charAt(e2 - i)) { a(e1 - i) = ' '; b(e2 - i) = ' ' }
      i += 1
    }
    val sa = new String(a).replaceAll("\\s+", "")
    val sb = new String(b).replaceAll("\\s+", "")
    if (sa.length > sb.length) math.abs(6 - sa.length) else math.abs(6 - sb.length)
  }

  /** MRA name comparison: true when the similarity rating meets the
    * length-dependent minimum ("Catherine" ~ "Kathryn", "Smith" ~ "Smyth").
    */
  def mraEquals(name1: String, name2: String): Boolean = {
    if (name1 == null || name1.isEmpty || name1 == " ") return false
    if (name2 == null || name2.isEmpty || name2 == " ") return false
    if (name1.length == 1 || name2.length == 1) return false
    if (name1.equalsIgnoreCase(name2)) return true
    val c1 = mraFirst3Last3(mraRemoveDoubleConsonants(mraRemoveVowels(mraClean(name1))))
    val c2 = mraFirst3Last3(mraRemoveDoubleConsonants(mraRemoveVowels(mraClean(name2))))
    if (math.abs(c1.length - c2.length) >= 3) return false
    mraCount(c1, c2) >= mraMinRating(c1.length + c2.length)
  }
}
