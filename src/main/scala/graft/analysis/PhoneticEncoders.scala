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

  // --------------------------------------------- Daitch-Mokotoff Soundex

  /** The published Daitch-Mokotoff rule table (commons-codec dmrules.txt as
    * shipped by the reference at .../Language/dmrules.txt): for each pattern,
    * (replacement at word start, before a vowel, otherwise); '|' separates
    * branching alternatives.
    */
  private final val DmRuleTable: Array[(String, String, String, String)] = Array(
    ("a","0","",""), ("e","0","",""), ("i","0","",""),
    ("o","0","",""), ("u","0","",""), ("b","7","7","7"),
    ("d","3","3","3"), ("f","7","7","7"), ("g","5","5","5"),
    ("h","5","5",""), ("k","5","5","5"), ("l","8","8","8"),
    ("m","6","6","6"), ("n","6","6","6"), ("p","7","7","7"),
    ("q","5","5","5"), ("r","9","9","9"), ("s","4","4","4"),
    ("t","3","3","3"), ("v","7","7","7"), ("w","7","7","7"),
    ("x","5","54","54"), ("y","1","",""), ("z","4","4","4"),
    ("ţ","3|4","3|4","3|4"), ("ț","3|4","3|4","3|4"), ("ę","","","|6"),
    ("ą","","","|6"), ("schtsch","2","4","4"), ("schtsh","2","4","4"),
    ("schtch","2","4","4"), ("shtch","2","4","4"), ("shtsh","2","4","4"),
    ("stsch","2","4","4"), ("ttsch","4","4","4"), ("zhdzh","2","4","4"),
    ("shch","2","4","4"), ("scht","2","43","43"), ("schd","2","43","43"),
    ("stch","2","4","4"), ("strz","2","4","4"), ("strs","2","4","4"),
    ("stsh","2","4","4"), ("szcz","2","4","4"), ("szcs","2","4","4"),
    ("ttch","4","4","4"), ("tsch","4","4","4"), ("ttsz","4","4","4"),
    ("zdzh","2","4","4"), ("zsch","4","4","4"), ("chs","5","54","54"),
    ("csz","4","4","4"), ("czs","4","4","4"), ("drz","4","4","4"),
    ("drs","4","4","4"), ("dsh","4","4","4"), ("dsz","4","4","4"),
    ("dzh","4","4","4"), ("dzs","4","4","4"), ("sch","4","4","4"),
    ("sht","2","43","43"), ("szt","2","43","43"), ("shd","2","43","43"),
    ("szd","2","43","43"), ("tch","4","4","4"), ("trz","4","4","4"),
    ("trs","4","4","4"), ("tsh","4","4","4"), ("tts","4","4","4"),
    ("ttz","4","4","4"), ("tzs","4","4","4"), ("tsz","4","4","4"),
    ("zdz","2","4","4"), ("zhd","2","43","43"), ("zsh","4","4","4"),
    ("ai","0","1",""), ("aj","0","1",""), ("ay","0","1",""),
    ("au","0","7",""), ("cz","4","4","4"), ("cs","4","4","4"),
    ("ds","4","4","4"), ("dz","4","4","4"), ("dt","3","3","3"),
    ("ei","0","1",""), ("ej","0","1",""), ("ey","0","1",""),
    ("eu","1","1",""), ("fb","7","7","7"), ("ia","1","",""),
    ("ie","1","",""), ("io","1","",""), ("iu","1","",""),
    ("ks","5","54","54"), ("kh","5","5","5"), ("mn","66","66","66"),
    ("nm","66","66","66"), ("oi","0","1",""), ("oj","0","1",""),
    ("oy","0","1",""), ("pf","7","7","7"), ("ph","7","7","7"),
    ("sh","4","4","4"), ("sc","2","4","4"), ("st","2","43","43"),
    ("sd","2","43","43"), ("sz","4","4","4"), ("th","3","3","3"),
    ("ts","4","4","4"), ("tc","4","4","4"), ("tz","4","4","4"),
    ("ui","0","1",""), ("uj","0","1",""), ("uy","0","1",""),
    ("ue","0","1",""), ("zd","2","43","43"), ("zh","4","4","4"),
    ("zs","4","4","4"), ("c","4|5","4|5","4|5"), ("ch","4|5","4|5","4|5"),
    ("ck","5|45","5|45","5|45"), ("rs","4|94","4|94","4|94"), ("rz","4|94","4|94","4|94"),
    ("j","1|4","|4","|4")
)

  private final val DmFoldings: Map[Char, Char] = Map('ß'->'s', 'à'->'a', 'á'->'a', 'â'->'a', 'ã'->'a', 'ä'->'a', 'å'->'a', 'æ'->'a', 'ç'->'c', 'è'->'e', 'é'->'e', 'ê'->'e', 'ë'->'e', 'ì'->'i', 'í'->'i', 'î'->'i', 'ï'->'i', 'ð'->'d', 'ñ'->'n', 'ò'->'o', 'ó'->'o', 'ô'->'o', 'õ'->'o', 'ö'->'o', 'ø'->'o', 'ù'->'u', 'ú'->'u', 'û'->'u', 'ý'->'y', 'þ'->'b', 'ÿ'->'y', 'ć'->'c', 'ł'->'l', 'ś'->'s', 'ż'->'z', 'ź'->'z')

  /** Rules grouped by first char, longest pattern first (the matcher takes
    * the first — i.e. longest — match at each position).
    */
  private final val DmRules: Map[Char, Array[(String, Array[String], Array[String], Array[String])]] =
    DmRuleTable
      .map { case (p, s, v, o) =>
        // split keeps empty alternatives: "|6" -> ["", "6"]
        def alts(x: String) = x.split("\\|", -1)
        (p, alts(s), alts(v), alts(o))
      }
      .groupBy(_._1.charAt(0))
      .map { case (c, rs) => c -> rs.sortBy(-_._1.length) }

  private final val DmMaxLength = 6

  /** One accumulating code branch: capped at 6 digits, with the adjacent-
    * duplicate rule (a replacement equal to the tail of the previous one is
    * dropped unless forced by an m-n / n-m boundary).
    */
  private final class DmBranch(val sb: java.lang.StringBuilder, var lastRepl: String) {
    def fork(): DmBranch = new DmBranch(new java.lang.StringBuilder(sb), lastRepl)
    def add(replacement: String, force: Boolean): Unit = {
      val append = lastRepl == null || !lastRepl.endsWith(replacement) || force
      if (append && sb.length < DmMaxLength) {
        sb.append(replacement)
        if (sb.length > DmMaxLength) sb.setLength(DmMaxLength)
      }
      lastRepl = replacement
    }
    def finished: String = {
      while (sb.length < DmMaxLength) sb.append('0')
      sb.toString
    }
  }

  private def dmBranches(term: String, branching: Boolean): Array[String] = {
    // cleanup: drop whitespace, lowercase, apply ASCII foldings
    val in = {
      val sb = new java.lang.StringBuilder(term.length)
      term.foreach { c0 =>
        if (!Character.isWhitespace(c0)) {
          val lc = Character.toLowerCase(c0)
          sb.append(DmFoldings.getOrElse(lc, lc))
        }
      }
      sb.toString
    }
    var branches = scala.collection.mutable.ArrayBuffer(
      new DmBranch(new java.lang.StringBuilder, null))
    var lastChar = '\u0000'
    var index = 0
    while (index < in.length) {
      val ch = in.charAt(index)
      DmRules.get(ch) match {
        case None => // unmapped char: skip without updating lastChar
        case Some(rules) =>
          val context = in.substring(index)
          val hit = rules.find(r => context.startsWith(r._1))
          hit.foreach { case (pat, atStart, beforeVowel, default) =>
            val repls =
              if (lastChar == '\u0000') atStart
              else {
                val nextIsVowel = pat.length < context.length &&
                  "aeiou".indexOf(context.charAt(pat.length)) >= 0
                if (nextIsVowel) beforeVowel else default
              }
            val force = (lastChar == 'm' && ch == 'n') || (lastChar == 'n' && ch == 'm')
            if (branching) {
              // fork per alternative; dedupe by code content (branches can
              // also converge on the 6-digit cap with a single alternative)
              val next = scala.collection.mutable.ArrayBuffer.empty[DmBranch]
              val seen = scala.collection.mutable.HashSet.empty[String]
              branches.foreach { b =>
                repls.foreach { r =>
                  val nb = if (repls.length > 1) b.fork() else b
                  nb.add(r, force)
                  if (seen.add(nb.sb.toString)) next += nb
                }
              }
              branches = next
            } else {
              branches.foreach(_.add(repls(0), force))
            }
            index += pat.length - 1
          }
          lastChar = ch
      }
      index += 1
    }
    branches.map(_.finished).toArray
  }

  /** Daitch-Mokotoff Soundex (Mokotoff 1985, the Jewish-genealogy soundex;
    * reference .../Language/DaitchMokotoffSoundex.cs over dmrules.txt):
    * branching form — all 6-digit codes joined by '|'
    * ("AUERBACH" -> "097400|097500").
    */
  def daitchMokotoff(term: String): String =
    if (term == null) "" else dmBranches(term, branching = true).mkString("|")

  /** Non-branching Daitch-Mokotoff: the single code taking the first
    * alternative of every branching rule ("AUERBACH" -> "097400").
    */
  def daitchMokotoffEncode(term: String): String =
    if (term == null) "" else dmBranches(term, branching = false)(0)

  // ------------------------------------------------------------ Caverphone 1

  /** The original Caverphone 1.0 pipeline (Caversham Project, Otago, 2002
    * spec ctp060902; reference .../Language/Caverphone1.cs): same
    * rewrite-pipeline shape as [[caverphone2]] but no trailing-e drop, no
    * trough/final-vowel rules, 'wy'/'why'/'ry'/'ly' variants, j/y handled
    * late, and a SIX-character '1'-padded code.
    */
  private final val Caver1Rules: Array[(java.util.regex.Pattern, String)] = Array(
    "^cough" -> "cou2f", "^rough" -> "rou2f", "^tough" -> "tou2f",
    "^enough" -> "enou2f", "^gn" -> "2n", "mb$" -> "m2",
    "cq" -> "2q", "ci" -> "si", "ce" -> "se", "cy" -> "sy", "tch" -> "2ch",
    "c" -> "k", "q" -> "k", "x" -> "k", "v" -> "f", "dg" -> "2g",
    "tio" -> "sio", "tia" -> "sia", "d" -> "t", "ph" -> "fh", "b" -> "p",
    "sh" -> "s2", "z" -> "s", "^[aeiou]" -> "A", "[aeiou]" -> "3",
    "3gh3" -> "3kh3", "gh" -> "22", "g" -> "k", "s+" -> "S", "t+" -> "T",
    "p+" -> "P", "k+" -> "K", "f+" -> "F", "m+" -> "M", "n+" -> "N",
    "w3" -> "W3", "wy" -> "Wy", "wh3" -> "Wh3", "why" -> "Why", "w" -> "2",
    "^h" -> "A", "h" -> "2", "r3" -> "R3", "ry" -> "Ry", "r" -> "2",
    "l3" -> "L3", "ly" -> "Ly", "l" -> "2", "j" -> "y", "y3" -> "Y3",
    "y" -> "2", "2" -> "", "3" -> ""
  ).map { case (p, r) => (java.util.regex.Pattern.compile(p), r) }

  private final val Caver1Pad = "111111"

  /** Caverphone 1.0 code: always exactly 6 characters, '1'-padded
    * ("David" -> "TFT111", "Whittle" -> "WTL111").
    */
  def caverphone1(term: String): String = {
    if (term == null) return Caver1Pad
    var t = term.toLowerCase(java.util.Locale.ENGLISH).replaceAll("[^a-z]", "")
    var i = 0
    while (i < Caver1Rules.length) {
      val (p, r) = Caver1Rules(i)
      t = p.matcher(t).replaceAll(r)
      i += 1
    }
    (t + Caver1Pad).substring(0, Caver1Pad.length)
  }

  // --------------------------------------------------------------- Metaphone

  private final val MetaFrontV = "EIY"   // letters that soften a preceding C/G
  private final val MetaVarson = "CSPTG" // letters that swallow a following H

  /** Original Metaphone (Lawrence Philips, "Hanging on the Metaphone",
    * Computer Language Dec. 1990; commons-codec rule set as carried by the
    * reference's .../Language/Metaphone.cs — NOT the PHP/Perl variants):
    * 4-char cap, TH->0, X->KS, CIA/SH/SIO/SIA/TIA/TIO->X, soft C/G->S/J,
    * silent initial KN/GN/PN/WR/AE, silent GH/MB$/TCH-T. Input is expected
    * to be a single A-Z word (the analyzer chain guarantees that).
    */
  def metaphone(term: String, maxCodeLen: Int = 4): String = {
    if (term == null || term.isEmpty) return ""
    if (term.length == 1) return term.toUpperCase(java.util.Locale.ENGLISH)
    val up = term.toUpperCase(java.util.Locale.ENGLISH)

    // initial-pair exceptions
    val w: String = up.charAt(0) match {
      case 'K' | 'G' | 'P' => if (up.charAt(1) == 'N') up.substring(1) else up
      case 'A'             => if (up.charAt(1) == 'E') up.substring(1) else up
      case 'W' =>
        if (up.charAt(1) == 'R') up.substring(1)              // WR -> R
        else if (up.charAt(1) == 'H') "W" + up.substring(2)   // WH -> W
        else up
      case 'X'             => "S" + up.substring(1)           // initial X -> S
      case _               => up
    }

    val sz = w.length
    def at(i: Int): Char = if (i >= 0 && i < sz) w.charAt(i) else ' '
    def vowelAt(i: Int): Boolean = isVowel(at(i))
    def last(i: Int): Boolean = i + 1 == sz
    def region(i: Int, pat: String): Boolean =
      i + pat.length <= sz && w.regionMatches(i, pat, 0, pat.length)

    val code = new StringBuilder(maxCodeLen + 2)
    var n = 0
    while (code.length < maxCodeLen && n < sz) {
      val c = at(n)
      if (c != 'C' && n > 0 && at(n - 1) == c) n += 1 // dedupe (except C)
      else {
        c match {
          case 'A' | 'E' | 'I' | 'O' | 'U' =>
            if (n == 0) code.append(c) // vowels only lead
          case 'B' =>
            if (!(at(n - 1) == 'M' && last(n))) code.append('B') // silent MB$
          case 'C' =>
            if (at(n - 1) == 'S' && !last(n) && MetaFrontV.indexOf(at(n + 1)) >= 0) ()
            else if (region(n, "CIA")) code.append('X')
            else if (!last(n) && MetaFrontV.indexOf(at(n + 1)) >= 0) code.append('S')
            else if (at(n - 1) == 'S' && at(n + 1) == 'H') code.append('K') // SCH
            else if (at(n + 1) == 'H')
              code.append(if (n == 0 && sz >= 3 && vowelAt(2)) 'K' else 'X')
            else code.append('K')
          case 'D' =>
            if (n + 2 < sz && at(n + 1) == 'G' && MetaFrontV.indexOf(at(n + 2)) >= 0) {
              code.append('J'); n += 2
            } else code.append('T')
          case 'G' =>
            val ghTerminal = last(n + 1) && at(n + 1) == 'H'
            val ghConsonant = !last(n + 1) && at(n + 1) == 'H' && !vowelAt(n + 2)
            val silentGn = n > 0 && (region(n, "GN") || region(n, "GNED"))
            if (!ghTerminal && !ghConsonant && !silentGn) {
              if (!last(n) && MetaFrontV.indexOf(at(n + 1)) >= 0 && at(n - 1) != 'G')
                code.append('J')
              else code.append('K')
            }
          case 'H' =>
            if (!last(n) && !(n > 0 && MetaVarson.indexOf(at(n - 1)) >= 0) && vowelAt(n + 1))
              code.append('H')
          case 'F' | 'J' | 'L' | 'M' | 'N' | 'R' => code.append(c)
          case 'K' => if (n == 0 || at(n - 1) != 'C') code.append('K')
          case 'P' => code.append(if (at(n + 1) == 'H') 'F' else 'P')
          case 'Q' => code.append('K')
          case 'S' =>
            if (region(n, "SH") || region(n, "SIO") || region(n, "SIA")) code.append('X')
            else code.append('S')
          case 'T' =>
            if (region(n, "TIA") || region(n, "TIO")) code.append('X')
            else if (region(n, "TCH")) () // silent T in TCH
            else if (region(n, "TH")) code.append('0') // theta
            else code.append('T')
          case 'V' => code.append('F')
          case 'W' | 'Y' => if (!last(n) && vowelAt(n + 1)) code.append(c)
          case 'X' => code.append('K').append('S')
          case 'Z' => code.append('S')
          case _   => () // non-letters contribute nothing
        }
        n += 1
      }
      if (code.length > maxCodeLen) code.length_=(maxCodeLen)
    }
    code.toString
  }
}
