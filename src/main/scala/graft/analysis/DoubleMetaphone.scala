package graft.analysis

/** Double Metaphone phonetic encoder — Lawrence Philips' published algorithm
  * ("The Double Metaphone Search Algorithm", C/C++ Users Journal, June 2000),
  * the rule set the reference's phonetic module exposes
  * (/root/reference/src/Lucene.Net.Analysis.Phonetic/Language/DoubleMetaphone.cs:36,
  * wrapped by DoubleMetaphoneFilter.cs). Produces a (primary, alternate) key
  * pair, both capped at 4 chars; behavior is pinned against the reference's
  * 1221 surname vectors in PhoneticSpec
  * (src/test/resources/double_metaphone_vectors.tsv, extracted from
  * Lucene.Net.Tests.Analysis.Phonetic/Language/DoubleMetaphone2Test.cs).
  *
  * Implementation shape: one cursor loop over the uppercased input with a
  * per-letter rule table. Pure function of the input string — safe inside
  * any Spark map/Expression; no per-call allocation beyond the two builders.
  */
object DoubleMetaphone {

  final val MaxCodeLen = 4

  private val Vowels = "AEIOUY"
  private val SilentStarts = Array("GN", "KN", "PN", "WR", "PS")
  private val EsEpEbElEyIbIlInIeEiEr =
    Array("ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")
  private val LTKSNMBZ = Array("L", "T", "K", "S", "N", "M", "B", "Z")

  /** Encode to the pair (primary, alternate). Empty input → ("",""). */
  def encode(input: String): (String, String) = {
    val value = clean(input)
    if (value == null) return ("", "")
    val slavo = isSlavoGermanic(value)
    val r = new Result
    var i = if (isSilentStart(value)) 1 else 0
    while (!r.complete && i <= value.length - 1) {
      value.charAt(i) match {
        case 'A' | 'E' | 'I' | 'O' | 'U' | 'Y' =>
          if (i == 0) r.append('A')
          i += 1
        case 'B' =>
          r.append('P'); i += (if (at(value, i + 1) == 'B') 2 else 1)
        case 'Ç' => r.append('S'); i += 1
        case 'C' => i = handleC(value, r, i)
        case 'D' => i = handleD(value, r, i)
        case 'F' =>
          r.append('F'); i += (if (at(value, i + 1) == 'F') 2 else 1)
        case 'G' => i = handleG(value, r, i, slavo)
        case 'H' => i = handleH(value, r, i)
        case 'J' => i = handleJ(value, r, i, slavo)
        case 'K' =>
          r.append('K'); i += (if (at(value, i + 1) == 'K') 2 else 1)
        case 'L' => i = handleL(value, r, i)
        case 'M' =>
          r.append('M'); i += (if (condM0(value, i)) 2 else 1)
        case 'N' =>
          r.append('N'); i += (if (at(value, i + 1) == 'N') 2 else 1)
        case 'Ñ' => r.append('N'); i += 1
        case 'P' => i = handleP(value, r, i)
        case 'Q' =>
          r.append('K'); i += (if (at(value, i + 1) == 'Q') 2 else 1)
        case 'R' => i = handleR(value, r, i, slavo)
        case 'S' => i = handleS(value, r, i, slavo)
        case 'T' => i = handleT(value, r, i)
        case 'V' =>
          r.append('F'); i += (if (at(value, i + 1) == 'V') 2 else 1)
        case 'W' => i = handleW(value, r, i)
        case 'X' => i = handleX(value, r, i)
        case 'Z' => i = handleZ(value, r, i, slavo)
        case _ => i += 1
      }
    }
    (r.primaryStr, r.alternateStr)
  }

  /** Primary key only (the index/cluster key; "" for non-encodable input). */
  def primary(input: String): String = encode(input)._1

  // ---- per-letter rules ----------------------------------------------------

  private def handleC(v: String, r: Result, i: Int): Int = {
    if (condC0(v, i)) { r.append('K'); i + 2 }
    else if (i == 0 && has(v, i, 6, "CAESAR")) { r.append('S'); i + 2 }
    else if (has(v, i, 2, "CH")) handleCH(v, r, i)
    else if (has(v, i, 2, "CZ") && !has(v, i - 2, 4, "WICZ")) {
      r.append('S', 'X'); i + 2
    } else if (has(v, i + 1, 3, "CIA")) { r.append('X'); i + 3 }
    else if (has(v, i, 2, "CC") && !(i == 1 && v.charAt(0) == 'M'))
      handleCC(v, r, i)
    else if (has(v, i, 2, "CK", "CG", "CQ")) { r.append('K'); i + 2 }
    else if (has(v, i, 2, "CI", "CE", "CY")) {
      if (has(v, i, 3, "CIO", "CIE", "CIA")) r.append('S', 'X') else r.append('S')
      i + 2
    } else {
      r.append('K')
      if (has(v, i + 1, 2, " C", " Q", " G")) i + 3
      else if (has(v, i + 1, 1, "C", "K", "Q") && !has(v, i + 1, 2, "CE", "CI")) i + 2
      else i + 1
    }
  }

  private def condC0(v: String, i: Int): Boolean = {
    if (has(v, i, 4, "CHIA")) true
    else if (i <= 1) false
    else if (isVowel(at(v, i - 2))) false
    else if (!has(v, i - 1, 3, "ACH")) false
    else {
      val c = at(v, i + 2)
      (c != 'I' && c != 'E') || has(v, i - 2, 6, "BACHER", "MACHER")
    }
  }

  private def handleCC(v: String, r: Result, i: Int): Int = {
    if (has(v, i + 2, 1, "I", "E", "H") && !has(v, i + 2, 2, "HU")) {
      // "bellocchio" vs "bacchus"
      if ((i == 1 && at(v, i - 1) == 'A') || has(v, i - 1, 5, "UCCEE", "UCCES"))
        r.appendStr("KS")
      else r.append('X')
      i + 3
    } else { r.append('K'); i + 2 } // Pierce's rule
  }

  private def handleCH(v: String, r: Result, i: Int): Int = {
    if (i > 0 && has(v, i, 4, "CHAE")) { r.append('K', 'X'); i + 2 } // Michael
    else if (condCH0(v, i)) { r.append('K'); i + 2 }                // Greek roots
    else if (condCH1(v, i)) { r.append('K'); i + 2 }                // Germanic
    else {
      if (i > 0) {
        if (has(v, 0, 2, "MC")) r.append('K') else r.append('X', 'K')
      } else r.append('X')
      i + 2
    }
  }

  private def condCH0(v: String, i: Int): Boolean =
    i == 0 &&
      (has(v, i + 1, 5, "HARAC", "HARIS") ||
        has(v, i + 1, 3, "HOR", "HYM", "HIA", "HEM")) &&
      !has(v, 0, 5, "CHORE")

  private def condCH1(v: String, i: Int): Boolean =
    has(v, 0, 4, "VAN ", "VON ") || has(v, 0, 3, "SCH") ||
      has(v, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID") ||
      has(v, i + 2, 1, "T", "S") ||
      ((has(v, i - 1, 1, "A", "O", "U", "E") || i == 0) &&
        (has(v, i + 2, 1, "L", "R", "N", "M", "B", "H", "F", "V", "W", " ") ||
          i + 1 == v.length - 1))

  private def handleD(v: String, r: Result, i: Int): Int = {
    if (has(v, i, 2, "DG")) {
      if (has(v, i + 2, 1, "I", "E", "Y")) { r.append('J'); i + 3 } // "edge"
      else { r.appendStr("TK"); i + 2 }                            // "Edgar"
    } else if (has(v, i, 2, "DT", "DD")) { r.append('T'); i + 2 }
    else { r.append('T'); i + 1 }
  }

  private def handleG(v: String, r: Result, i: Int, slavo: Boolean): Int = {
    if (at(v, i + 1) == 'H') handleGH(v, r, i)
    else if (at(v, i + 1) == 'N') {
      if (i == 1 && isVowel(at(v, 0)) && !slavo) r.appendStr("KN", "N")
      else if (!has(v, i + 2, 2, "EY") && at(v, i + 1) != 'Y' && !slavo)
        r.appendStr("N", "KN")
      else r.appendStr("KN")
      i + 2
    } else if (has(v, i + 1, 2, "LI") && !slavo) { r.appendStr("KL", "L"); i + 2 }
    else if (i == 0 &&
      (at(v, i + 1) == 'Y' || has(v, i + 1, 2, EsEpEbElEyIbIlInIeEiEr: _*))) {
      r.append('K', 'J'); i + 2 // -ges-, -gep-, -gie- at start
    } else if ((has(v, i + 1, 2, "ER") || at(v, i + 1) == 'Y') &&
      !has(v, 0, 6, "DANGER", "RANGER", "MANGER") &&
      !has(v, i - 1, 1, "E", "I") && !has(v, i - 1, 3, "RGY", "OGY")) {
      r.append('K', 'J'); i + 2 // -ger-, -gy-
    } else if (has(v, i + 1, 1, "E", "I", "Y") || has(v, i - 1, 4, "AGGI", "OGGI")) {
      if (has(v, 0, 4, "VAN ", "VON ") || has(v, 0, 3, "SCH") || has(v, i + 1, 2, "ET"))
        r.append('K') // obvious germanic
      else if (has(v, i + 1, 3, "IER")) r.append('J')
      else r.append('J', 'K')
      i + 2
    } else if (at(v, i + 1) == 'G') { r.append('K'); i + 2 }
    else { r.append('K'); i + 1 }
  }

  private def handleGH(v: String, r: Result, i: Int): Int = {
    if (i > 0 && !isVowel(at(v, i - 1))) { r.append('K'); i + 2 }
    else if (i == 0) {
      if (at(v, i + 2) == 'I') r.append('J') else r.append('K')
      i + 2
    } else if ((i > 1 && has(v, i - 2, 1, "B", "H", "D")) ||
      (i > 2 && has(v, i - 3, 1, "B", "H", "D")) ||
      (i > 3 && has(v, i - 4, 1, "B", "H"))) {
      i + 2 // Parker's rule: silent, "hugh"
    } else {
      if (i > 2 && at(v, i - 1) == 'U' && has(v, i - 3, 1, "C", "G", "L", "R", "T"))
        r.append('F') // "laugh", "cough", "rough"
      else if (i > 0 && at(v, i - 1) != 'I') r.append('K')
      i + 2
    }
  }

  private def handleH(v: String, r: Result, i: Int): Int = {
    // keep only between vowels / at start before a vowel
    if ((i == 0 || isVowel(at(v, i - 1))) && isVowel(at(v, i + 1))) {
      r.append('H'); i + 2
    } else i + 1
  }

  private def handleJ(v: String, r: Result, i: Int, slavo: Boolean): Int = {
    if (has(v, i, 4, "JOSE") || has(v, 0, 4, "SAN ")) {
      // Spanish: "Jose", "San Jacinto"
      if ((i == 0 && at(v, i + 4) == ' ') || v.length == 4 || has(v, 0, 4, "SAN "))
        r.append('H')
      else r.append('J', 'H')
      i + 1
    } else {
      if (i == 0 && !has(v, i, 4, "JOSE")) r.append('J', 'A')
      else if (isVowel(at(v, i - 1)) && !slavo &&
        (at(v, i + 1) == 'A' || at(v, i + 1) == 'O')) r.append('J', 'H')
      else if (i == v.length - 1) r.append('J', ' ')
      else if (!has(v, i + 1, 1, LTKSNMBZ: _*) && !has(v, i - 1, 1, "S", "K", "L"))
        r.append('J')
      if (at(v, i + 1) == 'J') i + 2 else i + 1
    }
  }

  private def handleL(v: String, r: Result, i: Int): Int = {
    if (at(v, i + 1) == 'L') {
      if (condL0(v, i)) r.appendPrimary('L') else r.append('L')
      i + 2
    } else { r.append('L'); i + 1 }
  }

  private def condL0(v: String, i: Int): Boolean = {
    if (i == v.length - 3 && has(v, i - 1, 4, "ILLO", "ILLA", "ALLE")) true
    else if ((has(v, v.length - 2, 2, "AS", "OS") ||
      has(v, v.length - 1, 1, "A", "O")) && has(v, i - 1, 4, "ALLE")) true
    else false
  }

  private def condM0(v: String, i: Int): Boolean =
    at(v, i + 1) == 'M' ||
      (has(v, i - 1, 3, "UMB") &&
        (i + 1 == v.length - 1 || has(v, i + 2, 2, "ER")))

  private def handleP(v: String, r: Result, i: Int): Int = {
    if (at(v, i + 1) == 'H') { r.append('F'); i + 2 }
    else { r.append('P'); i + (if (has(v, i + 1, 1, "P", "B")) 2 else 1) }
  }

  private def handleR(v: String, r: Result, i: Int, slavo: Boolean): Int = {
    if (i == v.length - 1 && !slavo && has(v, i - 2, 2, "IE") &&
      !has(v, i - 4, 2, "ME", "MA")) r.appendAlternate('R')
    else r.append('R')
    i + (if (at(v, i + 1) == 'R') 2 else 1)
  }

  private def handleS(v: String, r: Result, i: Int, slavo: Boolean): Int = {
    if (has(v, i - 1, 3, "ISL", "YSL")) i + 1 // "island", "carlisle"
    else if (i == 0 && has(v, i, 5, "SUGAR")) { r.append('X', 'S'); i + 1 }
    else if (has(v, i, 2, "SH")) {
      if (has(v, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ")) r.append('S')
      else r.append('X')
      i + 2
    } else if (has(v, i, 3, "SIO", "SIA") || has(v, i, 4, "SIAN")) {
      if (slavo) r.append('S') else r.append('S', 'X')
      i + 3
    } else if ((i == 0 && has(v, i + 1, 1, "M", "N", "L", "W")) ||
      has(v, i + 1, 1, "Z")) {
      r.append('S', 'X')
      i + (if (has(v, i + 1, 1, "Z")) 2 else 1)
    } else if (has(v, i, 2, "SC")) handleSC(v, r, i)
    else {
      if (i == v.length - 1 && has(v, i - 2, 2, "AI", "OI"))
        r.appendAlternate('S') // french: "resnais", "artois"
      else r.append('S')
      i + (if (has(v, i + 1, 1, "S", "Z")) 2 else 1)
    }
  }

  private def handleSC(v: String, r: Result, i: Int): Int = {
    if (at(v, i + 2) == 'H') {
      // Schlesinger's rule
      if (has(v, i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM")) {
        if (has(v, i + 3, 2, "ER", "EN")) r.appendStr("X", "SK")
        else r.appendStr("SK") // "school", "schooner"
      } else if (i == 0 && !isVowel(at(v, 3)) && at(v, 3) != 'W')
        r.append('X', 'S')
      else r.append('X')
    } else if (has(v, i + 2, 1, "I", "E", "Y")) r.append('S')
    else r.appendStr("SK")
    i + 3
  }

  private def handleT(v: String, r: Result, i: Int): Int = {
    if (has(v, i, 4, "TION")) { r.append('X'); i + 3 }
    else if (has(v, i, 3, "TIA", "TCH")) { r.append('X'); i + 3 }
    else if (has(v, i, 2, "TH") || has(v, i, 3, "TTH")) {
      if (has(v, i + 2, 2, "OM", "AM") || has(v, 0, 4, "VAN ", "VON ") ||
        has(v, 0, 3, "SCH")) r.append('T')
      else r.append('0', 'T') // 0 = the 'th' phone
      i + 2
    } else { r.append('T'); i + (if (has(v, i + 1, 1, "T", "D")) 2 else 1) }
  }

  private def handleW(v: String, r: Result, i: Int): Int = {
    if (has(v, i, 2, "WR")) { r.append('R'); i + 2 }
    else if (i == 0 && (isVowel(at(v, i + 1)) || has(v, i, 2, "WH"))) {
      if (isVowel(at(v, i + 1))) r.append('A', 'F') else r.append('A')
      i + 1
    } else if ((i == v.length - 1 && isVowel(at(v, i - 1))) ||
      has(v, i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY") ||
      has(v, 0, 3, "SCH")) {
      r.appendAlternate('F'); i + 1
    } else if (has(v, i, 4, "WICZ", "WITZ")) { r.appendStr("TS", "FX"); i + 4 }
    else i + 1
  }

  private def handleX(v: String, r: Result, i: Int): Int = {
    if (i == 0) { r.append('S'); i + 1 }
    else {
      if (!(i == v.length - 1 &&
        (has(v, i - 3, 3, "IAU", "EAU") || has(v, i - 2, 2, "AU", "OU"))))
        r.appendStr("KS") // not french "breaux"
      i + (if (has(v, i + 1, 1, "C", "X")) 2 else 1)
    }
  }

  private def handleZ(v: String, r: Result, i: Int, slavo: Boolean): Int = {
    if (at(v, i + 1) == 'H') { r.append('J'); i + 2 } // "Zhao"
    else {
      if (has(v, i + 1, 2, "ZO", "ZI", "ZA") ||
        (slavo && i > 0 && at(v, i - 1) != 'T')) r.appendStr("S", "TS")
      else r.append('S')
      i + (if (at(v, i + 1) == 'Z') 2 else 1)
    }
  }

  // ---- helpers ---------------------------------------------------------------

  private def clean(input: String): String = {
    if (input == null) return null
    val t = input.trim
    if (t.isEmpty) null else t.toUpperCase(java.util.Locale.ENGLISH)
  }

  private def isVowel(c: Char): Boolean = Vowels.indexOf(c.toInt) >= 0

  private def isSlavoGermanic(v: String): Boolean =
    v.indexOf('W') >= 0 || v.indexOf('K') >= 0 ||
      v.contains("CZ") || v.contains("WITZ")

  private def isSilentStart(v: String): Boolean =
    SilentStarts.exists(v.startsWith)

  /** Char at index, ' ' out of bounds (so OOB never matches a rule). */
  private def at(v: String, i: Int): Char =
    if (i < 0 || i >= v.length) ' ' else v.charAt(i)

  /** Does any candidate equal v.substring(start, start+len)? False when the
    * window falls outside the string.
    */
  private def has(v: String, start: Int, len: Int, candidates: String*): Boolean = {
    if (start < 0 || start + len > v.length) return false
    val target = v.substring(start, start + len)
    candidates.exists(_ == target)
  }

  /** Builds the two capped keys; complete once BOTH reached MaxCodeLen. */
  private final class Result {
    private val p = new java.lang.StringBuilder(MaxCodeLen)
    private val a = new java.lang.StringBuilder(MaxCodeLen)
    def append(c: Char): Unit = { appendPrimary(c); appendAlternate(c) }
    def append(pc: Char, ac: Char): Unit = { appendPrimary(pc); appendAlternate(ac) }
    def appendStr(s: String): Unit = { s.foreach(append) }
    def appendStr(ps: String, as: String): Unit = {
      ps.foreach(appendPrimary); as.foreach(appendAlternate)
    }
    def appendPrimary(c: Char): Unit = if (p.length < MaxCodeLen) p.append(c): Unit
    def appendAlternate(c: Char): Unit = if (a.length < MaxCodeLen) a.append(c): Unit
    def complete: Boolean = p.length >= MaxCodeLen && a.length >= MaxCodeLen
    def primaryStr: String = p.toString
    def alternateStr: String = a.toString
  }
}
