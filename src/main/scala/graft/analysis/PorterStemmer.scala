package graft.analysis

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980) — implemented from the published
  * definition, including the two commonly-adopted departures the reference's
  * stemmer also ships (BLI->BLE instead of ABLI->ABLE, and the added
  * LOGI->LOG rule); behavior contract:
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/En/PorterStemFilter.cs:53.
  *
  * Operates on lowercase ASCII words; words shorter than 3 chars pass
  * through unchanged (the algorithm's own guard).
  */
object PorterStemmer extends Serializable {

  def stem(word: String): String = {
    if (word.length < 3) return word
    val b = word.toCharArray
    var k = b.length - 1 // index of last char
    var j = 0            // general offset used by the rules

    def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** m() = number of vowel-consonant sequences in b[0..j] ([C](VC)^m[V]). */
    def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1 // leading C*
      while (i <= j) {
        while (i <= j && !cons(i)) i += 1 // V+
        if (i <= j) {
          n += 1
          while (i <= j && cons(i)) i += 1 // C+
        }
      }
      n
    }

    def vowelInStem(): Boolean = (0 to j).exists(i => !cons(i))

    def doubleC(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** consonant-vowel-consonant ending at i, where the final consonant is
      * not w, x or y (the *o condition).
      */
    def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) false
      else b(i) != 'w' && b(i) != 'x' && b(i) != 'y'
    }

    def ends(s: String): Boolean = {
      val l = s.length
      if (l > k + 1) return false
      var i = 0
      while (i < l) {
        if (b(k - l + 1 + i) != s(i)) return false
        i += 1
      }
      j = k - l
      true
    }

    def setTo(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s(i); i += 1 }
      k = j + s.length
    }

    def r(s: String): Unit = if (m() > 0) setTo(s)

    // ---- step 1a: plurals -------------------------------------------------
    if (b(k) == 's') {
      if (ends("sses")) k -= 2
      else if (ends("ies")) setTo("i")
      else if (b(k - 1) != 's') k -= 1
    }
    // ---- step 1b: -ed / -ing ---------------------------------------------
    if (ends("eed")) { if (m() > 0) k -= 1 }
    else if ((ends("ed") || ends("ing")) && vowelInStem()) {
      k = j
      if (ends("at")) setTo("ate")
      else if (ends("bl")) setTo("ble")
      else if (ends("iz")) setTo("ize")
      else if (doubleC(k)) {
        k -= 1
        val ch = b(k)
        if (ch == 'l' || ch == 's' || ch == 'z') k += 1
      } else if (m() == 1 && cvc(k)) setTo("e")
    }
    // ---- step 1c: y -> i --------------------------------------------------
    if (ends("y") && vowelInStem()) b(k) = 'i'
    // ---- step 2 -----------------------------------------------------------
    if (k > 0) b(k - 1) match {
      case 'a' =>
        if (ends("ational")) r("ate")
        else if (ends("tional")) r("tion")
      case 'c' =>
        if (ends("enci")) r("ence")
        else if (ends("anci")) r("ance")
      case 'e' =>
        if (ends("izer")) r("ize")
      case 'l' =>
        if (ends("bli")) r("ble")
        else if (ends("alli")) r("al")
        else if (ends("entli")) r("ent")
        else if (ends("eli")) r("e")
        else if (ends("ousli")) r("ous")
      case 'o' =>
        if (ends("ization")) r("ize")
        else if (ends("ation")) r("ate")
        else if (ends("ator")) r("ate")
      case 's' =>
        if (ends("alism")) r("al")
        else if (ends("iveness")) r("ive")
        else if (ends("fulness")) r("ful")
        else if (ends("ousness")) r("ous")
      case 't' =>
        if (ends("aliti")) r("al")
        else if (ends("iviti")) r("ive")
        else if (ends("biliti")) r("ble")
      case 'g' =>
        if (ends("logi")) r("log")
      case _ =>
    }
    // ---- step 3 -----------------------------------------------------------
    b(k) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ =>
    }
    // ---- step 4 -----------------------------------------------------------
    var matched = true
    if (k > 0) b(k - 1) match {
      case 'a' => if (!ends("al")) matched = false
      case 'c' => if (!ends("ance") && !ends("ence")) matched = false
      case 'e' => if (!ends("er")) matched = false
      case 'i' => if (!ends("ic")) matched = false
      case 'l' => if (!ends("able") && !ends("ible")) matched = false
      case 'n' =>
        if (!ends("ant") && !ends("ement") && !ends("ment") && !ends("ent"))
          matched = false
      case 'o' =>
        if (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) ()
        else if (!ends("ou")) matched = false
      case 's' => if (!ends("ism")) matched = false
      case 't' => if (!ends("ate") && !ends("iti")) matched = false
      case 'u' => if (!ends("ous")) matched = false
      case 'v' => if (!ends("ive")) matched = false
      case 'z' => if (!ends("ize")) matched = false
      case _ => matched = false
    } else matched = false
    if (matched && m() > 1) k = j
    // ---- step 5a ----------------------------------------------------------
    j = k
    if (b(k) == 'e') {
      val a = m()
      if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
    }
    // ---- step 5b ----------------------------------------------------------
    if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1

    new String(b, 0, k + 1)
  }
}
