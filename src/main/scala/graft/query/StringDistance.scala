package graft.query

/** String distances from the reference spell/suggest module
  * (/root/reference/src/Lucene.Net.Suggest/Spell/JaroWinklerDistance.cs:30;
  * LevenshteinDistance.cs is Spark's built-in `levenshtein`). The
  * Jaro-Winkler variant here applies the Winkler prefix bonus only when the
  * Jaro score exceeds 0.7 — the reference's default THRESHOLD and the same
  * rule DuckDB's jaro_winkler_similarity implements, verified bit-exact in
  * double over the gate vocabulary (ft_suggest_jaro hashes the quantized
  * scores against the SQL oracle).
  */
object StringDistance {

  /** Jaro similarity in [0, 1]: match window max(|a|,|b|)/2 - 1,
    * transpositions counted over the matched subsequences.
    */
  def jaro(a: String, b: String): Double = {
    if (a == b) return 1.0
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    trans /= 2
    val m = matches.toDouble
    (m / l1 + m / l2 + (m - trans) / m) / 3.0
  }

  /** Jaro-Winkler: prefix bonus (up to 4 shared leading chars, p = 0.1)
    * applied only above the 0.7 threshold.
    */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) j
    else {
      var l = 0
      val n = math.min(4, math.min(a.length, b.length))
      while (l < n && a.charAt(l) == b.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }
}
