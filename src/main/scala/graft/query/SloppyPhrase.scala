package graft.query

/** Reference-faithful sloppy phrase frequency for NON-REPEATING phrase terms
  * — a per-document transliteration of the 4.8 scorer's match loop
  * (behavior contract: /root/reference/src/Lucene.Net/Search/SloppyPhraseScorer.cs
  * PhraseFreq; slop factor SloppyFreq = 1/(distance+1),
  * /root/reference/src/Lucene.Net/Search/Similarities/BM25Similarity.cs:74-77):
  *
  * each slot's positions are offset by its phrase index ("adjusted"
  * positions); a min-heap of per-slot cursors repeatedly advances the
  * smallest cursor, closing the window (end = max adjusted position seen);
  * every time the advanced cursor overtakes the next-smallest, the minimal
  * window ending at the previous configuration is scored if its length
  * (end - start) is within the slop, accumulating 1/(1+matchLength) in
  * discovery order (float, deterministic).
  *
  * The reference's repetition machinery (the same term in several slots) is
  * not implemented — callers require distinct slot terms for slop > 0.
  */
object SloppyPhrase {

  /** @param slotPositions per-slot RAW sorted positions (slot i matched at
    *                      raw position p contributes adjusted position p - i)
    * @return the sloppy phrase frequency (0 when no window fits the slop)
    */
  def freq(slotPositions: Array[Array[Int]], slop: Int): Float = {
    val k = slotPositions.length
    if (slotPositions.exists(_.isEmpty)) return 0.0f
    // adjusted-position cursors
    val pos = new Array[Int](k)    // current adjusted position per slot
    val idx = new Array[Int](k)    // cursor index per slot
    var end = Int.MinValue
    var i = 0
    while (i < k) {
      pos(i) = slotPositions(i)(0) - i
      if (pos(i) > end) end = pos(i)
      i += 1
    }
    // tiny k: the "priority queue" is a linear scan over k cursors
    def minSlot(): Int = {
      var m = 0
      var j = 1
      while (j < k) { if (pos(j) < pos(m)) m = j; j += 1 }
      m
    }
    def secondMinValue(excl: Int): Int = {
      var v = Int.MaxValue
      var j = 0
      while (j < k) { if (j != excl && pos(j) < v) v = pos(j); j += 1 }
      v
    }
    var freq = 0.0f
    var pp = minSlot()
    var matchLength = end - pos(pp)
    var next = secondMinValue(pp)
    var alive = true
    while (alive) {
      // advance pp's cursor
      idx(pp) += 1
      if (idx(pp) >= slotPositions(pp).length) alive = false
      else {
        pos(pp) = slotPositions(pp)(idx(pp)) - pp
        if (pos(pp) > end) end = pos(pp)
        if (pos(pp) > next) {
          // done minimizing the current window
          if (matchLength <= slop) freq += 1.0f / (1 + matchLength)
          pp = minSlot()
          next = secondMinValue(pp)
          matchLength = end - pos(pp)
        } else {
          val m2 = end - pos(pp)
          if (m2 < matchLength) matchLength = m2
          // pp remains the minimum cursor (pos <= next)
        }
      }
    }
    if (matchLength <= slop) freq += 1.0f / (1 + matchLength)
    freq
  }
}
