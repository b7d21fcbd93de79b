package graft.query

/** Span-scorer MATCH STREAMS with payload collection — the iterator walks the
  * reference scorers actually take, which differ from the span SET semantics
  * in [[Spans.eval]]: freq accounting counts each emitted match once, and the
  * ordered walk emits only shrink-to-shortest matches
  * (/root/reference/src/Lucene.Net/Search/Spans/NearSpansOrdered.cs:259-268,
  * 341-420; NearSpansUnordered.cs:385). Clauses are TERM spans (length-1
  * windows) — the PayloadNearQuery usage this engine supports.
  *
  * A match is (start, end, payloads): the payloads stored at the clause
  * positions participating in the match, in the reference's collection order
  * (ordered: last clause, then k-2 .. 0 as the shrink visits them;
  * unordered: clause order). Positions without a stored payload contribute
  * nothing (IsPayloadAvailable semantics). One faithful quirk kept: during
  * the ordered shrink, a clause whose FINAL matched position carries no
  * payload contributes its most recently seen payload-carrying position's
  * bytes instead (the reference only overwrites `possiblePayload` when
  * IsPayloadAvailable — NearSpansOrdered.cs:360-366,385-391).
  */
private[query] object PayloadSpans {

  /** One clause's cursor over its sorted positions in one doc; `pay(i)` is
    * the payload stored at position `pos(i)` (empty = none), null when the
    * doc carries no payloads for the term.
    */
  final class TermCursor(val pos: Array[Int], val pay: Array[Array[Byte]]) {
    var i = 0
    def start: Int = pos(i)
    def end: Int = pos(i) + 1
    def payload: Array[Byte] =
      if (pay == null) Array.emptyByteArray else pay(i)
    def next(): Boolean = { i += 1; i < pos.length }
  }

  final case class Match(start: Int, end: Int, payloads: List[Array[Byte]])

  /** NearSpansOrdered walk: stretch the clause cursors into document order,
    * then shrink to the shortest match by advancing every clause but the
    * last as far as possible; emit, continue. Slop = total inter-span gap.
    */
  def ordered(cursors: Array[TermCursor], slop: Int): Iterator[Match] = {
    val k = cursors.length
    require(k >= 2, "PayloadNear needs >= 2 clauses")
    if (cursors.exists(_.pos.isEmpty)) return Iterator.empty
    var inSameDoc = true

    // DocSpansOrdered(start1,end1,start2,end2)
    def before(s1: Int, e1: Int, s2: Int, e2: Int): Boolean =
      if (s1 == s2) e1 < e2 else s1 < s2

    def stretchToOrder(): Boolean = {
      var i = 1
      while (inSameDoc && i < k) {
        while (inSameDoc && !before(cursors(i - 1).start, cursors(i - 1).end,
          cursors(i).start, cursors(i).end)) {
          if (!cursors(i).next()) inSameDoc = false
        }
        i += 1
      }
      inSameDoc
    }

    // ShrinkToAfterShortestMatch: returns the match when slop allows, null
    // otherwise; either way the early clauses end up advanced past the
    // region, so the walk always makes progress.
    def shrink(): Match = {
      val last = cursors(k - 1)
      var matchStart = last.start
      val matchEnd = last.end
      var pays = List.empty[Array[Byte]]
      if (last.payload.nonEmpty) pays = last.payload :: pays
      var matchSlop = 0
      var lastStart = matchStart
      var lastEnd = matchEnd
      var i = k - 2
      while (i >= 0) {
        val c = cursors(i)
        var possiblePayload: Array[Byte] = if (c.payload.nonEmpty) c.payload else null
        var prevStart = c.start
        var prevEnd = c.end
        var advancing = true
        while (advancing) {
          if (!c.next()) { inSameDoc = false; advancing = false }
          else {
            val ppStart = c.start
            val ppEnd = c.end
            if (!before(ppStart, ppEnd, lastStart, lastEnd)) advancing = false
            else {
              prevStart = ppStart
              prevEnd = ppEnd
              if (c.payload.nonEmpty) possiblePayload = c.payload
            }
          }
        }
        if (possiblePayload != null) pays = possiblePayload :: pays
        if (matchStart > prevEnd) matchSlop += matchStart - prevEnd
        matchStart = prevStart
        lastStart = prevStart
        lastEnd = prevEnd
        i -= 1
      }
      // insertion order of the reference's set union: last clause first,
      // then k-2 .. 0 — our prepends built exactly the reverse
      if (matchSlop <= slop) Match(matchStart, matchEnd, pays.reverse) else null
    }

    new scala.collection.AbstractIterator[Match] {
      private var pending: Match = _
      private var done = false
      private def advance(): Unit = {
        pending = null
        while (pending == null && inSameDoc) {
          if (stretchToOrder()) pending = shrink()
        }
        if (pending == null) done = true
      }
      advance()
      override def hasNext: Boolean = !done
      override def next(): Match = { val m = pending; advance(); m }
    }
  }

  /** NearSpansUnordered CellQueue walk: one cursor per clause; test the
    * frontier (`maxEnd - minStart - totalLength <= slop`, overlaps
    * permitted), emit, advance the minimum. Every frontier pass emits — the
    * scorer counts duplicates of the same envelope separately.
    */
  def unordered(cursors: Array[TermCursor], slop: Int): Iterator[Match] = {
    val k = cursors.length
    require(k >= 2, "PayloadNear needs >= 2 clauses")
    if (cursors.exists(_.pos.isEmpty)) return Iterator.empty
    new scala.collection.AbstractIterator[Match] {
      private var pending: Match = _
      private var done = false
      private def advance(): Unit = {
        pending = null
        while (pending == null && !done) {
          var minI = 0
          var maxEnd = Int.MinValue
          var i = 0
          while (i < k) {
            val c = cursors(i)
            if (c.end > maxEnd) maxEnd = c.end
            val m = cursors(minI)
            if (c.start < m.start || (c.start == m.start && c.end < m.end)) minI = i
            i += 1
          }
          val minStart = cursors(minI).start
          if (maxEnd - minStart - k <= slop) {
            var pays = List.empty[Array[Byte]]
            var j = k - 1
            while (j >= 0) {
              if (cursors(j).payload.nonEmpty) pays = cursors(j).payload :: pays
              j -= 1
            }
            pending = Match(minStart, maxEnd, pays)
          }
          if (!cursors(minI).next()) done = true
        }
      }
      advance()
      override def hasNext: Boolean = pending != null
      override def next(): Match = { val m = pending; advance(); m }
    }
  }
}
