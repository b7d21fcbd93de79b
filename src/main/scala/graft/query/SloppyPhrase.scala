package graft.query

/** Reference-faithful sloppy phrase frequency — a per-document
  * transliteration of the 4.8 scorer's match loop INCLUDING the repetition
  * machinery (behavior contract:
  * /root/reference/src/Lucene.Net/Search/SloppyPhraseScorer.cs PhraseFreq /
  * AdvanceRpts / AdvanceRepeatGroups; slop factor SloppyFreq =
  * 1/(distance+1), .../Similarities/BM25Similarity.cs:74-77; queue order
  * (position, offset), .../Search/PhraseQueue.cs:29-49):
  *
  *  - each slot's positions are offset by its phrase index ("adjusted"
  *    positions: position = rawPos - offset); a priority queue of per-slot
  *    cursors repeatedly advances the smallest, closing the window
  *    (end = max adjusted position seen); every time the advanced cursor
  *    overtakes the next-smallest, the minimal window at the previous
  *    configuration is scored if its length (end - start) is within the
  *    slop, accumulating 1/(1+matchLength) in discovery order.
  *  - REPEATS (the same term in several slots — "A A A", "my ho my"):
  *    slots of one term form a repetition group (their raw position lists
  *    are identical — one token per position). At init, group member j is
  *    pre-advanced j times so no two members share a raw position
  *    (AdvanceRepeatGroups, single-term case); after every cursor advance,
  *    collisions (two group members at one raw position) resolve by
  *    advancing the LESSER of the pair until none remain, re-heapifying
  *    the affected queue entries (AdvanceRpts/Collide/Lesser).
  *  - MULTI-TERM REPEATS (partially overlapping MultiPhrase slots, e.g.
  *    slot1={A,B} slot2={B,C}): the same token may satisfy two slots
  *    without their cursors initially colliding — the reference's "hidden
  *    collision" (SloppyPhraseScorer.cs:395-408: doc "A C B", P1 on A, P2
  *    on C, yet P1/P2 are repetitions of each other through B). Callers
  *    pass `slotTerms` so repetition groups come from CONNECTED REGIONS of
  *    the bipartite slot/term graph (GatherRptGroups multi-term branch:
  *    per-slot bitsets over repeating-term ordinals, unioned until
  *    disjoint — UnionTermGroups/TermGroups), and the init advance resolves
  *    collisions pairwise-by-Lesser instead of the fixed j-step schedule
  *    (AdvanceRepeatGroups, hasMultiTermRpts branch). The walk itself is
  *    unchanged: within a group a raw position may host only ONE cursor,
  *    which is exactly the one-token-per-slot-use constraint.
  *
  * Goldens: Lucene.Net.Tests/Search/TestSloppyPhraseQuery.cs (DOC_1..DOC_5
  * match/no-match tables, LUCENE-1310 / LUCENE-3412 regressions); the
  * multi-term branch follows the algorithm (the reference's own
  * TestMultiSloppyWithRepeats is @Ignore'd as a known issue upstream, so
  * no end-to-end golden exists to mirror).
  */
object SloppyPhrase {

  private final class PP(val positions: Array[Int], val offset: Int) {
    var idx: Int = 0
    var position: Int = 0 // adjusted: positions(idx) - offset
    var rptGroup: Int = -1
    var rptInd: Int = 0
    def firstPosition(): Unit = { idx = 0; position = positions(0) - offset }
    def nextPosition(): Boolean = {
      idx += 1
      if (idx < positions.length) { position = positions(idx) - offset; true }
      else false
    }
    def tpPos: Int = position + offset // raw term position
  }

  /** @param slotPositions per-slot RAW sorted positions (slot i matched at
    *                      raw position p contributes adjusted position p - i)
    * @param slotTerms     per-slot term identities (any stable Int ids) —
    *                      required to detect MULTI-TERM repeats when slots
    *                      partially overlap; null = every slot is a single
    *                      term identified by its position list (identical
    *                      lists <=> same term, since a position holds
    *                      exactly one token)
    * @return the sloppy phrase frequency (0 when no window fits the slop)
    */
  def freq(slotPositions: Array[Array[Int]], slop: Int,
           slotTerms: Array[Array[Int]] = null): Float = {
    val k = slotPositions.length
    if (k == 0 || slotPositions.exists(_.isEmpty)) return 0.0f
    // Degenerate single-slot phrase: every occurrence is its own minimal
    // window of length 0 -> SloppyFreq 1/(0+1) each (the reference rewrites
    // one-term phrases to TermQuery before the scorer; callers like
    // MemoryIndex.phraseFreq can still reach here directly).
    if (k == 1) return slotPositions(0).length.toFloat
    val pps = Array.tabulate(k)(i => new PP(slotPositions(i), i))

    // repeating terms (RepeatingTerms): terms present in >= 2 slots; a slot
    // carrying a repeating term alongside others makes the repeats
    // MULTI-TERM (hidden collisions possible)
    var hasMultiTermRpts = false
    val rptGroups: Array[Array[PP]] =
      if (slotTerms != null) {
        val tcnt = scala.collection.mutable.LinkedHashMap[Int, Int]()
        slotTerms.foreach(_.foreach(t => tcnt(t) = tcnt.getOrElse(t, 0) + 1))
        val rptOrd: Map[Int, Int] =
          tcnt.iterator.filter(_._2 >= 2).map(_._1).zipWithIndex.toMap
        val rppIdx = slotTerms.indices.filter(i => slotTerms(i).exists(rptOrd.contains))
        hasMultiTermRpts = rppIdx.exists(i => slotTerms(i).length > 1)
        if (rptOrd.isEmpty) Array.empty
        else if (!hasMultiTermRpts) {
          // single-term repeats: group = slots of one term, ascending offset
          rppIdx.groupBy(i => slotTerms(i).head).values
            .filter(_.size >= 2).map(_.sorted.map(pps(_)).toArray).toArray
        } else {
          // GatherRptGroups multi-term branch: per-slot bitsets over
          // repeating-term ordinals, unioned until disjoint (connected
          // regions of the slot/term bipartite graph), then slot -> the one
          // group holding any of its repeating terms
          val bb = scala.collection.mutable.ArrayBuffer[java.util.BitSet]()
          rppIdx.foreach { i =>
            val b = new java.util.BitSet(rptOrd.size)
            slotTerms(i).foreach(t => rptOrd.get(t).foreach(b.set))
            bb += b
          }
          var i = 0
          while (i < bb.length - 1) {
            var incr = 1
            var j = i + 1
            while (j < bb.length) {
              if (bb(i).intersects(bb(j))) {
                bb(i).or(bb(j)); bb.remove(j); incr = 0
              } else j += 1
            }
            i += incr
          }
          val ordToGroup = new Array[Int](rptOrd.size)
          bb.indices.foreach { g =>
            var o = bb(g).nextSetBit(0)
            while (o >= 0) { ordToGroup(o) = g; o = bb(g).nextSetBit(o + 1) }
          }
          val groups = Array.fill(bb.length)(scala.collection.mutable.TreeSet[Int]())
          rppIdx.foreach { i =>
            slotTerms(i).foreach(t =>
              rptOrd.get(t).foreach(o => groups(ordToGroup(o)) += i))
          }
          groups.filter(_.size >= 2).map(_.toArray.map(pps(_)))
        }
      } else {
        // no term identities: slots are single terms, identical raw position
        // lists <=> same term; members in ascending offset
        val byList = scala.collection.mutable.LinkedHashMap[Seq[Int], List[Int]]()
        pps.foreach { pp =>
          val key = pp.positions.toSeq
          byList(key) = byList.getOrElse(key, Nil) :+ pp.offset
        }
        byList.values.filter(_.size >= 2).map(_.map(pps(_)).toArray).toArray
      }
    rptGroups.zipWithIndex.foreach { case (rg, g) =>
      rg.zipWithIndex.foreach { case (pp, i) => pp.rptGroup = g; pp.rptInd = i }
    }
    val hasRpts = rptGroups.nonEmpty

    // PlaceFirstPositions + AdvanceRepeatGroups
    pps.foreach(_.firstPosition())
    if (hasMultiTermRpts) {
      // multi-term branch: collisions may or may not exist at start —
      // resolve each pairwise by advancing the Lesser (the reference's
      // hasMultiTermRpts loop incl. the rptInd<i restart quirk)
      var g = 0
      while (g < rptGroups.length) {
        val rg = rptGroups(g)
        def collideIn(pp: PP): Int = {
          val t = pp.tpPos
          var i = 0
          while (i < rg.length) {
            val pp2 = rg(i)
            if ((pp2 ne pp) && pp2.tpPos == t) return i
            i += 1
          }
          -1
        }
        var i = 0
        while (i < rg.length) {
          var incr = 1
          val pp = rg(i)
          var kk = collideIn(pp)
          var broke = false
          while (kk >= 0 && !broke) {
            val pp2 =
              if (pp.position < rg(kk).position ||
                (pp.position == rg(kk).position && pp.offset < rg(kk).offset)) pp
              else rg(kk)
            if (!pp2.nextPosition()) return 0.0f
            if (pp2.rptInd < i) { incr = 0; broke = true }
            else kk = collideIn(pp)
          }
          i += incr
        }
        g += 1
      }
    } else {
      // single-term case: member j pre-advances j times, establishing the
      // no-collision start state
      var g = 0
      while (g < rptGroups.length) {
        val rg = rptGroups(g)
        var j = 1
        while (j < rg.length) {
          var c = 0
          while (c < j) {
            if (!rg(j).nextPosition()) return 0.0f
            c += 1
          }
          j += 1
        }
        g += 1
      }
    }

    // FillQueue: order (position, offset) — PhraseQueue.cs:29-49
    val pq = new java.util.PriorityQueue[PP](k,
      (a: PP, b: PP) =>
        if (a.position != b.position) Integer.compare(a.position, b.position)
        else Integer.compare(a.offset, b.offset))
    var end = Int.MinValue
    pps.foreach { pp =>
      if (pp.position > end) end = pp.position
      pq.add(pp)
    }

    def advancePP(pp: PP): Boolean =
      if (!pp.nextPosition()) false
      else { if (pp.position > end) end = pp.position; true }

    def collide(pp: PP): Int = {
      val rg = rptGroups(pp.rptGroup)
      val t = pp.tpPos
      var i = 0
      while (i < rg.length) {
        val pp2 = rg(i)
        if ((pp2 ne pp) && pp2.tpPos == t) return pp2.rptInd
        i += 1
      }
      -1
    }

    def lesser(a: PP, b: PP): PP =
      if (a.position < b.position ||
        (a.position == b.position && a.offset < b.offset)) a else b

    val rptStack = new Array[PP](k)
    // pp was just advanced; resolve any collision by advancing the lesser of
    // the colliding pair until clear, then re-heapify affected queue entries
    def advanceRpts(pp0: PP): Boolean = {
      if (pp0.rptGroup < 0) return true
      var pp = pp0
      val rg = rptGroups(pp.rptGroup)
      val bits = new java.util.BitSet(rg.length)
      val k0 = pp.rptInd
      var kk = collide(pp)
      while (kk >= 0) {
        pp = lesser(pp, rg(kk))
        if (!advancePP(pp)) return false
        if (kk != k0) bits.set(kk) // mark queue entries needing re-heap
        kk = collide(pp)
      }
      var n = 0
      while (bits.cardinality() > 0) {
        val pp2 = pq.poll()
        rptStack(n) = pp2
        n += 1
        if (pp2.rptGroup >= 0 && pp2.rptInd < rg.length && bits.get(pp2.rptInd))
          bits.clear(pp2.rptInd)
      }
      var i = n - 1
      while (i >= 0) { pq.add(rptStack(i)); i -= 1 }
      true
    }

    // PhraseFreq walk
    var freqAcc = 0.0f
    var pp = pq.poll()
    var matchLength = end - pp.position
    var next = pq.peek().position
    var walking = true
    while (walking && advancePP(pp)) {
      if (hasRpts && !advanceRpts(pp)) {
        walking = false // pps exhausted mid-collision
      } else if (pp.position > next) { // done minimizing current match length
        if (matchLength <= slop) freqAcc += 1.0f / (1 + matchLength)
        pq.add(pp)
        pp = pq.poll()
        next = pq.peek().position
        matchLength = end - pp.position
      } else {
        val m2 = end - pp.position
        if (m2 < matchLength) matchLength = m2
      }
    }
    // the tail window scores whether the loop drained (AdvancePP false) or
    // broke on exhausted repeats — same as the reference's post-loop check
    if (matchLength <= slop) freqAcc += 1.0f / (1 + matchLength)
    freqAcc
  }
}
