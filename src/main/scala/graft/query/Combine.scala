package graft.query

/** Streaming per-doc fold over hit rows already sorted by (doc_id, clause).
  *
  * This is the boolean-combine stage shared by the exhaustive, block-max and
  * segmented searchers. The reference sums clause scores doc-at-a-time in the
  * scorer heap (/root/reference/src/Lucene.Net/Search/DisjunctionSumScorer.cs:56,72);
  * our canonical float32 order is ascending clause id (SURVEY.md §2.4 item 7).
  *
  * Realized as a sorted-shuffle fold: callers `repartition(doc_id)` +
  * `sortWithinPartitions(doc_id, clause)` and then run [[fold]] inside one
  * `mapPartitions` pass — the sort-based shuffle writer does the grouping and
  * no per-doc array is ever materialized (the groupByKey/mapGroups shape this
  * replaces buffered every group in memory, the round-1 scale finding).
  */
object Combine {

  /** One pass over sorted rows. `docOf`/`add`/`finish` define the per-doc
    * state machine: `reset()` before each doc, `add` per row, `finish(doc)`
    * returns the emitted score or NaN to drop the doc.
    */
  def fold[R](rows: Iterator[R], docOf: R => Long, reset: () => Unit,
              add: R => Unit, finish: Long => Float): Iterator[(Long, Float)] =
    new scala.collection.AbstractIterator[(Long, Float)] {
      private val b = rows.buffered
      private var pending: (Long, Float) = _
      private var done = false
      private def advance(): Unit = {
        pending = null
        while (pending == null && b.hasNext) {
          val doc = docOf(b.head)
          reset()
          while (b.hasNext && docOf(b.head) == doc) add(b.next())
          val s = finish(doc)
          if (!s.isNaN) pending = (doc, s)
        }
        if (pending == null) done = true
      }
      advance()
      override def hasNext: Boolean = !done
      override def next(): (Long, Float) = {
        val h = pending
        advance()
        h
      }
    }
}
