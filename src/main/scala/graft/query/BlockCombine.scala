package graft.query

import graft.codec.PostingCodec
import graft.score.Similarity
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Doc-range co-partitioned boolean combine — the multi-term scoring shuffle
  * behind the exhaustive, block-max and segmented term searchers.
  *
  * The sorted-row fold this replaces shuffled one decoded row per posting
  * (doc_id, term_id, score). Here each packed scoring block ships whole,
  * keyed by the doc-range bucket(s) it overlaps (the [[PositionalScan]]
  * layout applied to the scoring projection: ~128x fewer shuffle rows,
  * FOR-packed bytes on the wire), and is decoded + scored reduce-side,
  * doc-at-a-time per bucket.
  *
  * Float32 canonical order is preserved structurally: each doc accumulates
  * its clause scores in a per-doc slot array indexed by the compact term
  * index `ti` (callers assign ti in ascending term_id / clause order), and
  * the final score sums the slots ASCENDING — the same documented canonical
  * clause-sum order as every other path, bit-identical to the BruteForce
  * oracle (DisjunctionSumScorer doc-at-a-time analog,
  * /root/reference/src/Lucene.Net/Search/DisjunctionSumScorer.cs:56,72).
  *
  * When the query has MUST terms, the rarest one streams first (rank 0 via
  * the (bucket, rank, ti) partition sort) and every other term only attaches
  * to docs it established — ConjunctionScorer's lead-with-rarest order
  * (/root/reference/src/Lucene.Net/Search/ConjunctionScorer.cs:118): per-doc
  * state is sized by the rarest MUST df, not the union of all clause dfs.
  *
  * Memory: a bucket spans maxDoc/shuffle-partitions doc ids, so per-task
  * state is bounded by bucket width (and by the lead df under a MUST);
  * state is released at every bucket boundary. Sizing
  * spark.sql.shuffle.partitions to the corpus (as on any shuffle) bounds it
  * at cluster scale.
  */
object BlockCombine {

  /** A packed scoring block tagged with shuffle bucket, lead rank, and the
    * query-local compact term index (ascending ti == the canonical clause
    * order; resolved before the shuffle union, so segment-local term_ids
    * are fine).
    */
  final case class Tagged(bucket: Long, rank: Int, ti: Int, first_doc: Long,
                          cnt: Int, doc_bytes: Array[Byte],
                          tf_bytes: Array[Byte], norm_bytes: Array[Byte])

  private final class DocAcc(nTis: Int) {
    val s = new Array[Float](nTis)
    java.util.Arrays.fill(s, Float.NaN)
    var excluded = false
  }

  /** Combine tagged blocks into per-doc boolean-filtered scores.
    * `scorers(ti)` scores that clause's postings (null => MUST_NOT:
    * presence-only); `isMust(ti)`/`isNot(ti)` classify; `nMust` counts
    * distinct MUST clauses; `mm` is minimum-should-match.
    */
  def combine(spark: SparkSession, blocks: Dataset[Tagged],
              scorers: Array[Similarity.TermScorer], isMust: Array[Boolean],
              isNot: Array[Boolean], nMust: Int, mm: Int,
              width: Long): Dataset[(Long, Float)] = {
    import spark.implicits._
    val nTis = scorers.length
    val bScorers = spark.sparkContext.broadcast(scorers)
    val bMust = spark.sparkContext.broadcast(isMust)
    val bNot = spark.sparkContext.broadcast(isNot)
    blocks
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "rank", "ti")
      .mapPartitions { it =>
        val sc = bScorers.value
        val must = bMust.value
        val not = bNot.value
        val perDoc = new scala.collection.mutable.LongMap[DocAcc]()
        var curBucket = Long.MinValue

        def flush(): Iterator[(Long, Float)] = {
          if (perDoc.isEmpty) Iterator.empty
          else {
            val snap = perDoc.toArray
            perDoc.clear()
            snap.iterator.flatMap { case (doc, acc) =>
              var mustSeen = 0
              var shouldSeen = 0
              var score = 0.0f
              var i = 0
              while (i < nTis) {
                val v = acc.s(i)
                if (!v.isNaN) {
                  if (must(i)) mustSeen += 1 else shouldSeen += 1
                  score += v
                }
                i += 1
              }
              if (!acc.excluded && mustSeen == nMust && shouldSeen >= mm &&
                (mustSeen + shouldSeen) > 0) Iterator.single((doc, score))
              else Iterator.empty
            }
          }
        }

        def addBlock(b: Tagged): Unit = {
          val lo = b.bucket * width
          val hi = lo + width
          val lead = b.rank == 0
          val ti = b.ti
          val scorer = sc(ti)
          val (docs, tfs) = PostingCodec.decodeDocsTfs(b.first_doc, b.cnt,
            b.doc_bytes, b.tf_bytes)
          var i = 0
          while (i < b.cnt) {
            val d = docs(i)
            if (d >= lo && d < hi) {
              var acc = perDoc.getOrNull(d)
              if (acc == null && lead) {
                acc = new DocAcc(nTis)
                perDoc.update(d, acc)
              }
              if (acc != null) {
                if (not(ti)) acc.excluded = true
                else acc.s(ti) = scorer.score(tfs(i).toFloat, b.norm_bytes(i))
              }
            }
            i += 1
          }
        }

        new scala.collection.AbstractIterator[(Long, Float)] {
          private var pendingFlush: Iterator[(Long, Float)] = Iterator.empty
          private var done = false
          private def advance(): Unit = {
            while (!pendingFlush.hasNext && !done) {
              if (it.hasNext) {
                val b = it.next()
                if (b.bucket != curBucket) {
                  pendingFlush = flush()
                  curBucket = b.bucket
                }
                addBlock(b)
              } else {
                pendingFlush = flush()
                done = true
              }
            }
          }
          advance()
          override def hasNext: Boolean = pendingFlush.hasNext
          override def next(): (Long, Float) = {
            val h = pendingFlush.next()
            advance()
            h
          }
        }
      }
  }
}
