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

  /** [[Tagged]] plus the block's doc-range end and block-max metadata
    * (max_tf, max_nb) so the reduce side can bound a bucket's best possible
    * total — and leapfrog non-lead blocks — without decoding.
    */
  final case class TaggedM(bucket: Long, rank: Int, ti: Int, first_doc: Long,
                           last_doc: Long, cnt: Int, doc_bytes: Array[Byte],
                           tf_bytes: Array[Byte], norm_bytes: Array[Byte],
                           max_tf: Int, max_nb: Int)

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

  /** Streaming block-pruned combine for the general boolean shapes —
    * multi-MUST, residual minShouldMatch, NOT — where the scan-side
    * clause-score heaps are unsound (the k-th best single-clause score over
    * one term's postings is no lower bound on the k-th best total over the
    * smaller filtered result set).
    *
    * Identical streaming pipeline to [[combine]] (shuffle-read, decode and
    * accumulate overlap block-at-a-time; the buffered-bucket variant
    * measured ~30% slower by serializing read and decode), plus three
    * per-block prunes decided BEFORE decoding:
    *
    *  1. DOC-EXACT conjunction LEAPFROG (ConjunctionScorer.DoNext sharpened
    *     to candidate granularity, /root/reference/src/Lucene.Net/Search/
    *     ConjunctionScorer.cs:118): per-doc accumulators are created only
    *     while decoding rank-0 (lead/establisher) blocks — which the
    *     (bucket, rank, ti) sort delivers FIRST within each bucket — so
    *     once the first non-lead block arrives the candidate set is FROZEN
    *     and snapshots into one sorted array; a later block whose doc range
    *     contains NO candidate (binary search) cannot touch any accumulator
    *     and its decode is skipped — exact work elimination, not a
    *     threshold decision, strictly stronger than the round-4
    *     lead-block-RANGE test (a range can overlap while holding no actual
    *     candidate). No driver collect, so it holds at ANY lead df (the
    *     10^9-df conjunction at corpus scale). Applies equally at nMust==0
    *     (pure SHOULD + NOT): positive terms establish at rank 0, NOT
    *     blocks at rank 1 only ever EXCLUDE established docs, so a NOT
    *     block with no candidate in range is dead weight.
    *  2. MaxScore block bound vs verified totals: each partition keeps a
    *     k-heap of exact flushed scores (docs that passed the MUST/mm/NOT
    *     filters — order-statistics dominance keeps theta sound even when
    *     some flushed scores are understated by prior skips), and a
    *     non-NOT block is skipped when the heap is full and
    *     `(ub(block) + rest(ti)) * slack < theta` (STRICT; `rest` is the
    *     driver-side sum of the other clauses' global maxima, `slack`
    *     inflates past float32 fold rounding — same algebra as the
    *     scan-side skip, WandSearcher doc). A doc that loses a block this
    *     way has true total < theta <= the partition's k-th best verified
    *     total <= the global k-th best, so its (understated or filtered)
    *     emission cannot affect membership or tie-break of the final top k,
    *     while every true top-k doc's blocks all survive and its score
    *     stays bit-exact. NOT blocks are never bound-skipped (they exclude;
    *     dropping one could un-exclude an emitted doc) — only leapfrogged,
    *     which is sound because an un-overlapped range holds no
    *     accumulators to exclude.
    *  3. A bound-skipped LEAD block's docs are never established, so the
    *     frozen candidate array excludes them automatically — docs it would
    *     have established are dropped consistently everywhere.
    *
    * `ubFns(ti)` maps a block's (max_tf, max_nb) to a double upper bound on
    * that clause's float32 score (null for pure-NOT clauses); `rests(ti)`
    * is the precomputed rest-sum. `theta0` seeds the verified-total
    * threshold before the first flush (sound when it lower-bounds the
    * global k-th best total — e.g. WandSearcher.seedTheta's k-th best exact
    * single-clause score over k distinct docs); NegativeInfinity disarms it.
    */
  def combinePruned(spark: SparkSession, blocks: Dataset[TaggedM],
                    scorers: Array[Similarity.TermScorer], isMust: Array[Boolean],
                    isNot: Array[Boolean], nMust: Int, mm: Int, width: Long,
                    ubFns: Array[(Int, Int) => Double], rests: Array[Double],
                    slack: Double, k: Int,
                    skipped: org.apache.spark.util.LongAccumulator,
                    scanned: org.apache.spark.util.LongAccumulator,
                    theta0: Double = Double.NegativeInfinity): Dataset[(Long, Float)] = {
    import spark.implicits._
    val nTis = scorers.length
    val bScorers = spark.sparkContext.broadcast(scorers)
    val bMust = spark.sparkContext.broadcast(isMust)
    val bNot = spark.sparkContext.broadcast(isNot)
    val bUb = spark.sparkContext.broadcast(ubFns)
    val bRests = spark.sparkContext.broadcast(rests)
    val kk = k
    blocks
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "rank", "ti")
      .mapPartitions { it =>
        val sc = bScorers.value
        val must = bMust.value
        val not = bNot.value
        val ub = bUb.value
        val rest = bRests.value
        val heap = new java.util.PriorityQueue[java.lang.Float](kk + 1)
        var theta = theta0
        val perDoc = new scala.collection.mutable.LongMap[DocAcc]()
        var curBucket = Long.MinValue
        // candidate docs of the CURRENT bucket, frozen (sorted snapshot of
        // the established doc ids) at the first non-lead block — the
        // (bucket, rank, ti) sort guarantees every establisher ran first
        var cand: Array[Long] = null

        def anyCandidateIn(first: Long, last: Long): Boolean = {
          if (cand == null) {
            cand = perDoc.keysIterator.toArray
            java.util.Arrays.sort(cand)
          }
          var loI = 0
          var hiI = cand.length
          while (loI < hiI) {
            val mid = (loI + hiI) >>> 1
            if (cand(mid) < first) loI = mid + 1 else hiI = mid
          }
          loI < cand.length && cand(loI) <= last
        }

        def flush(): Iterator[(Long, Float)] = {
          cand = null
          if (perDoc.isEmpty) Iterator.empty
          else {
            val snap = perDoc.toArray
            perDoc.clear()
            val out = snap.iterator.flatMap { case (doc, acc) =>
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
            }.toArray
            var i = 0
            while (i < out.length) {
              val s = out(i)._2
              if (heap.size < kk) heap.offer(s)
              else if (s > heap.peek()) { heap.poll(); heap.offer(s) }
              if (heap.size == kk) {
                val cand = heap.peek().toDouble
                if (cand > theta) theta = cand
              }
              i += 1
            }
            out.iterator
          }
        }

        def addBlock(b: TaggedM): Unit = {
          val lead = b.rank == 0
          val ti = b.ti
          val isNotTi = not(ti)
          // bound skip (never for NOT blocks)
          if (!isNotTi && heap.size == kk) {
            val f = ub(ti)
            if (f != null &&
              (f(b.max_tf, b.max_nb) + rest(ti)) * slack < theta) {
              skipped.add(1)
              return
            }
          }
          val lo = b.bucket * width
          val hi = lo + width
          if (!lead && !anyCandidateIn(math.max(b.first_doc, lo),
            math.min(b.last_doc, hi - 1))) {
            skipped.add(1)
            return
          }
          scanned.add(1)
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
                if (isNotTi) acc.excluded = true
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

  /** MaxScore-pruned combine for pure disjunctions — the term-level
    * essential/non-essential split (Turtle & Flood, "Query evaluation:
    * strategies and optimizations", IP&M 1995; the role skip lists play in
    * the reference's Advance path, /root/reference/src/Lucene.Net/Codecs/
    * Lucene41/Lucene41SkipWriter.cs:68-69) at block granularity, reduce-side.
    *
    * Why this breaks the block-bound plateau: a disjunction block's bound
    * `ub_i(b) + Σ_{j≠i} gmax_j` carries every OTHER term's global max as
    * rest, so a weak term's blocks are unskippable by bounds alone whenever
    * one strong term exists (WandSearcher round-4 θ-seed negative result).
    * The term-level split attacks the same blocks from the other side:
    * blocks arrive per bucket sorted STRONGEST TERM FIRST (rank = gmax-desc
    * position), and once the remaining terms' gmax sum cannot reach θ —
    * `suffix(rank) * slack < θ` — establishment stops: a doc not yet seen
    * can only be contained in the remaining weaker terms, so its float32
    * total is ≤ suffix(rank) · slack < θ ≤ the global k-th best verified
    * total, and it can never enter the top k. The candidate set freezes,
    * and every later (non-essential) block whose doc range holds NO frozen
    * candidate skips its decode entirely — the classic "scan the dense
    * lists only where a rare-term candidate exists" MaxScore win, which is
    * exactly the unskippable-cross-term-block population. Established docs
    * keep EXACT scores: any block containing a candidate decodes (the
    * binary search finds it), so emissions are bit-identical to the
    * exhaustive combine for every surviving doc.
    *
    * θ starts at `theta0` (WandSearcher's dictionary seed — k distinct docs
    * of one term each with total ≥ their clause score) and grows from
    * flushed verified totals. With the default one-bucket-per-partition
    * geometry the seed is what arms the split from block one; without it
    * (theta0 = -inf) the path degrades gracefully to the exhaustive decode
    * order with bound checks only.
    *
    * `suffix(r)` = Σ over terms with rank ≥ r of gmax (double); `rests`/
    * `ubFns` indexed by ti as in [[combinePruned]]. Emission semantics are
    * the pure-disjunction subset of [[combine]]: every established doc with
    * ≥1 clause emits, slots fold ascending ti (canonical float order).
    */
  def combineShouldPruned(spark: SparkSession, blocks: Dataset[TaggedM],
                          scorers: Array[Similarity.TermScorer],
                          suffix: Array[Double],
                          ubFns: Array[(Int, Int) => Double],
                          rests: Array[Double],
                          slack: Double, k: Int, width: Long, theta0: Double,
                          skipped: org.apache.spark.util.LongAccumulator,
                          scanned: org.apache.spark.util.LongAccumulator): Dataset[(Long, Float)] = {
    import spark.implicits._
    val nTis = scorers.length
    val bScorers = spark.sparkContext.broadcast(scorers)
    val bUb = spark.sparkContext.broadcast(ubFns)
    val bRests = spark.sparkContext.broadcast(rests)
    val bSuffix = spark.sparkContext.broadcast(suffix)
    val kk = k
    blocks
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "rank", "ti")
      .mapPartitions { it =>
        val sc = bScorers.value
        val ub = bUb.value
        val rest = bRests.value
        val suf = bSuffix.value
        val heap = new java.util.PriorityQueue[java.lang.Float](kk + 1)
        var theta = theta0
        val perDoc = new scala.collection.mutable.LongMap[DocAcc]()
        var curBucket = Long.MinValue
        var establishing = true      // flips once per bucket, never back
        var cand: Array[Long] = null // frozen sorted candidates of the bucket

        def anyCandidateIn(first: Long, last: Long): Boolean = {
          if (cand == null) {
            cand = perDoc.keysIterator.toArray
            java.util.Arrays.sort(cand)
          }
          var loI = 0
          var hiI = cand.length
          while (loI < hiI) {
            val mid = (loI + hiI) >>> 1
            if (cand(mid) < first) loI = mid + 1 else hiI = mid
          }
          loI < cand.length && cand(loI) <= last
        }

        def flush(): Iterator[(Long, Float)] = {
          cand = null
          establishing = true
          if (perDoc.isEmpty) Iterator.empty
          else {
            val snap = perDoc.toArray
            perDoc.clear()
            val out = new Array[(Long, Float)](snap.length)
            var o = 0
            while (o < snap.length) {
              val (doc, acc) = snap(o)
              var score = 0.0f
              var i = 0
              while (i < nTis) {
                val v = acc.s(i)
                if (!v.isNaN) score += v
                i += 1
              }
              out(o) = (doc, score)
              if (heap.size < kk) heap.offer(score)
              else if (score > heap.peek()) { heap.poll(); heap.offer(score) }
              if (heap.size == kk) {
                val c = heap.peek().toDouble
                if (c > theta) theta = c
              }
              o += 1
            }
            out.iterator
          }
        }

        def addBlock(b: TaggedM): Unit = {
          val ti = b.ti
          // 1. block-bound skip (same algebra as the scan side, against the
          //    possibly-larger reduce-side theta)
          if ((ub(ti)(b.max_tf, b.max_nb) + rest(ti)) * slack < theta) {
            skipped.add(1)
            return
          }
          // 2. term-level MaxScore: stop establishing once the remaining
          //    (weaker) terms cannot reach theta on their own
          if (establishing && suf(b.rank) * slack < theta) establishing = false
          val lo = b.bucket * width
          val hi = lo + width
          if (!establishing && !anyCandidateIn(math.max(b.first_doc, lo),
            math.min(b.last_doc, hi - 1))) {
            skipped.add(1)
            return
          }
          scanned.add(1)
          val scorer = sc(ti)
          val (docs, tfs) = PostingCodec.decodeDocsTfs(b.first_doc, b.cnt,
            b.doc_bytes, b.tf_bytes)
          var i = 0
          while (i < b.cnt) {
            val d = docs(i)
            if (d >= lo && d < hi) {
              var acc = perDoc.getOrNull(d)
              if (acc == null && establishing) {
                acc = new DocAcc(nTis)
                perDoc.update(d, acc)
              }
              if (acc != null)
                acc.s(ti) = scorer.score(tfs(i).toFloat, b.norm_bytes(i))
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
