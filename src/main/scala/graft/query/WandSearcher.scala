package graft.query

import graft.codec.{PostingBlock, PostingCodec}
import graft.model.TermDictRow
import graft.score.Bm25
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Block-max pruned top-k search — the north rule's "block-max WAND scoring"
  * realized for a term-range-partitioned columnar postings layout.
  *
  * Lucene 4.8 predates WAND (SURVEY.md §4.2); classic BMW
  * (Ding & Suel, "Faster Top-k Document Retrieval Using Block-Max Indexes",
  * SIGIR 2011) is doc-at-a-time over co-located per-doc posting cursors. A
  * distributed term-partitioned scan has no cheap doc-at-a-time cursor
  * alignment, so this kernel uses the rank-safe block-skipping form
  * (MaxScore-style bound splitting over block-max metadata):
  *
  *  1. bootstrap θ — decode the highest-upper-bound blocks of the
  *     highest-weight (rarest) term and exact-score them; the k-th best
  *     single-term score is a sound lower bound on the final k-th score
  *     (other SHOULD clauses only add ≥ 0).
  *  2. per-term global remainders — rest(i) = Σ_{j≠i} gmax_j where gmax_j is
  *     term j's global block-max score (one tiny metadata aggregation).
  *  3. pruned scan — a block b of term i is skipped without decoding iff
  *     ub_i(b) + rest(i) ≤ θ: every doc in b scores at most that bound, so
  *     none can enter the top k. Residual blocks decode + float32-score via
  *     the shared Bm25 kernel; the combine is identical to the exhaustive
  *     path — hence rank- AND score-identical results (equivalence-tested).
  *
  * ub_i(b) = weightValue_i * max_tf / (max_tf + cache_i[max_nb]): score is
  * monotone ↑tf and ↓cache; max_nb (largest norm byte = shortest doc) gives
  * the smallest cache value (block-max metadata laid down at build time,
  * graft.codec.PostingBlock).
  */
final class WandSearcher(spark: SparkSession, indexDir: String) extends Serializable {
  import spark.implicits._

  private val base = new Searcher(spark, indexDir)
  private def postings: DataFrame = spark.read.parquet(s"$indexDir/postings")

  /** Blocks skipped by the last search (for tests/metrics). */
  @transient var lastSkipped: Option[LongAccumulator] = None
  @transient var lastScanned: Option[LongAccumulator] = None

  def search(q: Query, k: Int): DataFrame = q match {
    case Query.Term(t, boost) =>
      searchShould(Seq(t), k, boost)
    case Query.Bool(Nil, should, Nil, mm) if mm <= 1 && should.nonEmpty =>
      searchShould(should, k, 1.0f)
    case other =>
      // MUST / NOT / min-should-match change the bound algebra; those run on
      // the exhaustive path (same results, no pruning).
      base.search(other, k)
  }

  private def ub(w: Bm25.TermWeight, maxTf: Int, maxNb: Int): Float =
    Bm25.score(w.weightValue, maxTf.toFloat, w.cache, maxNb.toByte)

  private def searchShould(terms: Seq[String], k: Int, boost: Float): DataFrame = {
    val dict: Map[String, TermDictRow] = base.lookup(terms.distinct)
    if (dict.isEmpty) return spark.emptyDataset[(Long, Float)].toDF("doc_id", "score")
    val st = base.stats
    val weights: Map[Long, Bm25.TermWeight] = dict.values.map { d =>
      d.term_id -> Bm25.termWeight(d.term_id, d.df, st.max_doc, st.sum_ttf, boost)
    }.toMap
    val ids = weights.keySet.toSeq

    // ---- one metadata-only job: per-block (term_id, first_doc, ub inputs) --
    // Block metadata is ~1/128th of the postings; collecting it driver-side
    // gives both the per-term global maxima AND the bootstrap block choice
    // without per-term jobs.
    val meta = postings
      .filter(col("term_id").isin(ids: _*))
      .select("term_id", "first_doc", "max_tf", "max_nb")
      .as[(Long, Long, Int, Int)].collect()
    val gmax: Map[Long, Float] = meta.groupBy(_._1).map { case (tid, ms) =>
      tid -> ms.map(m => ub(weights(tid), m._3, m._4)).max
    }
    val rest: Map[Long, Float] =
      ids.map(i => i -> ids.filter(_ != i).map(j => gmax.getOrElse(j, 0.0f)).sum).toMap

    // ---- bootstrap θ: per-doc PARTIAL sums over every term's best blocks ---
    // A doc's partial sum over any subset of its matching terms is a lower
    // bound of its total score, so the k-th best partial sum is a sound
    // starting threshold. One fetch job for all chosen blocks.
    val nBlocks = math.max(1, k / PostingCodec.BlockSize + 1)
    val chosen: Set[(Long, Long)] = meta.groupBy(_._1).iterator.flatMap { case (tid, ms) =>
      val w = weights(tid)
      ms.sortBy(m => -ub(w, m._3, m._4)).take(nBlocks).map(m => (tid, m._2))
    }.toSet
    val bootBlocks =
      if (chosen.isEmpty) Array.empty[PostingBlock]
      else postings
        .filter(col("term_id").isin(ids: _*))
        // pushdown-friendly superset filter, then the exact pair filter
        .filter(col("first_doc").isin(chosen.map(_._2).toSeq: _*))
        .as[PostingBlock]
        .filter(b => chosen.contains((b.term_id, b.first_doc)))
        .collect()
    val partial = new scala.collection.mutable.HashMap[Long, Float]()
    bootBlocks.foreach { b =>
      val w = weights(b.term_id)
      val (docs, tfs, nbs) = PostingCodec.decode(b)
      docs.indices.foreach { i =>
        val s = Bm25.score(w.weightValue, tfs(i).toFloat, w.cache, nbs(i))
        partial.updateWith(docs(i)) { case Some(x) => Some(x + s); case None => Some(s) }
      }
    }
    val bootScores = partial.values.toArray.sorted(Ordering[Float].reverse)
    val theta: Float =
      if (bootScores.length >= k) bootScores(k - 1) else Float.NegativeInfinity

    // ---- pruned scan + exhaustive-identical combine ------------------------
    val skipped = spark.sparkContext.longAccumulator("wand.skippedBlocks")
    val scanned = spark.sparkContext.longAccumulator("wand.scannedBlocks")
    lastSkipped = Some(skipped)
    lastScanned = Some(scanned)
    val bw = spark.sparkContext.broadcast(weights)
    val bRest = spark.sparkContext.broadcast(rest)
    val singleTerm = ids.size == 1

    val hits = postings
      .filter(col("term_id").isin(ids: _*))
      .as[PostingBlock]
      .flatMap { b =>
        val w = bw.value(b.term_id)
        val bound = Bm25.score(w.weightValue, b.max_tf.toFloat, w.cache, b.max_nb.toByte) +
          bRest.value(b.term_id)
        if (bound <= theta) {
          skipped.add(1)
          Iterator.empty
        } else {
          scanned.add(1)
          val (docs, tfs, nbs) = PostingCodec.decode(b)
          docs.indices.iterator.map { i =>
            (docs(i), b.term_id, Bm25.score(w.weightValue, tfs(i).toFloat, w.cache, nbs(i)))
          }
        }
      }

    val combined =
      if (singleTerm) hits.map(h => (h._1, h._3))
      else hits.groupByKey(_._1).mapGroups { (docId, it) =>
        // ascending term_id: the canonical float32 clause-sum order
        val arr = it.toArray.sortBy(_._2)
        (docId, Bm25.sumClauses(arr.map(_._3)))
      }

    combined.toDF("doc_id", "score")
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }
}
