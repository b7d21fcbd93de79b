package graft.build

import graft.analysis.Analyzer
import graft.codec.{ForCodec, PostingCodec, PostingBlock, SmallFloat}
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Batch inverted-index build: the Spark-native realization of the reference
  * write path (IndexWriter -> DWPT flush -> SegmentMerger -> commit,
  * SURVEY.md §3.2), all in Dataset/DataFrame ops:
  *
  *  S1 `runs`     docs range-partitioned by doc_id; each task tokenizes its
  *                doc range and emits one compressed posting run per term
  *                (the DWPT-flush analog; hot Zipfian terms are implicitly
  *                sharded across doc-range partitions, which is what defeats
  *                build-side skew — every partition contributes at most its
  *                own doc-range share of a hot term).
  *  S2 `norms`    per-doc emitted-token counts + lossy norm bytes, decoded
  *                from S1's per-partition norms pseudo-runs (no 2nd tokenize).
  *  S3 `termdict` term -> (dense term_id by ascending term, df, ttf).
  *  S4 `postings` runs + term_id, range-repartitioned by (term_id, first_doc),
  *                sort-merged and re-blocked into 128-doc FOR blocks — the
  *                SegmentMerger analog. Output files are term_id-sorted so
  *                Parquet row-group min/max stats act as the term index.
  *  S5 `stats`    collection statistics.
  *
  * Every stage commits to the ManifestStore; completed stages are skipped on
  * re-run (resume mid-merge).
  */
object IndexBuilder {

  /** Pseudo-term carrying per-partition (doc_id, len) runs so norms don't need
    * a second tokenization pass. Sorts before any real term; filtered out of
    * termdict/postings.
    */
  val NormsKey = "\u0000norms"

  /** Max postings per run row. Splitting hot-term runs into uniform chunks is
    * what makes the S4 range partitioning balance by posting mass (a Zipf-hot
    * term becomes many equal rows the range partitioner spreads across
    * partitions) and bounds row sizes at 10^12-doc scale.
    */
  val RunMaxPostings = 8192

  final case class Options(
      numPartitions: Int = 0, // 0 = spark.sql.shuffle.partitions
      overwrite: Boolean = false)

  /** Entry point for the transcripts north star: assigns stable doc_ids by
    * (conv_id, turn_idx) order, writes `docmap`, then builds the index over
    * the `text` column.
    */
  def buildFromTurns(turns: Dataset[Turn], outDir: String,
                     opts: Options = Options()): Unit = {
    val spark = turns.sparkSession
    val manifest = new ManifestStore(outDir, spark)
    if (opts.overwrite) manifest.reset()
    val p = partitions(spark, opts)
    if (!manifest.isDone("docmap")) {
      val t0 = System.nanoTime()
      val withIds = StableIds.attach(
        turns.toDF(), Seq(col("conv_id"), col("turn_idx")), "doc_id", p)
      withIds.select("doc_id", "conv_id", "turn_idx")
        .write.mode("overwrite").parquet(s"$outDir/docmap")
      withIds.select("doc_id", "text")
        .write.mode("overwrite").parquet(s"$outDir/docs")
      withIds.unpersist(blocking = false)
      manifest.commit("docmap", -1L, ms(t0), Some(s"$outDir/docmap"))
    }
    val docs = spark.read.parquet(s"$outDir/docs")
    build(docs, outDir, opts.copy(overwrite = false))
  }

  /** Build over any (doc_id: Long, text: String) DataFrame. */
  def build(docsIn: DataFrame, outDir: String, opts: Options = Options()): Unit = {
    val spark = docsIn.sparkSession
    import spark.implicits._
    val manifest = new ManifestStore(outDir, spark)
    if (opts.overwrite) manifest.reset()
    val p = partitions(spark, opts)

    // ---- S1: per-partition posting runs (DWPT analog) --------------------
    if (!manifest.isDone("runs")) {
      val t0 = System.nanoTime()
      val runs = docsIn
        .select(col("doc_id").cast("long"), col("text"))
        .repartitionByRange(p, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .as[(Long, String)]
        .mapPartitions(buildRuns)
      runs.write.mode("overwrite").parquet(s"$outDir/runs")
      manifest.commit("runs", -1L, ms(t0), Some(s"$outDir/runs"))
    }
    val runs = spark.read.parquet(s"$outDir/runs").as[Run]

    // ---- S2: norms sidecar ----------------------------------------------
    if (!manifest.isDone("norms")) {
      val t0 = System.nanoTime()
      val norms = runs.filter(_.term == NormsKey).flatMap { r =>
        val (docs, lens, _) = decodeRun(r)
        docs.indices.iterator.map { i =>
          NormRow(docs(i), lens(i), SmallFloat.encodeNorm(lens(i)))
        }
      }
      norms.write.mode("overwrite").parquet(s"$outDir/norms")
      manifest.commit("norms", -1L, ms(t0), Some(s"$outDir/norms"))
    }

    // ---- S3: term dictionary with dense term_ids by term order -----------
    if (!manifest.isDone("termdict")) {
      val t0 = System.nanoTime()
      val termAgg = runs.toDF()
        .filter(col("term") =!= NormsKey)
        .groupBy("term")
        .agg(sum("cnt").as("df"), sum("sum_tf").as("ttf"))
      val dict = StableIds.attach(termAgg, Seq(col("term")), "term_id", p)
      dict.select("term", "term_id", "df", "ttf")
        .write.mode("overwrite").parquet(s"$outDir/termdict")
      dict.unpersist(blocking = false)
      manifest.commit("termdict", -1L, ms(t0), Some(s"$outDir/termdict"))
    }
    val termdict = spark.read.parquet(s"$outDir/termdict")

    // ---- S4: global sort-merge into 128-doc blocks (SegmentMerger analog) -
    if (!manifest.isDone("postings")) {
      val t0 = System.nanoTime()
      val keyed = runs.toDF()
        .filter(col("term") =!= NormsKey)
        .join(termdict.select("term", "term_id"), "term")
        .drop("term")
        .repartitionByRange(p, col("term_id"), col("first_doc"))
        .sortWithinPartitions("term_id", "first_doc")
        .as[KeyedRun]
      val blocks = keyed.mapPartitions(mergeRuns)
      blocks.write.mode("overwrite").parquet(s"$outDir/postings")
      manifest.commit("postings", -1L, ms(t0), Some(s"$outDir/postings"))
    }

    // ---- S5: collection statistics ----------------------------------------
    if (!manifest.isDone("stats")) {
      val t0 = System.nanoTime()
      val normsDf = spark.read.parquet(s"$outDir/norms")
      val (maxDoc, sumTtf) = normsDf
        .agg(count("*"), coalesce(sum("len"), lit(0L)))
        .as[(Long, Long)].head()
      val sumDf = termdict.agg(coalesce(sum("df"), lit(0L))).as[Long].head()
      Seq(CollectionStats(maxDoc, maxDoc, sumTtf, sumDf)).toDS()
        .write.mode("overwrite").parquet(s"$outDir/stats")
      manifest.commit("stats", 1L, ms(t0), Some(s"$outDir/stats"))
    }
  }

  final case class KeyedRun(
      term_id: Long, first_doc: Long, last_doc: Long, cnt: Int, sum_tf: Long,
      max_tf: Int, max_nb: Int, doc_bytes: Array[Byte], tf_bytes: Array[Byte],
      norm_bytes: Array[Byte])

  private def partitions(spark: SparkSession, opts: Options): Int =
    if (opts.numPartitions > 0) opts.numPartitions
    else spark.sessionState.conf.numShufflePartitions

  private def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000L

  /** Tokenize one doc-range partition into per-term runs + a norms pseudo-run.
    * The DocInverter/TermsHash analog
    * (/root/reference/src/Lucene.Net/Index/DocInverterPerField.cs:131-195,
    * TermsHashPerField.cs:31-88): in-memory term hash with growable postings
    * buffers, flushed as compressed runs at partition end.
    */
  private def buildRuns(it: Iterator[(Long, String)]): Iterator[Run] = {
    final class Acc {
      val docs = new mutable.ArrayBuffer[Long]()
      val tfs = new mutable.ArrayBuffer[Int]()
      val norms = new mutable.ArrayBuffer[Byte]()
    }
    val terms = new mutable.HashMap[String, Acc]()
    val normDocs = new mutable.ArrayBuffer[Long]()
    val normLens = new mutable.ArrayBuffer[Int]()
    it.foreach { case (docId, text) =>
      val (tf, len) = Analyzer.termFreqs(if (text == null) "" else text)
      val nb = SmallFloat.encodeNorm(len)
      normDocs += docId
      normLens += len
      tf.foreach { case (t, f) =>
        val acc = terms.getOrElseUpdate(t, new Acc)
        acc.docs += docId
        acc.tfs += f
        acc.norms += nb
      }
    }
    val termRuns = terms.iterator.flatMap { case (term, acc) =>
      chunkedRuns(term, acc.docs.toArray, acc.tfs.toArray, acc.norms.toArray)
    }
    val normsRun =
      if (normDocs.isEmpty) Iterator.empty
      else chunkedRuns(NormsKey, normDocs.toArray, normLens.toArray,
        new Array[Byte](normDocs.length))
    termRuns ++ normsRun
  }

  private def chunkedRuns(term: String, docs: Array[Long], tfs: Array[Int],
                          norms: Array[Byte]): Iterator[Run] =
    if (docs.length <= RunMaxPostings) Iterator.single(encodeRunRow(term, docs, tfs, norms))
    else docs.indices.grouped(RunMaxPostings).map { idxs =>
      val (a, b) = (idxs.head, idxs.last + 1)
      encodeRunRow(term, docs.slice(a, b), tfs.slice(a, b), norms.slice(a, b))
    }

  private def encodeRunRow(term: String, docs: Array[Long], tfs: Array[Int],
                           norms: Array[Byte]): Run = {
    val gaps = new Array[Long](docs.length - 1)
    var i = 1
    while (i < docs.length) {
      val g = docs(i) - docs(i - 1)
      require(g > 0, s"doc ids must be strictly increasing within a run ($term)")
      gaps(i - 1) = g
      i += 1
    }
    var sumTf = 0L
    var maxTf = 0
    var maxNb = 0
    i = 0
    while (i < tfs.length) {
      sumTf += tfs(i)
      if (tfs(i) > maxTf) maxTf = tfs(i)
      val nb = norms(i) & 0xff
      if (nb > maxNb) maxNb = nb
      i += 1
    }
    Run(term, docs.head, docs.last, docs.length, sumTf, maxTf, maxNb,
      ForCodec.pack(gaps), ForCodec.pack(tfs.map(_.toLong)), norms)
  }

  private def decodeRun(r: Run): (Array[Long], Array[Int], Array[Byte]) = {
    val gaps = ForCodec.unpack(r.doc_bytes)
    val tfs = ForCodec.unpack(r.tf_bytes).map(_.toInt)
    val docs = new Array[Long](r.cnt)
    var i = 0
    var d = r.first_doc
    while (i < r.cnt) {
      if (i > 0) d += gaps(i - 1)
      docs(i) = d
      i += 1
    }
    (docs, tfs, r.norm_bytes)
  }

  /** Streaming merge of (term_id, first_doc)-sorted runs into final blocks.
    * Runs of one term cover disjoint doc ranges (they come from disjoint
    * doc-range partitions), so merging is concatenate + re-block.
    */
  private def mergeRuns(it: Iterator[KeyedRun]): Iterator[PostingBlock] = {
    val buf = it.buffered
    new Iterator[PostingBlock] {
      private var pending: Iterator[PostingBlock] = Iterator.empty
      override def hasNext: Boolean = pending.hasNext || buf.hasNext
      override def next(): PostingBlock = {
        if (!pending.hasNext) {
          val tid = buf.head.term_id
          val docs = new mutable.ArrayBuffer[Long]()
          val tfs = new mutable.ArrayBuffer[Int]()
          val norms = new mutable.ArrayBuffer[Byte]()
          var lastDoc = -1L
          while (buf.hasNext && buf.head.term_id == tid) {
            val r = buf.next()
            require(r.first_doc > lastDoc,
              s"overlapping runs for term $tid: ${r.first_doc} <= $lastDoc")
            val (d, t, n) = decodeRun(
              Run("", r.first_doc, r.last_doc, r.cnt, r.sum_tf, r.max_tf,
                r.max_nb, r.doc_bytes, r.tf_bytes, r.norm_bytes))
            docs ++= d
            tfs ++= t
            norms ++= n
            lastDoc = r.last_doc
          }
          pending = PostingCodec.encodeRun(tid, docs.toArray, tfs.toArray, norms.toArray)
        }
        pending.next()
      }
    }
  }
}
