package graft

import graft.analysis.WhitespaceAnalyzer
import graft.build.IndexBuilder
import graft.query.Query
import graft.query.Query.{PayloadFunc, PayloadTerm}
import graft.query.Searcher
import graft.score.Bm25
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** PayloadTermQuery semantics vs the reference
  * (/root/reference/src/Lucene.Net/Search/Payloads/PayloadTermQuery.cs,
  * AveragePayloadFunction.cs, MinPayloadFunction.cs, MaxPayloadFunction.cs;
  * payload ingestion: /root/reference/src/Lucene.Net.Analysis.Common/
  * Analysis/Payloads/DelimitedPayloadTokenFilter.cs with FloatEncoder):
  *
  *  - "term|f" indexes `term` with a 4-byte float payload at that position
  *  - positions WITHOUT a stored payload contribute nothing to the fold
  *    (IsPayloadAvailable gates ProcessPayload; the else branch is empty)
  *  - spanScore = BM25 with freq = sum of sloppyFreq(1) = 0.5f per occurrence
  *  - score = spanScore * payloadScore (or payloadScore alone)
  */
class PayloadSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // payloads vary within docs; one occurrence carries NO payload (doc 2);
  // one malformed payload suffix (doc 5) indexes the token verbatim
  private val docs = Seq(
    (0L, "cat|2.0 dog|1.0 cat|4.0 fish"),
    (1L, "cat|0.5 bird|3.0"),
    (2L, "dog cat dog|2.5"),
    (3L, "fish|1.5 fish|1.5 fish|0.5 cat|3.5"),
    (4L, "bird|2.0 horse|1.0"),
    (5L, "cat|xx cat|1.0 horse"),
    (6L, "cat cat|2.0 dog"))

  // 3 input partitions so per-term postings merge ACROSS runs in S4
  // (exercises splitPaySegments + the payload re-block in encodeRun)
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_pay").toString
    IndexBuilder.build(spark.createDataset(docs).toDF("doc_id", "text"), d,
      IndexBuilder.Options(analyzer = WhitespaceAnalyzer, payloads = true,
        numPartitions = 3))
    d
  }

  // ground truth for 'cat': doc -> (tf, per-occurrence STORED payloads in
  // position order; None = bare position, which contributes NOTHING to the
  // fold (reference ProcessPayload's IsPayloadAvailable gate with an empty
  // else branch)). Doc 5's "cat|xx" is NOT the term 'cat' (malformed
  // payloads index the token verbatim); doc 6 mixes a bare and a payload
  // occurrence (Avg divides by payload-carrying occurrences only).
  private val cat: Map[Long, (Int, Seq[Option[Float]])] = Map(
    0L -> (2, Seq(Some(2.0f), Some(4.0f))),
    1L -> (1, Seq(Some(0.5f))),
    2L -> (1, Seq(None)),
    3L -> (1, Seq(Some(3.5f))),
    5L -> (1, Seq(Some(1.0f))),
    6L -> (2, Seq(None, Some(2.0f))))

  private def engine(func: PayloadFunc, includeSpan: Boolean): Seq[(Long, Float)] =
    new Searcher(spark, dir)
      .search(PayloadTerm("cat", func, includeSpan), 10)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq

  private def fold(func: PayloadFunc, all: Seq[Option[Float]]): Float = {
    val fs = all.flatten
    if (fs.isEmpty) 1.0f
    else func match {
      case PayloadFunc.Avg => fs.foldLeft(0.0f)(_ + _) / fs.size
      case PayloadFunc.Min => fs.reduceLeft(math.min)
      case PayloadFunc.Max => fs.reduceLeft(math.max)
    }
  }

  private def expected(func: PayloadFunc, includeSpan: Boolean): Seq[(Long, Float)] = {
    val norms = spark.read.parquet(s"$dir/norms")
      .select("doc_id", "norm").as[(Long, Byte)].collect().toMap
    val stats = spark.read.parquet(s"$dir/stats")
      .as[graft.model.CollectionStats].head()
    val tw = Bm25.termWeight(0L, cat.size.toLong, stats.max_doc, stats.sum_ttf)
    cat.toSeq.map { case (doc, (tf, fs)) =>
      val span = Bm25.score(tw.weightValue, 0.5f * tf, tw.cache, norms(doc))
      val s = if (includeSpan) span * fold(func, fs) else fold(func, fs)
      (doc, s)
    }.sortBy { case (d, s) => (-s, d) }
  }

  test("payload folds, payloadScore only: Avg / Min / Max bit-exact") {
    for (f <- Seq(PayloadFunc.Avg, PayloadFunc.Min, PayloadFunc.Max))
      assert(engine(f, includeSpan = false) == expected(f, includeSpan = false), s"func=$f")
    // spot-checks: Avg doc0 = (2+4)/2; doc2 (bare only) = 1; doc6 (bare +
    // 2.0) averages over the SINGLE payload-carrying occurrence = 2.0
    val avg = engine(PayloadFunc.Avg, includeSpan = false).toMap
    assert(avg(0L) == 3.0f && avg(1L) == 0.5f && avg(2L) == 1.0f &&
      avg(3L) == 3.5f && avg(6L) == 2.0f)
  }

  test("includeSpanScore: spanScore(freq = 0.5f * tf) * payloadScore, bit-exact") {
    for (f <- Seq(PayloadFunc.Avg, PayloadFunc.Min, PayloadFunc.Max))
      assert(engine(f, includeSpan = true) == expected(f, includeSpan = true), s"func=$f")
  }

  test("CheckIndex invariants hold on a payload index") {
    assert(graft.verify.IndexVerifier.verify(spark, dir).isEmpty)
  }

  test("malformed payload suffix indexes the token verbatim") {
    val hits = new Searcher(spark, dir)
      .search(Query.Term("cat|xx"), 10).collect().map(_.getLong(0)).toSeq
    assert(hits == Seq(5L))
  }

  test("payloads work on a DOCS_AND_FREQS index (no positions column)") {
    val d = Files.createTempDirectory("graft_pay_nopos").toString
    IndexBuilder.build(spark.createDataset(docs).toDF("doc_id", "text"), d,
      IndexBuilder.Options(analyzer = WhitespaceAnalyzer, payloads = true,
        positions = false, numPartitions = 2))
    val hits = new Searcher(spark, d)
      .search(PayloadTerm("cat", PayloadFunc.Max, includeSpanScore = false), 10)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(hits == Seq((0L, 4.0f), (3L, 3.5f), (6L, 2.0f), (2L, 1.0f),
      (5L, 1.0f), (1L, 0.5f)))
  }

  test("payload query on a payload-less index fails with a clear error") {
    val d = Files.createTempDirectory("graft_pay_none").toString
    IndexBuilder.build(spark.createDataset(docs).toDF("doc_id", "text"), d,
      IndexBuilder.Options(analyzer = WhitespaceAnalyzer))
    val ex = intercept[Exception] {
      new Searcher(spark, d).search(PayloadTerm("cat"), 10).collect()
    }
    assert(ex.getMessage != null)
  }
}
