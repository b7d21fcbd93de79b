package graft

import graft.build.IndexBuilder
import graft.fixtures.Transcripts
import graft.query.{Query, Searcher}
import graft.streaming.{SegmentedSearcher, SnapshotLog, StreamingIndexer}
import graft.verify.IndexVerifier
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming segment ingest: appended segments must be searchable with
  * GLOBAL statistics identical to a batch build of the same corpus (when
  * batches arrive in canonical order), and compaction must produce a base
  * index that passes the CheckIndex invariants and returns the same top-k.
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val numConvs = 150L

  private lazy val dirs: (String, String) = {
    import spark.implicits._
    val streamDir = Files.createTempDirectory("graft_stream").toString
    val batchDir = Files.createTempDirectory("graft_batch").toString
    // canonical order: batch i covers a contiguous conv range, so arrival
    // order == (conv_id, turn_idx) order and doc ids match the batch build
    val all = Transcripts.local(numConvs)
    val cut1 = all.count(_.conv_id < f"c${50}%08d")
    val cut2 = all.count(_.conv_id < f"c${100}%08d")
    val batches = Seq(all.take(cut1), all.slice(cut1, cut2), all.drop(cut2))
    batches.foreach { b =>
      StreamingIndexer.appendSegment(spark.createDataset(b), streamDir,
        autoCompact = false)
    }
    IndexBuilder.buildFromTurns(Transcripts.dataset(spark, numConvs), batchDir)
    (streamDir, batchDir)
  }

  private def queries = Seq(
    Query.Term("time"), Query.Term("w001234"),
    Query.Bool(should = Seq("time", "person")),
    Query.Bool(must = Seq("spark", "query")),
    Query.Bool(should = Seq("time"), mustNot = Seq("person")),
    // phrase over segments: per-segment positional scans + global stats
    Query.Phrase(Seq("time", "person")),
    Query.Phrase(Seq("time", "person"), slop = 2),
    // weighted BoolQ through the parser (per-clause boosts)
    Query.parse("time^2 person"),
    Query.parse("+time person^0.5 -man"),
    // multi-term rewrites against the UNION dictionary across segments
    Query.parse("w00123*"),
    Query.parse("time~1"),
    Query.parse("[w001230 TO w001240] person"),
    // multi-phrase over segments (slot alternatives)
    Query.MultiPhrase(Seq(Seq("time", "year"), Seq("person"))))

  test("three appended segments search identically to the batch build") {
    val seg = new SegmentedSearcher(spark, dirs._1)
    val batch = new Searcher(spark, dirs._2)
    // same corpus, same doc ids -> identical stats -> identical float32 scores
    queries.foreach { q =>
      val a = seg.search(q, 10).collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
      val b = batch.search(q, 10).collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
      assert(a == b, s"segmented diverged on $q\n seg: $a\n batch: $b")
    }
  }

  test("compaction produces a valid base index with identical results") {
    val before = new SegmentedSearcher(spark, dirs._1)
      .search(Query.Bool(should = Seq("time", "person")), 10)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    StreamingIndexer.compact(spark, dirs._1)
    val snap = new SnapshotLog(dirs._1, spark).latest().get
    assert(snap.segments.isEmpty && snap.base.isDefined)
    assert(IndexVerifier.verify(spark, snap.base.get).isEmpty)
    val after = new Searcher(spark, snap.base.get)
      .search(Query.Bool(should = Seq("time", "person")), 10)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(after == before)
    // the segmented reader over the compacted snapshot agrees too
    val segAfter = new SegmentedSearcher(spark, dirs._1)
      .search(Query.Bool(should = Seq("time", "person")), 10)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(segAfter == before)
  }

  test("streaming writer ingests a file stream into segments") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft_src").toString
    val idxDir = Files.createTempDirectory("graft_sidx").toString
    val ckDir = Files.createTempDirectory("graft_ck").toString
    spark.createDataset(Transcripts.local(20)).write.parquet(s"$srcDir/b0")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/b0").schema)
      .parquet(s"$srcDir/*")
      .as[graft.model.Turn]
    val q = StreamingIndexer.writer(stream, idxDir, ckDir).start()
    q.awaitTermination(120000)
    val snap = new SnapshotLog(idxDir, spark).latest()
    assert(snap.isDefined && snap.get.maxDoc > 0)
    val hits = new SegmentedSearcher(spark, idxDir).search(Query.Term("time"), 5)
    assert(hits.count() > 0)
  }
}
