package graft

import graft.build.IndexBuilder
import graft.fixtures.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The index CONTENT must be independent of build parallelism (FIXTURES.md §3):
  * doc ids are global ranks via per-partition prefix sums, so docmap/norms/
  * termdict/stats and the decoded (term, doc, tf, norm) posting set must be
  * identical across segment/shuffle partition counts (block grouping may
  * differ — it is layout, not content).
  */
class DeterminismSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def build(segP: Int, shuffle: Int): String = {
    val dir = Files.createTempDirectory(s"graft_det_$segP").toString
    IndexBuilder.buildFromTurns(Transcripts.dataset(spark, 120), dir,
      IndexBuilder.Options(numPartitions = shuffle, segmentPartitions = segP))
    dir
  }

  private def postingsSet(dir: String): Set[(Long, Long, Int, Int)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/postings").as[graft.codec.PostingBlock]
      .flatMap { b =>
        val (docs, tfs, nbs) = graft.codec.PostingCodec.decode(b)
        docs.indices.iterator.map(i => (b.term_id, docs(i), tfs(i), nbs(i) & 0xff))
      }.collect().toSet
  }

  test("index content identical across parallelism (segP 3/8, shuffle 5/8)") {
    val a = build(3, 5)
    val b = build(8, 8)
    def rows(dir: String, table: String, cols: String*): Set[String] =
      spark.read.parquet(s"$dir/$table").select(cols.map(col): _*)
        .collect().map(_.toString).toSet
    assert(rows(a, "docmap", "doc_id", "conv_id", "turn_idx") ==
      rows(b, "docmap", "doc_id", "conv_id", "turn_idx"))
    assert(rows(a, "norms", "doc_id", "len", "norm") ==
      rows(b, "norms", "doc_id", "len", "norm"))
    assert(rows(a, "termdict", "term", "term_id", "df", "ttf") ==
      rows(b, "termdict", "term", "term_id", "df", "ttf"))
    assert(rows(a, "stats", "max_doc", "doc_count", "sum_ttf", "sum_df") ==
      rows(b, "stats", "max_doc", "doc_count", "sum_ttf", "sum_df"))
    assert(postingsSet(a) == postingsSet(b))
  }
}
