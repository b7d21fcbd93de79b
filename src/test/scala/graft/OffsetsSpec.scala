package graft

import graft.analysis.Analyzer
import graft.build.IndexBuilder
import graft.codec.{ForCodec, PostingCodec}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Postings-level character offsets — the IndexOptions ladder's 4th rung
  * (DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS): codec round-trips, and an
  * end-to-end multi-partition build whose decoded offsets slice the original
  * text back to each occurrence's surface form.
  */
class OffsetsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("offset segment codec round-trips, incl. split for re-blocking") {
    val postings = Array(
      Array(0, 5, 12, 17, 30, 30),    // tf=3 (one empty-span pair allowed)
      Array(2, 9),                    // tf=1
      Array(100, 107, 200, 212))      // tf=2
    val tfs = Array(3, 1, 2)
    val stream = {
      val buf = new java.io.ByteArrayOutputStream()
      postings.foreach(p => buf.write(PostingCodec.encodeOffSegment(p)))
      buf.toByteArray
    }
    val back = PostingCodec.unpackOffsets(stream, tfs)
    assert(back.map(_.toSeq).toSeq == postings.map(_.toSeq).toSeq)
    val segs = PostingCodec.splitOffSegments(stream, tfs)
    assert(segs.map(_.length).sum == stream.length)
    segs.zipWithIndex.foreach { case (seg, i) =>
      assert(PostingCodec.unpackOffsets(seg, Array(tfs(i))).head.toSeq ==
        postings(i).toSeq)
    }
  }

  test("end-to-end: postings offsets slice the stored text (multi-partition merge)") {
    import spark.implicits._
    val texts = Seq(
      "The vector Spark merge, vector again",
      "spark-only doc here",
      "vector at the start",
      "no match doc",
      "vector vector vector")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("offidx").toString
    IndexBuilder.build(docs, dir,
      IndexBuilder.Options(numPartitions = 3, offsets = true))
    assert(graft.verify.IndexVerifier.verify(spark, dir).isEmpty)
    val tid = spark.read.parquet(s"$dir/termdict")
      .filter(col("term") === "vector").select("term_id").as[Long].head()
    val got = spark.read.parquet(s"$dir/postings")
      .filter(col("term_id") === tid)
      .select("first_doc", "cnt", "doc_bytes", "tf_bytes", "off_bytes")
      .as[(Long, Int, Array[Byte], Array[Byte], Array[Byte])]
      .collect()
      .flatMap { case (firstDoc, cnt, docB, tfB, offB) =>
        val gaps = ForCodec.unpack(docB)
        val tfs = ForCodec.unpack(tfB).map(_.toInt)
        val offs = PostingCodec.unpackOffsets(offB, tfs)
        var d = firstDoc
        (0 until cnt).map { i =>
          if (i > 0) d += gaps(i - 1)
          (d, offs(i))
        }
      }.toMap
    // every stored span slices the ORIGINAL text back to "vector"
    got.foreach { case (docId, pairs) =>
      pairs.grouped(2).foreach { case Array(s, e) =>
        assert(texts(docId.toInt).substring(s, e).toLowerCase == "vector",
          s"doc $docId span ($s,$e)")
      }
    }
    // and they agree with the analyzer's span tracking, occurrence for
    // occurrence
    texts.zipWithIndex.foreach { case (t, i) =>
      val (toks, starts, ends) = Analyzer.tokenSpans(t)
      val want = toks.indices.filter(p => toks(p) == "vector")
        .flatMap(p => Seq(starts(p), ends(p)))
      if (want.nonEmpty) assert(got(i.toLong).toSeq == want, s"doc $i")
      else assert(!got.contains(i.toLong))
    }
  }

  test("positions-only build stores no offsets; offsets require positions") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("noff").toString
    IndexBuilder.build(docs, dir)
    val offLens = spark.read.parquet(s"$dir/postings")
      .select("off_bytes").as[Array[Byte]].collect()
    assert(offLens.forall(_.isEmpty))
    intercept[IllegalArgumentException] {
      IndexBuilder.build(docs, java.nio.file.Files.createTempDirectory("bad").toString,
        IndexBuilder.Options(positions = false, offsets = true))
    }
  }
}
