package graft

import graft.analysis.WhitespaceAnalyzer
import graft.build.IndexBuilder
import graft.codec.PostingCodec
import org.scalatest.funsuite.AnyFunSuite

/** Codec-level payload stream roundtrip: buildRuns -> per-posting segment
  * split -> per-position decode (the pieces S4's merge and the query path
  * compose). Pure JVM, no Spark job.
  */
class PayloadCodecSpec extends AnyFunSuite {

  test("buildRuns payload stream splits and decodes per posting") {
    val docs = Seq(
      (0L, "cat|2.0 dog|1.0 cat|4.0 fish"),
      (1L, "cat|0.5 bird|3.0"),
      (2L, "dog cat dog|2.5"),
      (3L, "fish|1.5 fish|1.5 fish|0.5 cat|3.5"),
      (4L, "bird|2.0 horse|1.0"),
      (5L, "cat|xx cat|1.0 horse"))
    val runs = IndexBuilder.buildRuns(0, docs.iterator, WhitespaceAnalyzer,
      positions = true, payloads = true).toSeq
    val r = runs.filter(_.term == "cat").head
    val (d, t, _) = IndexBuilder.decodeRun(r)
    assert(d.toSeq == Seq(0L, 1L, 2L, 3L, 5L))
    assert(t.toSeq == Seq(2, 1, 1, 1, 1))
    val segs = PostingCodec.splitPaySegments(r.pay_bytes, t)
    def floats(i: Int): Seq[Option[Float]] =
      PostingCodec.decodePayloads(segs(i), t(i)).toSeq.map { p =>
        if (p.isEmpty) None
        else Some(java.lang.Float.intBitsToFloat(
          ((p(0) & 0xff) << 24) | ((p(1) & 0xff) << 16) | ((p(2) & 0xff) << 8) | (p(3) & 0xff)))
      }
    assert(floats(0) == Seq(Some(2.0f), Some(4.0f)))
    assert(floats(1) == Seq(Some(0.5f)))
    assert(floats(2) == Seq(None)) // bare token: position carries no payload
    assert(floats(3) == Seq(Some(3.5f)))
    assert(floats(4) == Seq(Some(1.0f))) // "cat|xx" indexed verbatim, not here
    // the "cat|xx" token is its own term
    assert(runs.exists(_.term == "cat|xx"))
  }
}
