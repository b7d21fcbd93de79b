package graft

import graft.codec.{ForCodec, PostingCodec, SmallFloat}
import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {

  test("SmallFloat golden bytes: len 1 -> 124 and frozen table") {
    assert(SmallFloat.encodeNorm(1) == 124.toByte)
    // Frozen from the bit-twiddle formula (FIXTURES.md §2): len -> byte
    val golden = Map(1 -> 124, 2 -> 121, 3 -> 120, 4 -> 120, 5 -> 119,
      8 -> 117, 10 -> 117, 16 -> 116, 64 -> 112, 255 -> 108, 4096 -> 100)
    golden.foreach { case (len, b) =>
      assert((SmallFloat.encodeNorm(len) & 0xff) == b, s"len=$len")
    }
    // len 0: 1/sqrt(0) = +Inf -> overflow byte 0xFF
    assert((SmallFloat.encodeNorm(0) & 0xff) == 0xff)
  }

  test("SmallFloat quantization is idempotent and decode is monotone") {
    for (b <- 1 to 255) {
      val f = SmallFloat.byte315ToSingle(b.toByte)
      assert(SmallFloat.singleToByte315(f) == b.toByte, s"byte $b")
    }
    val decoded = (1 to 255).map(b => SmallFloat.byte315ToSingle(b.toByte))
    assert(decoded == decoded.sorted)
  }

  test("ForCodec round-trip: empty, singleton, all-equal") {
    assert(ForCodec.unpack(ForCodec.pack(Array.emptyLongArray)).isEmpty)
    assert(ForCodec.unpack(ForCodec.pack(Array(42L))).toSeq == Seq(42L))
    val eq = Array.fill(200)(7L)
    val packed = ForCodec.pack(eq)
    assert(packed.length < 10, "all-equal shortcut should be tiny")
    assert(ForCodec.unpack(packed).toSeq == eq.toSeq)
  }

  test("ForCodec round-trip property (incl. >128 blocks, large gaps)") {
    val rnd = new scala.util.Random(123)
    for (iter <- 1 to 300) {
      val n = rnd.nextInt(1000)
      val bound = Seq(10L, 1000000L, Long.MaxValue / 2)(rnd.nextInt(3))
      val xs = Array.fill(n)(math.abs(rnd.nextLong()) % (bound + 1))
      assert(ForCodec.unpack(ForCodec.pack(xs)).toSeq == xs.toSeq, s"iter=$iter")
    }
  }

  test("PostingCodec round-trip across the 128 block boundary") {
    val sizes = Seq(1, 2, 127, 128, 129, 256, 300, 1000)
    for (n <- sizes) {
      val rnd = new scala.util.Random(42 + n)
      val docs = Array.iterate(rnd.nextInt(100).toLong, n)(d => d + 1 + rnd.nextInt(1000))
      val tfs = Array.fill(n)(1 + rnd.nextInt(50))
      val norms = Array.fill(n)(SmallFloat.encodeNorm(1 + rnd.nextInt(500)))
      // per-posting sorted position list of length tf
      val poss: Array[Array[Int]] = tfs.map { tf =>
        val out = new Array[Int](tf)
        var p = rnd.nextInt(5)
        var i = 0
        while (i < tf) { out(i) = p; p += 1 + rnd.nextInt(9); i += 1 }
        out
      }
      val blocks = PostingCodec.encodeRun(9L, docs, tfs, norms, poss).toArray
      assert(blocks.length == (n + 127) / 128)
      val decoded = blocks.map { b =>
        PostingCodec.decodePos(graft.codec.PosBlock(b.term_id, b.first_doc,
          b.cnt, b.doc_bytes, b.tf_bytes, b.norm_bytes, b.pos_bytes))
      }
      val (d2, t2, n2, p2) = decoded.reduceOption { (a, b) =>
        (a._1 ++ b._1, a._2 ++ b._2, a._3 ++ b._3, a._4 ++ b._4)
      }.get
      assert(d2.toSeq == docs.toSeq)
      assert(t2.toSeq == tfs.toSeq)
      assert(n2.toSeq == norms.toSeq)
      assert(p2.map(_.toSeq).toSeq == poss.map(_.toSeq).toSeq)
      blocks.foreach { b =>
        assert(b.term_id == 9L)
        assert(b.cnt <= 128)
        val (bd, bt, bn) = PostingCodec.decode(b)
        assert(b.first_doc == bd.head && b.last_doc == bd.last)
        assert(b.max_tf == bt.max)
        assert(b.max_nb == bn.map(_ & 0xff).max)
      }
    }
  }
}
