package graft

import graft.analysis.{Analyzer, CJKAnalyzer, EnglishAnalyzer}
import graft.build.TermVectors
import org.scalatest.funsuite.AnyFunSuite

/** Term vectors with positions + character offsets: the offsets contract is
  * that `text.substring(start, end)` is the token's untouched surface form
  * (reference OffsetAttribute semantics — filters rewrite terms, never
  * spans), positions are the raw ordinals the positional index uses.
  */
class TermVectorsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("standard-chain spans slice back to the surface form") {
    val text = "The Quick-Brown fox, don't stop o'brien's 3.14 run"
    val (toks, starts, ends) = Analyzer.tokenSpans(text)
    assert(toks.length == starts.length && toks.length == ends.length)
    // every slot's span slices a substring that re-analyzes to that token
    toks.indices.foreach { p =>
      val surface = text.substring(starts(p), ends(p))
      if (toks(p) != null) assert(surface.toLowerCase == toks(p))
      else assert(Analyzer.Stopwords.contains(surface.toLowerCase)) // hole = stopword here
    }
    // spans are ordered and non-overlapping
    toks.indices.drop(1).foreach(p => assert(starts(p) >= ends(p - 1)))
    // tokens agree with the index-time chain slot for slot
    assert(toks == Analyzer.tokens(text))
  }

  test("stemming chain keeps surface spans (possessive included)") {
    val text = "O'Brien's merges were running"
    val (toks, starts, ends) = EnglishAnalyzer.tokenSpans(text)
    assert(toks == EnglishAnalyzer.tokens(text))
    val p = toks.indexWhere(_ != null)
    // first surviving token is the stem of "O'Brien's"; span covers the
    // whole surface form including the possessive
    assert(text.substring(starts(p), ends(p)) == "O'Brien's")
  }

  test("CJK and combining marks keep exact spans") {
    val text = "foo 你好 bar más"
    val (toks, starts, ends) = Analyzer.tokenSpans(text)
    toks.indices.foreach { p =>
      if (toks(p) != null)
        assert(text.substring(starts(p), ends(p)).toLowerCase == toks(p))
    }
    // Han chars emit one token each with a 1-char span
    val han = toks.indices.filter(p => toks(p) != null && toks(p).head >= 0x4e00)
    assert(han.size == 2 && han.forall(p => ends(p) - starts(p) == 1))
    // CJKAnalyzer bigram spans cover both characters
    val (btoks, bstarts, bends) = CJKAnalyzer.tokenSpans(text)
    val bi = btoks.indexOf("你好")
    assert(bi >= 0 && bends(bi) - bstarts(bi) == 2)
    assert(text.substring(bstarts(bi), bends(bi)) == "你好")
    assert(CJKAnalyzer.tokens(text).contains("你好"))
  }

  test("vectorsOf: tf, positions, offsets per term") {
    val text = "spark merge spark the spark"
    val vs = TermVectors.vectorsOf(7L, text).map(v => v.term -> v).toMap
    assert(vs.keySet == Set("spark", "merge"))
    val sp = vs("spark")
    assert(sp.tf == 3 && sp.positions.toSeq == Seq(0, 2, 4))
    assert(sp.starts.toSeq == Seq(0, 12, 22) && sp.ends.toSeq == Seq(5, 17, 27))
    sp.positions.indices.foreach(i =>
      assert(text.substring(sp.starts(i), sp.ends(i)) == "spark"))
    assert(vs("merge").positions.toSeq == Seq(1))
  }

  test("table round-trip: doc-major fetch returns term-sorted vectors") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta alpha"),
      (1L, "gamma the alpha"),
      (2L, "delta")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("tv").toString
    TermVectors.build(spark, docs, dir)
    val got = TermVectors.fetch(spark, dir, Seq(0L, 1L))
      .orderBy("doc_id", "term")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getSeq[Int](3).toSeq))
    assert(got.toSeq == Seq(
      (0L, "alpha", 2, Seq(0, 2)),
      (0L, "beta", 1, Seq(1)),
      (1L, "alpha", 1, Seq(2)),
      (1L, "gamma", 1, Seq(0))))
  }

  test("vectors cross-check against the inverted index (CheckIndex half)") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta alpha gamma"),
      (1L, "gamma the alpha"),
      (2L, "delta beta")).toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("tvx").toString
    graft.build.IndexBuilder.build(docs, s"$base/idx")
    TermVectors.build(spark, docs, s"$base/tv")
    assert(graft.verify.IndexVerifier.verifyTermVectors(spark, s"$base/idx", s"$base/tv").isEmpty)
    // corrupt: drop one vector row -> df/ttf cross-check must fire
    import org.apache.spark.sql.functions.col
    val tv = spark.read.parquet(s"$base/tv")
    tv.filter(!(col("doc_id") === 0L && col("term") === "alpha"))
      .write.mode("overwrite").parquet(s"$base/tv2")
    assert(graft.verify.IndexVerifier.verifyTermVectors(spark, s"$base/idx", s"$base/tv2").nonEmpty)
  }

  test("chains without offset tracking say so") {
    intercept[UnsupportedOperationException] {
      graft.analysis.WhitespaceAnalyzer.tokenSpans("a b")
    }
  }
}
