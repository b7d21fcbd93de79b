package graft

import graft.operators.Percolator
import graft.query.{MemoryIndex, Query}
import org.scalatest.funsuite.AnyFunSuite

/** Batch percolation: standing query pool vs a doc stream, one narrow pass. */
class PercolatorSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val pool: Seq[(String, Query)] = Seq(
    "and" -> Query.Bool(must = Seq("vector", "search")),
    "phrase" -> Query.Phrase(Seq("quick", "brown")),
    "mm2" -> Query.Bool(should = Seq("spark", "index", "merge"),
      minShouldMatch = 2),
    "not" -> Query.Bool(must = Seq("data"), mustNot = Seq("merge")))

  private val docs = Seq(
    (1L, "vector search engine with a quick brown fox"),
    (2L, "vector only, no second term"),
    (3L, "spark merge pipeline over data"), // mm2 yes; 'not' killed by merge
    (4L, "data processing with index and spark"), // mm2 yes; 'not' yes
    (5L, "quick the brown fox"), // stopword hole breaks slop-0 phrase
    (6L, null.asInstanceOf[String]),
    (7L, ""))

  test("matches equal per-doc MemoryIndex ground truth; null/empty safe") {
    val got = Percolator
      .percolate(docs.toDF("doc_id", "text"), "doc_id", "text", pool)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = (for {
      (id, text) <- docs
      mi = new MemoryIndex(Option(text).getOrElse(""))
      (qid, q) <- pool if mi.matches(q)
    } yield (id, qid)).toSet
    assert(got == want)
    assert(got.contains((1L, "and")) && got.contains((1L, "phrase")))
    assert(!got.contains((2L, "and"))) // one MUST missing
    assert(got.contains((3L, "mm2")) && !got.contains((3L, "not")))
    assert(got.contains((4L, "mm2")) && got.contains((4L, "not")))
    assert(!got.contains((5L, "phrase"))) // position hole breaks adjacency
    assert(!got.exists(_._1 == 6L) && !got.exists(_._1 == 7L))
  }

  test("one narrow pass: the percolate plan has no shuffle") {
    val out = Percolator
      .percolate(docs.toDF("doc_id", "text"), "doc_id", "text", pool)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
