package graft

import graft.operators.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

/** Connected components vs a local union-find oracle: deterministic shapes
  * (chains exercise the pointer-jumping depth, cliques the min-agg) plus a
  * seeded random graph.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(v => v -> find(v)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.components(edges.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, clique, and separate components") {
    // a 6-chain (worst diameter), a 3-clique, one isolated pair
    val edges = Seq[(Long, Long)](
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (30L, 31L))
    val got = run(edges)
    assert(got == unionFind(32, edges))
    assert((10L to 15L).forall(got(_) == 10L))
    assert((20L to 22L).forall(got(_) == 20L))
  }

  test("seeded random graph matches union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(220)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter(e => e._1 != e._2)
    assert(run(edges) == unionFind(150, edges))
  }

  test("groups sizes") {
    import spark.implicits._
    val edges = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (7L, 8L))
    val got = ConnectedComponents.groups(edges.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 3L), (7L, 2L)))
  }

  test("empty edge list returns an empty frame, not an NPE") {
    // a corpus with zero candidate pairs must flow through dedup_groups
    // cleanly (regression: the label-sum aggregate returned null on an
    // empty label table and compareTo threw)
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val comp = ConnectedComponents.components(empty)
    assert(comp.columns.toSeq == Seq("doc_id", "root"))
    assert(comp.count() == 0)
    assert(ConnectedComponents.groups(empty).count() == 0)
  }
}
