package graft

import graft.build.IndexBuilder
import graft.fixtures.Transcripts
import graft.query.Spans
import graft.query.Spans._
import java.nio.file.Files
import scala.util.Random

/** One-off span-tree hunt (dev main, not part of the suite): random nested
  * span queries — near ordered/unordered (binary + k-ary), or, not, first,
  * position-range — evaluated DISTRIBUTED (Spans.spans over a real index)
  * vs the reference-pinned LOCAL evaluator (Spans.eval) per analyzed doc.
  */
object DevSpanHunt {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val convs = 120
    val dir = Files.createTempDirectory("graft_span_hunt").toString
    IndexBuilder.buildFromTurns(Transcripts.dataset(spark, convs), dir)
    val turns = Transcripts.local(convs).sortBy(t => (t.conv_id, t.turn_idx))
    // pre-analyze once: doc -> term -> sorted positions
    val analyzed = turns.zipWithIndex.map { case (t, i) =>
      (i.toLong, graft.analysis.Analyzer.termPositions(t.text)._1
        .map { case (k, v) => k -> v.toArray })
    }

    val rnd = new Random(if (args.nonEmpty) args(0).toLong else 20260819L)
    val vocab = Vector("time", "person", "year", "way", "day", "world", "life",
      "hand", "part", "people", "thing", "w000123", "zzznope")
    def term(): SpanQuery = SpanTerm(vocab(rnd.nextInt(vocab.size)))
    def tree(depth: Int): SpanQuery = {
      if (depth == 0) term()
      else rnd.nextInt(8) match {
        case 0 => term()
        case 1 => SpanNear(tree(depth - 1), tree(depth - 1), rnd.nextInt(6),
          inOrder = true)
        case 2 => SpanNearK(Seq.fill(2 + rnd.nextInt(2))(tree(depth - 1)),
          rnd.nextInt(8))
        case 3 => SpanNearUnorderedK(Seq.fill(2 + rnd.nextInt(2))(tree(depth - 1)),
          rnd.nextInt(8))
        case 4 => SpanOr(Seq.fill(2 + rnd.nextInt(2))(tree(depth - 1)))
        case 5 => SpanNot(tree(depth - 1), tree(depth - 1))
        case 6 => SpanFirst(tree(depth - 1), 1 + rnd.nextInt(30))
        case _ => SpanPositionRange(tree(depth - 1), rnd.nextInt(10),
          5 + rnd.nextInt(40))
      }
    }

    val shapes = if (args.length > 1) args(1).toInt else 200
    var fails = 0
    var nonEmpty = 0
    (1 to shapes).foreach { i =>
      val q = tree(2 + rnd.nextInt(2))
      val got = Spans.spans(spark, dir, q).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq.sorted
      val want = analyzed.flatMap { case (id, tp) =>
        Spans.eval(q, tp).map { case (s, e) => (id, s, e) }
      }.sorted
      if (got != want) {
        fails += 1
        println(s"SPAN-DIVERGE $i: $q\n got(${got.size}): ${got.take(8)}\nwant(${want.size}): ${want.take(8)}")
      }
      if (want.nonEmpty) nonEmpty += 1
    }
    println(s"span hunt: $shapes shapes, nonEmpty=$nonEmpty, fails=$fails")
    println(s"SPAN_HUNT_RESULT fails=$fails")
    if (fails > 0) sys.exit(1)
  }
}
