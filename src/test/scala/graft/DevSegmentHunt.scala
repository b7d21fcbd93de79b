package graft

import graft.build.IndexBuilder
import graft.fixtures.Transcripts
import graft.query.{Query, Searcher}
import graft.streaming.{SegmentedSearcher, StreamingIndexer}
import java.nio.file.Files
import scala.util.Random

/** One-off segment-split hunt (dev main, not part of the suite): the SAME
  * corpus appended as RANDOM segment splits (random count, random cut
  * points, mixed positional/DOCS_AND_FREQS verbosity) must search
  * bit-identically to the one-segment batch build — the cross-segment
  * stats-merge/query paths vs the batch path, (id, float32 score) equality
  * on random boolean/phrase/rewrite shapes.
  */
object DevSegmentHunt {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new Random(if (args.nonEmpty) args(0).toLong else 20260821L)
    val convs = 150
    val pool = Transcripts.local(convs).sortBy(t => (t.conv_id, t.turn_idx))

    val batchDir = Files.createTempDirectory("graft_seg_hunt_batch").toString
    IndexBuilder.buildFromTurns(Transcripts.dataset(spark, convs), batchDir)
    val batch = new Searcher(spark, batchDir)

    val vocab = Vector("time", "person", "year", "way", "day", "world", "life",
      "hand", "part", "people", "w000123", "zzznope")
    def term(): String = vocab(rnd.nextInt(vocab.size))
    def randomQuery(): Query = rnd.nextInt(6) match {
      case 0 => Query.Phrase(Seq(term(), term()).distinct match {
        case s if s.size >= 2 => s; case s => s :+ "person"
      }, rnd.nextInt(3))
      case 1 => Query.Bool(must = Seq(term()), should = Seq(term(), term()).distinct,
        mustNot = if (rnd.nextBoolean()) Seq(term()) else Nil, minShouldMatch = 0)
      case 2 => Query.parse("w00123*")
      case 3 => Query.parse(s"${term()}~1")
      case _ => Query.Bool(should = Seq(term(), term(), term()).distinct,
        minShouldMatch = 1 + rnd.nextInt(2))
    }

    var fails = 0
    val splits = if (args.length > 1) args(1).toInt else 6
    (1 to splits).foreach { s =>
      // random cut points: 2-6 chunks in sorted order (ids align with batch)
      val nCuts = 1 + rnd.nextInt(5)
      val cuts = (Seq.fill(nCuts)(1 + rnd.nextInt(pool.size - 1)).distinct.sorted
        :+ pool.size).distinct
      val dir = Files.createTempDirectory(s"graft_seg_hunt_$s").toString
      var prev = 0
      cuts.foreach { c =>
        val positions = s % 2 == 0 || rnd.nextBoolean() // mixed verbosity on odd runs
        StreamingIndexer.appendSegment(spark.createDataset(pool.slice(prev, c)), dir,
          autoCompact = false, positions = positions)
        prev = c
      }
      val seg = new SegmentedSearcher(spark, dir)
      (1 to 25).foreach { i =>
        val q = randomQuery()
        // positional queries need positions in EVERY segment; mixed-verbosity
        // runs restrict to non-positional shapes
        val positional = q.isInstanceOf[Query.Phrase]
        if (!(positional && s % 2 == 1)) {
          val a = seg.search(q, 10).collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
          val b = batch.search(q, 10).collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
          if (a != b) {
            fails += 1
            println(s"SEG-DIVERGE split$s/q$i (${cuts.size} segs): $q\n seg:   $a\n batch: $b")
          }
        }
      }
      println(s"split $s: ${cuts.size} segments checked, fails(sofar)=$fails")
    }
    println(s"SEG_HUNT_RESULT fails=$fails")
    if (fails > 0) sys.exit(1)
  }
}
