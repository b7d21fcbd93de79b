package graft

import graft.build.IndexBuilder
import graft.fixtures.Transcripts
import graft.query.{MemoryIndex, Query, Searcher}
import java.nio.file.Files
import scala.util.Random

/** One-off percolation differential hunt (dev main, not part of the suite):
  * MemoryIndex (the single-doc percolation engine) and the distributed
  * Searcher are two INDEPENDENT implementations of the same match
  * semantics — for random nested boolean/phrase trees over a real corpus,
  * the set of docs MemoryIndex says match must equal the distributed
  * searcher's result id set.
  */
object DevPercolateHunt {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val convs = 100
    val dir = Files.createTempDirectory("graft_perc_hunt").toString
    IndexBuilder.buildFromTurns(Transcripts.dataset(spark, convs), dir)
    val turns = Transcripts.local(convs).sortBy(t => (t.conv_id, t.turn_idx))
    val minis = turns.zipWithIndex.map { case (t, i) => (i.toLong, new MemoryIndex(t.text)) }
    val searcher = new Searcher(spark, dir)
    val k = turns.size + 10

    val rnd = new Random(if (args.nonEmpty) args(0).toLong else 20260820L)
    val vocab = Vector("time", "person", "year", "way", "day", "world", "life",
      "hand", "part", "people", "thing", "w000123", "zzznope")
    def term(): String = vocab(rnd.nextInt(vocab.size))
    def occ(): Query.Occur = rnd.nextInt(6) match {
      case 0 => Query.Must
      case 5 => Query.MustNot
      case _ => Query.Should
    }
    def leaf(): Query = rnd.nextInt(4) match {
      case 0 =>
        val ts = Seq.fill(2 + rnd.nextInt(2))(term()).distinct match {
          case s if s.size >= 2 => s
          case s                => s :+ "person"
        }
        Query.Phrase(ts, rnd.nextInt(3))
      case _ => Query.Term(term())
    }
    def group(depth: Int): Query = {
      val n = 1 + rnd.nextInt(3)
      Query.BoolQ(Seq.fill(n)((occ(),
        if (depth > 0 && rnd.nextInt(3) == 0) group(depth - 1) else leaf())),
        minShouldMatch = if (rnd.nextInt(4) == 0) 1 else 0)
    }

    var fails = 0
    var nonEmpty = 0
    val shapes = if (args.length > 1) args(1).toInt else 300
    (1 to shapes).foreach { i =>
      val q = group(2)
      val engine = searcher.search(q, k).collect().map(_.getLong(0)).toSet
      val perc = minis.collect { case (id, mi) if mi.matches(q) => id }.toSet
      if (engine != perc) {
        fails += 1
        println(s"PERC-DIVERGE $i: $q\n engine-only=${(engine -- perc).take(5)}" +
          s" perc-only=${(perc -- engine).take(5)} (engine=${engine.size} perc=${perc.size})")
      }
      if (engine.nonEmpty) nonEmpty += 1
    }
    println(s"percolate hunt: $shapes shapes, nonEmpty=$nonEmpty, fails=$fails")
    println(s"PERC_HUNT_RESULT fails=$fails")
    if (fails > 0) sys.exit(1)
  }
}
