package graft

import graft.query.{Query, Searcher}
import org.apache.spark.sql.SparkSession

/** Per-query phrase latency probe over an existing index dir — sizes the
  * two-phase (conjunction-then-positions) opportunity by splitting the bench
  * phrase set into common-common vs mid-mid df pairs.
  *
  * Usage: Test/runMain graft.DevPhraseProbe [indexDir]
  */
object DevPhraseProbe {
  def main(args: Array[String]): Unit = {
    val indexDir = args.headOption.getOrElse("target/bench-sf1/index-ab5")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val searcher = new Searcher(s, indexDir)
    val qs = Seq("\"time person\"", "\"spark index\"",
      "\"search query\"~2", "\"year day\"~3")
    // warm: file listing + termdict cache
    searcher.search(Query.parse("\"spark index\""), 10).collect()
    qs.foreach { q =>
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = searcher.search(Query.parse(q), 10).collect().length
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[phraseProbe] $q%-20s best=${reps.map(_._1).min}%.2f s hits=${reps.head._2}")
    }
    s.stop()
  }
}
