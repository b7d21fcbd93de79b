package graft

import graft.build.IndexBuilder
import graft.fixtures.Transcripts
import graft.query.{Query, Searcher, WandSearcher}
import org.apache.spark.sql.SparkSession

/** Dev-only latency harness (NOT part of the driver contract): builds the
  * bench-sized positional index ONCE into target/devindex and times the
  * bench query sets against it, so searcher changes can be A/B'd without
  * paying the full Bench protocol (~12 min). Run:
  *   sbt -batch "Test/runMain graft.DevLatency [phrase|bool|all]"
  */
object DevLatency {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("all")
    val idx = "target/devindex"
    if (!new java.io.File(s"$idx/stats").exists()) {
      println(s"[dev] building 4M-turn positional index at $idx ...")
      val s = SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "localhost").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      import s.implicits._
      val t0 = System.nanoTime()
      IndexBuilder.buildFromTurns(Transcripts.dataset(s, 1000000L), idx,
        IndexBuilder.Options(numPartitions = 32, segmentPartitions = 64,
          positions = true))
      println(f"[dev] built in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      s.stop()
    }
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val searcher = new Searcher(s, idx)
    val wand = new WandSearcher(s, idx)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def pct(xs: Seq[Double], p: Double): Double =
      if (xs.isEmpty) 0 else xs.sorted.apply((p * (xs.size - 1)).round.toInt)
    def series(name: String, qs: Seq[String], run: String => Unit): Unit = {
      qs.take(3).foreach(run) // warmup
      val ts = qs.map(q => timed(run(q)))
      println(f"[dev] $name%-8s p50=${pct(ts, 0.5) * 1000}%7.1f ms  " +
        f"p95=${pct(ts, 0.95) * 1000}%7.1f ms  " +
        ts.map(t => f"${t * 1000}%.0f").mkString("[", ",", "]"))
    }

    val phraseStrs = Seq("\"time person\"", "\"spark index\"",
      "\"search query\"~2", "\"year day\"~3")
    val queryStrs = Seq(
      "time", "person", "spark", "index", "search", "query",
      "w000500", "w002000", "w010000", "w025000",
      "time person", "spark index", "search query merge",
      "year way day", "+time person", "+spark +index",
      "time -person", "+world -life", "partition shuffle",
      "executor driver stage", "don't", "3.14", "foo.bar", "o'neil")

    val conjStrs = Seq("+time person", "+spark +index", "time -person",
      "+world -life", "+time +person", "+search +query +merge",
      "+w000500 +time", "+time +w000500", "+partition +shuffle")

    if (what == "phrase" || what == "all")
      series("phrase", phraseStrs, q => searcher.search(Query.parse(q), 10).collect())
    if (what == "bool" || what == "all") {
      series("exhaust", queryStrs, q => searcher.search(Query.parse(q), 10).collect())
      series("wand", queryStrs, q => wand.search(Query.parse(q), 10).collect())
    }
    if (what == "conj" || what == "all") {
      // interleaved min-of-2 per engine per query: sequential series confound
      // engine with cache warmth on this VM (measured ~20% order bias)
      conjStrs.take(3).foreach { q =>
        searcher.search(Query.parse(q), 10).collect()
        wand.search(Query.parse(q), 10).collect()
      }
      var sk = 0L; var sc = 0L
      val pairs = conjStrs.map { q =>
        val e1 = timed(searcher.search(Query.parse(q), 10).collect())
        val w1 = timed(wand.search(Query.parse(q), 10).collect())
        val w2 = timed(wand.search(Query.parse(q), 10).collect())
        val e2 = timed(searcher.search(Query.parse(q), 10).collect())
        sk += wand.lastSkipped.map(_.value.longValue).getOrElse(0L)
        sc += wand.lastScanned.map(_.value.longValue).getOrElse(0L)
        (math.min(e1, e2), math.min(w1, w2))
      }
      val ex = pairs.map(_._1); val wd = pairs.map(_._2)
      println(f"[dev] conj-ex p50=${pct(ex, 0.5) * 1000}%7.1f ms  " +
        ex.map(t => f"${t * 1000}%.0f").mkString("[", ",", "]"))
      println(f"[dev] conj-wd p50=${pct(wd, 0.5) * 1000}%7.1f ms  " +
        wd.map(t => f"${t * 1000}%.0f").mkString("[", ",", "]"))
      println(f"[dev] conj skip ratio = ${sk.toDouble / math.max(sk + sc, 1)}%.3f (skipped=$sk scanned=$sc)")
    }
    s.stop()
  }
}
