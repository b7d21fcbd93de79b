package graft

import graft.build.IndexBuilder
import graft.fixtures.Transcripts
import graft.query.{Query, WandSearcher}
import org.apache.spark.sql.SparkSession

/** Dev-only A/B for the term-level MaxScore split (NOT part of the driver
  * contract): same warm index (target/devindex, shared with DevLatency),
  * same 24-query bench set, WandSearcher with the split+seed ON (default)
  * vs OFF (maxScoreMinBlocks = MaxValue), interleaved min-of-2 per side.
  * Prints per-query time + skipped/scanned bucket-copies per side. Run:
  *   sbt -batch "Test/runMain graft.DevWandAb"
  */
object DevWandAb {
  def main(args: Array[String]): Unit = {
    val idx = "target/devindex"
    if (!new java.io.File(s"$idx/stats").exists()) {
      println(s"[dev] building 4M-turn positional index at $idx ...")
      val s = SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "localhost").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
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
    val on = new WandSearcher(s, idx)
    val off = new WandSearcher(s, idx,
      maxScoreMinBlocksOpt = Some(Long.MaxValue))
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val queryStrs =
      if (args.headOption.contains("skew"))
        Seq("w010000 time", "w025000 person", "w002000 spark index",
          "w010000 year way", "w000500 search query", "w010000 w025000 time")
      else Seq(
        "time", "person", "spark", "index", "search", "query",
        "w000500", "w002000", "w010000", "w025000",
        "time person", "spark index", "search query merge",
        "year way day", "+time person", "+spark +index",
        "time -person", "+world -life", "partition shuffle",
        "executor driver stage", "don't", "3.14", "foo.bar", "o'neil")
    queryStrs.take(4).foreach { q =>
      on.search(Query.parse(q), 10).collect()
      off.search(Query.parse(q), 10).collect()
    }
    var (skOn, scOn, skOff, scOff) = (0L, 0L, 0L, 0L)
    var (tOnSum, tOffSum) = (0.0, 0.0)
    println(f"${"query"}%-24s ${"on_ms"}%8s ${"off_ms"}%8s ${"on sk/sc"}%16s ${"off sk/sc"}%16s")
    queryStrs.foreach { q =>
      val o1 = timed(on.search(Query.parse(q), 10).collect())
      val s1 = on.lastSkipped.map(_.value.longValue).getOrElse(0L)
      val c1 = on.lastScanned.map(_.value.longValue).getOrElse(0L)
      val f1 = timed(off.search(Query.parse(q), 10).collect())
      val s2 = off.lastSkipped.map(_.value.longValue).getOrElse(0L)
      val c2 = off.lastScanned.map(_.value.longValue).getOrElse(0L)
      val f2 = timed(off.search(Query.parse(q), 10).collect())
      val o2 = timed(on.search(Query.parse(q), 10).collect())
      val (tOn, tOff) = (math.min(o1, o2), math.min(f1, f2))
      skOn += s1; scOn += c1; skOff += s2; scOff += c2
      tOnSum += tOn; tOffSum += tOff
      println(f"$q%-24s ${tOn * 1000}%8.1f ${tOff * 1000}%8.1f ${s1 + "/" + c1}%16s ${s2 + "/" + c2}%16s")
    }
    println(f"[dev] ON  total=${tOnSum * 1000}%8.1f ms ratio=${skOn.toDouble / math.max(skOn + scOn, 1)}%.3f (sk=$skOn sc=$scOn)")
    println(f"[dev] OFF total=${tOffSum * 1000}%8.1f ms ratio=${skOff.toDouble / math.max(skOff + scOff, 1)}%.3f (sk=$skOff sc=$scOff)")
    s.stop()
  }
}
