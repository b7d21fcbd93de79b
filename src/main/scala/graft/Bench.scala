package graft

import graft.build.IndexBuilder
import graft.fixtures.Transcripts
import graft.gate.Gate
import graft.query.{Query, Searcher}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.LinkedHashMap

/** Round benchmark (driver-run): one JSON line on stdout.
  *
  * Phases:
  *  1. scaling  — synthesize a transcripts corpus once, then run the SAME
  *     index build at local[8] (shuffle=32) and local[32] (shuffle=128): the
  *     sandbox substitution for the north rule's N -> 4N executor scaling
  *     (BASELINE.md protocol). Reports turns/sec at both and the efficiency
  *     (T32/T8)/4.
  *  2. latency  — top-k BM25 query latency on the warm local[32]-built index
  *     over a fixed 24-query set (float32 exhaustive path), p50/p95.
  *  3. gate     — per-query wall time of every SparkEntry.queries entry on
  *     SPARK_GRAFT_SF_DIR (index build included in the first query touching
  *     it, reported separately as gate_index_build).
  */
object Bench {

  private def session(master: String, shuffle: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val wall0 = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val numConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "60000").toLong
    val out = LinkedHashMap[String, Double]()
    val benchDir = "target/bench"

    // ---- phase 1: corpus synth (once) + build at two parallelism levels ----
    val corpusDir = s"$benchDir/turns"
    var turns = 0L
    locally {
      val s = session("local[32]", 128)
      val (_, tSynth) = timed {
        Transcripts.dataset(s, numConvs)
          .repartition(128)
          .write.mode("overwrite").parquet(corpusDir)
      }
      turns = s.read.parquet(corpusDir).count()
      out += "corpus_synth_s" -> tSynth
      s.stop()
    }
    // Segment granularity is data-size-driven and IDENTICAL at both levels
    // (as it would be on a real cluster: segments sized by docs, executors
    // just consume tasks) — tying it to parallelism multiplies the run table.
    val segP = 64
    def buildAt(master: String, shuffle: Int, tag: String, convs: Long): Double = {
      val s = session(master, shuffle)
      import s.implicits._
      val src = if (convs == numConvs) s.read.parquet(corpusDir).as[graft.model.Turn]
                else Transcripts.dataset(s, convs)
      val (_, t) = timed {
        IndexBuilder.buildFromTurns(src, s"$benchDir/index-$tag",
          IndexBuilder.Options(numPartitions = shuffle, overwrite = true,
            segmentPartitions = segP))
      }
      s.stop()
      t
    }
    // JIT warmup: a small untimed build compiles the whole pipeline once for
    // this JVM, so neither measured run pays the interpreter tax.
    buildAt("local[32]", 128, "warm", numConvs / 15)
    val t8 = buildAt("local[8]", 32, "n8", numConvs)
    val t32 = buildAt("local[32]", 128, "n32", numConvs)
    val thr8 = turns / t8
    val thr32 = turns / t32
    val eff = (thr32 / thr8) / 4.0
    out += "build_local8_s" -> t8
    out += "build_local32_s" -> t32

    // ---- phase 2: query latency on the warm local[32] index ----------------
    val latencies = {
      val s = session("local[32]", 32)
      val searcher = new Searcher(s, s"$benchDir/index-n32")
      val queryStrs = Seq(
        // hot heads of the Zipf vocab, mid-df, rare, multi-term, +/- syntax
        "time", "person", "spark", "index", "search", "query",
        "w000500", "w002000", "w010000", "w025000",
        "time person", "spark index", "search query merge",
        "year way day", "+time person", "+spark +index",
        "time -person", "+world -life", "partition shuffle",
        "executor driver stage", "don't", "3.14", "foo.bar", "o'neil")
      // warmup pass (JIT + parquet footer caches)
      queryStrs.take(4).foreach(q => searcher.search(Query.parse(q), 10).collect())
      val ls = queryStrs.map { qs =>
        val (_, t) = timed(searcher.search(Query.parse(qs), 10).collect())
        t
      }.sorted
      s.stop()
      ls
    }
    def pct(xs: Seq[Double], p: Double): Double =
      xs((p * (xs.size - 1)).round.toInt)
    out += "query_p50_ms" -> pct(latencies, 0.5) * 1000
    out += "query_p95_ms" -> pct(latencies, 0.95) * 1000

    // ---- phase 3: driver-facing gate queries at sfDir ----------------------
    {
      val s = session("local[32]", 32)
      val (_, tIdx) = timed(Gate.indexDir(s, sfDir))
      out += "gate_index_build_s" -> tIdx
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val (_, t) = timed {
          try fn(s, sfDir).count()
          catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
        }
        out += name -> t
      }
      s.stop()
    }

    val total = (System.nanoTime() - wall0) / 1e9
    val qs = out.map { case (k, v) => "\"" + k + f"\":$v%.4f" }.mkString("{", ",", "}")
    val extra =
      f""""scaling":{"turns":$turns,"t8_s":$t8%.2f,"t32_s":$t32%.2f,""" +
        f""""turns_per_sec_local8":$thr8%.0f,"turns_per_sec_local32":$thr32%.0f,""" +
        f""""efficiency_n_to_4n":$eff%.3f}"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",$extra}""")
  }
}
