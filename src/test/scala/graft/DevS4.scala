package graft

import graft.build.IndexBuilder
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev-only S4 isolation: build the index once (manifest-resumable), then
  * re-time ONLY the postings stage by deleting its manifest entry + output
  * between runs — A/B of merge/shuffle changes without re-tokenizing.
  * Prints per-stage task-time distributions (straggler/spill/GC diagnosis).
  *   sbt -batch "Test/runMain graft.DevS4 [master] [shuffle] [samples] [conf=k=v,...]"
  */
object DevS4 {

  private final class StageStats extends SparkListener {
    case class Agg(var n: Int = 0, var run: Long = 0, var maxRun: Long = 0,
                   var gc: Long = 0, var spillMem: Long = 0, var spillDisk: Long = 0,
                   var shufWriteB: Long = 0, var shufWriteMs: Long = 0,
                   var shufReadB: Long = 0, var fetchWaitMs: Long = 0,
                   var times: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer())
    val stages = mutable.LinkedHashMap[Int, Agg]()
    val names = mutable.HashMap[Int, String]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      val a = stages.getOrElseUpdate(t.stageId, Agg())
      val m = t.taskMetrics
      if (m != null) {
        a.n += 1; a.run += m.executorRunTime; a.maxRun = math.max(a.maxRun, m.executorRunTime)
        a.gc += m.jvmGCTime; a.spillMem += m.memoryBytesSpilled; a.spillDisk += m.diskBytesSpilled
        a.shufWriteB += m.shuffleWriteMetrics.bytesWritten
        a.shufWriteMs += m.shuffleWriteMetrics.writeTime / 1000000L
        a.shufReadB += m.shuffleReadMetrics.totalBytesRead
        a.fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
        a.times += m.executorRunTime
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
      names(s.stageInfo.stageId) = s.stageInfo.name.takeWhile(_ != '\n').take(60)
    }
    def report(): Unit = {
      stages.toSeq.sortBy(_._1).foreach { case (id, a) =>
        val ts = a.times.sorted
        val med = if (ts.isEmpty) 0L else ts(ts.size / 2)
        println(f"[devs4-stage] id=$id%-4d n=${a.n}%-4d run=${a.run / 1000.0}%7.1fs med=${med / 1000.0}%6.1fs max=${a.maxRun / 1000.0}%6.1fs gc=${a.gc / 1000.0}%5.1fs spill=${(a.spillDisk / 1e6).toLong}%6dMB shW=${(a.shufWriteB / 1e6).toLong}%6dMB/${a.shufWriteMs / 1000.0}%5.1fs shR=${(a.shufReadB / 1e6).toLong}%6dMB wait=${a.fetchWaitMs / 1000.0}%5.1fs  ${names.getOrElse(id, "?")}%s")
      }
      stages.clear(); names.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val master = args.headOption.getOrElse("local[4]")
    val shuffle = args.lift(1).map(_.toInt).getOrElse(16)
    val samples = args.lift(2).map(_.toInt).getOrElse(2)
    val extraConf: Seq[(String, String)] = args.lift(3).toSeq.flatMap(_.split(',').toSeq)
      .map { kv => val Array(k, v) = kv.split('='); (k, v) }
    val corpus = "target/devcorpus"
    val dir = s"target/devs4-index-$shuffle"
    def session(m: String): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val b = SparkSession.builder().master(m)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "localhost")
      extraConf.foreach { case (k, v) => b.config(k, v) }
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    locally {
      val s = session("local[8]")
      if (!new java.io.File(s"$corpus/_SUCCESS").exists()) {
        graft.fixtures.Transcripts.dataset(s, 1000000L).repartition(128)
          .write.mode("overwrite").parquet(corpus)
      }
      import s.implicits._
      // full build once (S1 runs cached by the manifest thereafter)
      IndexBuilder.buildFromTurns(s.read.parquet(corpus).as[graft.model.Turn], dir,
        IndexBuilder.Options(numPartitions = shuffle, segmentPartitions = 64,
          positions = false))
      s.stop()
    }
    val ts = (1 to samples).map { i =>
      rm(new java.io.File(s"$dir/postings"))
      rm(new java.io.File(s"$dir/_manifest/postings.json"))
      try { new ProcessBuilder("sync").start().waitFor(); Thread.sleep(2000) }
      catch { case _: Throwable => }
      val s = session(master)
      val stats = new StageStats
      s.sparkContext.addSparkListener(stats)
      import s.implicits._
      val t0 = System.nanoTime()
      IndexBuilder.buildFromTurns(s.read.parquet(corpus).as[graft.model.Turn], dir,
        IndexBuilder.Options(numPartitions = shuffle, segmentPartitions = 64,
          positions = false))
      val t = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[devs4] sample $i: $t%.1f s")
      stats.report()
      s.stop()
      t
    }
    println(f"[devs4] master=$master shuffle=$shuffle conf=$extraConf s4 samples: ${ts.map(t => f"$t%.1f").mkString(", ")} min=${ts.min}%.1f")
  }
}
