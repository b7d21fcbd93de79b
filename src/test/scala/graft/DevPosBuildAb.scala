package graft

import graft.build.IndexBuilder
import org.apache.spark.sql.SparkSession

/** One positional (DOCS_AND_FREQS_AND_POSITIONS) build over an existing
  * corpus parquet, with per-stage task stats — the A/B probe for the S4
  * positional-straggler fix (RunMaxPositions chunking). Prints wall time
  * and the worst stage's (tasks, median ms, max ms).
  *
  * Usage: Test/runMain graft.DevPosBuildAb [corpusDir] [outDir]
  */
object DevPosBuildAb {
  def main(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("target/bench-sf1/turns")
    val outDir = if (args.length > 1) args(1) else "target/bench-sf1/index-ab"
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null && t.taskInfo.successful) {
          byStage.computeIfAbsent(t.stageId, _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
            .add(t.taskInfo.duration): Unit
        }
    })
    import s.implicits._
    val src = s.read.parquet(corpusDir).as[graft.model.Turn]
    val turns = src.count()
    val segP = (64L * turns / 4000000L).max(64L).toInt
    val t0 = System.nanoTime()
    IndexBuilder.buildFromTurns(src, outDir,
      IndexBuilder.Options(numPartitions = 64, segmentPartitions = segP, positions = true))
    val wall = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    val stages = byStage.asScala.toSeq.flatMap { case (sid, q) =>
      val ds = q.asScala.toArray.sorted
      if (ds.isEmpty) None else Some((sid, ds.length, ds(ds.length / 2), ds.last))
    }.sortBy(-_._4)
    println(f"[posAb] wall=$wall%.1f s turns=$turns")
    stages.take(5).foreach { case (sid, n, med, mx) =>
      println(s"[posAb] stage $sid: $n tasks, median ${med}ms, max ${mx}ms, ratio ${if (med > 0) mx / med else -1}")
    }
    s.stop()
  }
}
