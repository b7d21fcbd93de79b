package graft

import graft.build.IndexBuilder
import org.apache.spark.sql.SparkSession

/** Dev-only per-stage scaling profile: one warmup, then one DOCS_AND_FREQS
  * build at local[4] and one at local[1] (KEEPING the manifests), printing
  * each stage's wall ms at both levels — locates the Amdahl bottleneck.
  *   sbt -batch "Test/runMain graft.DevStage"
  */
object DevStage {
  def main(args: Array[String]): Unit = {
    val corpus = "target/devcorpus"
    locally {
      val s = SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "localhost").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      if (!new java.io.File(s"$corpus/_SUCCESS").exists()) {
        graft.fixtures.Transcripts.dataset(s, 1000000L).repartition(128)
          .write.mode("overwrite").parquet(corpus)
      }
      s.stop()
    }
    var seq = 0
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def build(master: String, shuffle: Int, convs: Long): (Double, String) = {
      seq += 1
      val gc0 = gcMs()
      val dir = s"target/devstage-$seq"
      val s = SparkSession.builder().master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "localhost").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val stages = new scala.collection.mutable.ArrayBuffer[(Int, String, Int, Long, Long, Long)]()
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val t0s = scala.collection.concurrent.TrieMap[Int, Long]()
        private val taskSum = scala.collection.concurrent.TrieMap[Int, Long]()
        private val taskMax = scala.collection.concurrent.TrieMap[Int, Long]()
        override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          t0s(e.stageInfo.stageId) = System.nanoTime()
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val rt = Option(e.taskMetrics).map(_.executorRunTime).getOrElse(0L)
          taskSum.updateWith(e.stageId)(v => Some(v.getOrElse(0L) + rt))
          taskMax.updateWith(e.stageId)(v => Some(math.max(v.getOrElse(0L), rt)))
        }
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val id = e.stageInfo.stageId
          val wall = t0s.get(id).map(t => (System.nanoTime() - t) / 1000000L).getOrElse(-1L)
          stages.synchronized {
            stages += ((id, e.stageInfo.name.takeWhile(_ != ' '), e.stageInfo.numTasks,
              wall, taskSum.getOrElse(id, 0L), taskMax.getOrElse(id, 0L)))
          }
        }
      })
      import s.implicits._
      val src = if (convs == 1000000L) s.read.parquet(corpus).as[graft.model.Turn]
                else graft.fixtures.Transcripts.dataset(s, convs)
      val t0 = System.nanoTime()
      IndexBuilder.buildFromTurns(src, dir,
        IndexBuilder.Options(numPartitions = shuffle, segmentPartitions = 64,
          positions = false))
      val t = (System.nanoTime() - t0) / 1e9
      s.stop()
      println(f"[devstage] build $master t=$t%.1f gc=${(gcMs() - gc0) / 1000.0}%.1f s")
      if (convs == 1000000L) stages.sortBy(-_._4).take(12).foreach {
        case (id, nm, n, wall, sum, mx) =>
          println(f"[devstage]   stage#$id%-4d $nm%-14s tasks=$n%-4d wall=${wall / 1000.0}%6.1f " +
            f"taskSum=${sum / 1000.0}%7.1f taskMax=${mx / 1000.0}%6.1f")
      }
      try { new ProcessBuilder("sync").start().waitFor(); Thread.sleep(3000) }
      catch { case _: Throwable => }
      (t, dir)
    }
    build("local[4]", 16, 66000L) // warmup
    val (t4, d4) = build("local[4]", 16, 1000000L)
    val (t1, d1) = build("local[1]", 4, 1000000L)
    def stageMs(dir: String): Seq[(String, Long)] = {
      val mdir = new java.io.File(s"$dir/_manifest")
      Option(mdir.listFiles()).getOrElse(Array.empty).toSeq
        .filter(_.getName.endsWith(".json"))
        .map { f =>
          val txt = new String(java.nio.file.Files.readAllBytes(f.toPath))
          val stage = "\"stage\":\"([^\"]+)\"".r.findFirstMatchIn(txt).map(_.group(1)).getOrElse("?")
          val ms = "\"wall_ms\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(-1L)
          (stage, ms)
        }
    }
    val m4 = stageMs(d4).toMap
    val m1 = stageMs(d1).toMap
    println(f"[devstage] total t4=$t4%.1f t1=$t1%.1f eff=${t1 / t4 / 4}%.3f")
    (m1.keySet ++ m4.keySet).toSeq.sorted.foreach { st =>
      val a = m1.getOrElse(st, -1L) / 1000.0
      val b = m4.getOrElse(st, -1L) / 1000.0
      println(f"[devstage] stage $st%-10s t1=$a%7.1f s  t4=$b%6.1f s  speedup=${a / b}%.2f")
    }
    val sum1 = m1.values.sum / 1000.0
    val sum4 = m4.values.sum / 1000.0
    println(f"[devstage] stage-sum t1=$sum1%.1f t4=$sum4%.1f  (untracked t1=${t1 - sum1}%.1f t4=${t4 - sum4}%.1f)")
    (1 to seq).foreach { i =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(s"target/devstage-$i"))
    }
  }
}
