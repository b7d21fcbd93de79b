package graft

import graft.build.IndexBuilder
import graft.fixtures.Transcripts
import org.apache.spark.sql.SparkSession

/** Dev-only build-throughput harness: one warmup + N timed local[4] builds
  * of the 4M-turn corpus (fresh output dir each, sync between), printing
  * seconds — for A/B of S4 changes without the full Bench protocol.
  *   sbt -batch "Test/runMain graft.DevBuild [n]"
  */
object DevBuild {
  def main(args: Array[String]): Unit = {
    val samples = args.headOption.map(_.toInt).getOrElse(2)
    val corpus = "target/devcorpus"
    locally {
      val s = SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "localhost").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      if (!new java.io.File(s"$corpus/_SUCCESS").exists()) {
        Transcripts.dataset(s, 1000000L).repartition(128)
          .write.mode("overwrite").parquet(corpus)
      }
      s.stop()
    }
    var seq = 0
    def build(master: String, shuffle: Int, convs: Long): Double = {
      seq += 1
      val s = SparkSession.builder().master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "localhost").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      import s.implicits._
      val src = if (convs == 1000000L) s.read.parquet(corpus).as[graft.model.Turn]
                else Transcripts.dataset(s, convs)
      val t0 = System.nanoTime()
      IndexBuilder.buildFromTurns(src, s"target/devbuild-$seq",
        IndexBuilder.Options(numPartitions = shuffle, segmentPartitions = 64,
          positions = false))
      val t = (System.nanoTime() - t0) / 1e9
      s.stop()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      if (seq >= 2) rm(new java.io.File(s"target/devbuild-${seq - 1}"))
      try { new ProcessBuilder("sync").start().waitFor(); Thread.sleep(3000) }
      catch { case _: Throwable => }
      t
    }
    build("local[4]", 16, 66000L) // JIT warmup, untimed
    val ts = (1 to samples).map(_ => build("local[4]", 16, 1000000L))
    println(f"[dev] build local[4] samples: ${ts.map(t => f"$t%.1f").mkString(", ")} s  min=${ts.min}%.1f")
    (1 to seq).foreach { i =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(s"target/devbuild-$i"))
    }
  }
}
