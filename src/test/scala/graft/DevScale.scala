package graft

import graft.build.IndexBuilder
import graft.fixtures.Transcripts
import org.apache.spark.sql.SparkSession

/** Dev-only scaling-pair harness: the Bench phase-1 protocol in isolation
  * (warmup, then min-of-N DOCS_AND_FREQS builds at local[1] and local[4],
  * fresh output dirs, untimed rm+sync between timed regions), printing the
  * efficiency — for A/B of ingest/merge changes without the full Bench.
  *   sbt -batch "Test/runMain graft.DevScale [samples]"
  */
object DevScale {
  def main(args: Array[String]): Unit = {
    val samples = args.headOption.map(_.toInt).getOrElse(2)
    val corpus = "target/devcorpus"
    var turns = 0L
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
      turns = s.read.parquet(corpus).count()
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
      IndexBuilder.buildFromTurns(src, s"target/devscale-$seq",
        IndexBuilder.Options(numPartitions = shuffle, segmentPartitions = 64,
          positions = false))
      val t = (System.nanoTime() - t0) / 1e9
      s.stop()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      if (seq >= 2) rm(new java.io.File(s"target/devscale-${seq - 1}"))
      try { new ProcessBuilder("sync").start().waitFor(); Thread.sleep(3000) }
      catch { case _: Throwable => }
      t
    }
    build("local[4]", 16, 66000L) // JIT warmup, untimed
    val t4s = collection.mutable.ArrayBuffer[Double]()
    val t1s = collection.mutable.ArrayBuffer[Double]()
    (1 to samples).foreach { _ =>
      t4s += build("local[4]", 16, 1000000L)
      t1s += build("local[1]", 4, 1000000L)
    }
    val t1 = t1s.min
    val t4 = t4s.min
    println(f"[devscale] t1 samples: ${t1s.map(t => f"$t%.1f").mkString(", ")} s")
    println(f"[devscale] t4 samples: ${t4s.map(t => f"$t%.1f").mkString(", ")} s")
    println(f"[devscale] turns=$turns t1=$t1%.1f (${turns / t1}%.0f/s) t4=$t4%.1f (${turns / t4}%.0f/s) efficiency=${t1 / t4 / 4.0}%.3f")
    (1 to seq).foreach { i =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(s"target/devscale-$i"))
    }
  }
}
