package graft

import graft.verify.IndexVerifier
import org.apache.spark.sql.SparkSession

/** Dev-only: run the CheckIndex-analog verifier against a built gate index
  * (arg = index dir, default the sf0.1 gate index) and print the violation
  * list — expected empty. Exercises the distributed termdict-ordering check
  * (window lag, no whole-dict collect) at the largest local corpus.
  */
object DevVerifyIndex {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      s"target/gate-index/${graft.gate.Gate.Version}-sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val errs = IndexVerifier.verify(spark, dir)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[verify-index] $dir%s: ${errs.size}%d violations in $secs%.1f s")
    errs.foreach(e => println(s"[verify-index]   $e"))
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
