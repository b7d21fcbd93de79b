package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan audit: sweep every SparkEntry gate query at sf0.001 and
  * flag CartesianProduct / BroadcastNestedLoopJoin nodes in the executed
  * plan (PLANS.md §5b evidence). Run:
  *   sbt -batch "Test/runMain graft.DevPlanAudit"
  */
object DevPlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(s, sfDir)
        df.collect() // executed plan (AQE-final)
        val plan = df.queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        if (cart || bnlj) {
          bad += 1
          println(s"[audit] $name: cartesian=$cart bnlj=$bnlj")
        }
      } catch {
        case e: Throwable => bad += 1; println(s"[audit] $name FAILED: $e")
      }
    }
    println(s"[audit] done: $bad flagged of ${SparkEntry.queries.size}")
    s.stop()
  }
}
