package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print the ann_lsh / ann_ivf physical plans to confirm the
  * probe IN-set lands in PartitionFilters (partition-pruned storage).
  */
object DevAnnPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("ann_lsh" -> graft.gate.Gate.annLsh(spark, sfDir, 5),
        "ann_ivf" -> graft.gate.Gate.annIvf(spark, sfDir, 5),
        "ann_pq" -> graft.gate.Gate.annPq(spark, sfDir, 10)).foreach {
      case (name, df) =>
        val plan = df.queryExecution.executedPlan.toString
        val pf = plan.linesIterator.filter(l =>
          l.contains("PartitionFilters") || l.contains("PartitionCount")).mkString("\n")
        println(s"== $name ==")
        println(pf.take(800))
        println(s"[pruned: ${pf.contains("PartitionFilters: [") && !pf.contains("PartitionFilters: []")}]")
        val scans = plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
        println(scans.take(600))
    }
    spark.stop()
  }
}
