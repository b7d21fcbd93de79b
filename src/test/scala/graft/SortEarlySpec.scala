package graft

import graft.gate.Gate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EarlyTerminatingSortingCollector analog: top-k by a stored field over the
  * write-once sort-ordered store must equal the global sort while reading
  * only the leading range partitions.
  */
class SortEarlySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("sortEarly: exact global top-k from the leading buckets only") {
    val got = Gate.sortEarly(spark, sfDir, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Gate.docsTable(spark, sfDir)
      .orderBy(desc("n_chars"), asc("doc_id"))
      .select("doc_id", "n_chars").limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    // the scan is partition-pruned to a strict prefix of the bucket range
    val plan = Gate.sortEarly(spark, sfDir, 20).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && !plan.contains("PartitionFilters: []"))
    // at ~500 docs / 32 buckets the widening loop must stop well short of
    // the full store (k=20 needs only the first few ~16-doc buckets), so a
    // small bucket prefix must already cover k while many buckets exist
    val store = spark.read.parquet(Gate.sortedStoreDir(spark, sfDir))
    assert(store.filter(col("bucket") < 4).count() >= 20,
      "buckets are so skewed the early-exit premise fails")
    assert(store.select("bucket").distinct().count() > 4)
  }

  test("sortEarly: k larger than several buckets still exact (widening loop)") {
    val got = Gate.sortEarly(spark, sfDir, 120)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Gate.docsTable(spark, sfDir)
      .orderBy(desc("n_chars"), asc("doc_id"))
      .select("doc_id", "n_chars").limit(120)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("sortEarly: k beyond table size returns the full sorted table") {
    val n = Gate.docsTable(spark, sfDir).count().toInt
    val got = Gate.sortEarly(spark, sfDir, n + 50).collect()
    assert(got.length == n)
  }
}
