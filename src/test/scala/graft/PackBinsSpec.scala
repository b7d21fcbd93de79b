package graft

import graft.gate.Gate
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sharded two-level prefix sum behind pack_sequences must assign
  * every doc the SAME bin as a single global per-source running-sum window
  * — especially at shard boundaries, with sparse doc_ids, empty shards and
  * one dominant source (the skew case the sharding exists for).
  */
class PackBinsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def globalBins(docs: org.apache.spark.sql.DataFrame,
                         window: Long): Map[Long, Long] = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("bin",
      floor(coalesce(sum("tok").over(w), lit(0L)) / lit(window)).cast("long"))
      .select("doc_id", "bin")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("sharded bins == global-window bins on adversarial shapes") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // dominant source 'a' (interleaved sparse ids), tiny 'b', empty-shard
    // gaps, token counts that straddle the 64-token window boundary
    val rows = (0 until 400).map { i =>
      val id = i * 7L + (if (i % 3 == 0) 1000L else 0L) // sparse + out-of-range jumps
      val src = if (i % 17 == 0) "b" else "a"
      (id, src, (rnd.nextInt(40) + 1).toLong)
    }.distinct
    val docs = rows.toDF("doc_id", "source", "tok")
    for (shardDocs <- Seq(8L, 64L, 4096L)) {
      val sharded = Gate.packBins(docs, shardDocs, window = 64L)
        .select("doc_id", "bin")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sharded == globalBins(docs, 64L), s"shardDocs=$shardDocs")
    }
  }

  test("single-doc shards and window-exact boundaries") {
    import spark.implicits._
    // every doc exactly fills half a window: bins flip every 2 docs; shard
    // width 1 makes EVERY carry cross a shard boundary
    val docs = (0L until 50L).map(i => (i, "s", 32L)).toDF("doc_id", "source", "tok")
    val sharded = Gate.packBins(docs, shardDocs = 1L, window = 64L)
      .select("doc_id", "bin")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sharded == (0L until 50L).map(i => i -> i / 2).toMap)
  }
}
