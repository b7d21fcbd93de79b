package graft.build

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense, deterministic 0-based id assignment by a total key order — without a
  * global single-partition sort (SURVEY.md §7.4 item 2: a plain row_number()
  * over one unpartitioned window is a driver bottleneck at 10^12 rows).
  *
  * Two narrow passes over one range-partitioned, partition-sorted dataset:
  * pass 1 counts rows per partition, pass 2 assigns `offset(pid) + i`. The
  * dataset MUST be persisted between the two jobs: separate actions re-plan
  * and re-sample the range partitioner, and above a shuffle (e.g. a groupBy)
  * AQE can re-shape the child so the resampled boundaries differ between
  * passes — observed as duplicate ids. (The big-data path — buildFromTurns —
  * avoids this operator entirely via partition-local ids + offset fixup;
  * the remaining users here are metadata-sized tables like the term
  * dictionary, where the persist is cheap at any scale.)
  */
object StableIds {

  /** Returns `df` plus a LongType `idCol`, ids dense in ascending `keys` order.
    * `keys` must be a uniqueness-guaranteeing key set. The result is persisted;
    * callers should unpersist after consuming it.
    */
  def attach(df: DataFrame, keys: Seq[Column], idCol: String, numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .repartitionByRange(numPartitions, keys: _*)
      .sortWithinPartitions(keys: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sorted
      .groupBy(spark_partition_id().as("pid")).count()
      .as[(Int, Long)].collect().toMap
    val offsets = new Array[Long](numPartitions)
    var acc = 0L
    for (p <- 0 until numPartitions) {
      offsets(p) = acc
      acc += counts.getOrElse(p, 0L)
    }
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val result = sorted.mapPartitions { it =>
      val base = bOffsets.value(TaskContext.getPartitionId())
      var i = 0L
      it.map { row =>
        val id = base + i
        i += 1
        Row.fromSeq(row.toSeq :+ id)
      }
    }(enc)
    // Materialize while `sorted` is cached so both jobs see one execution.
    result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    sorted.unpersist(blocking = false)
    result
  }
}
