package graft.build

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Dense, deterministic 0-based id assignment by a total key order — without a
  * global single-partition sort (SURVEY.md §7.4 item 2: a plain row_number()
  * over one unpartitioned window is a driver bottleneck at 10^12 rows).
  *
  * Two narrow passes over one range-partitioned, partition-sorted dataset:
  * pass 1 counts rows per partition, pass 2 assigns `offset(pid) + i`.
  * The dataset is persisted between the two jobs so both observe the same
  * range-partitioner sample (placement is deterministic because the key order
  * is total). At cluster scale the persist can be swapped for a
  * write-to-storage + per-file-count manifest without changing callers.
  */
object StableIds {

  /** Returns `df` plus a LongType `idCol`, ids dense in ascending `keys` order.
    * `keys` must be a uniqueness-guaranteeing key set.
    */
  def attach(df: DataFrame, keys: Seq[Column], idCol: String, numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .repartitionByRange(numPartitions, keys: _*)
      .sortWithinPartitions(keys: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
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
    // Materialize while `sorted` is still cached (both jobs must see the same
    // shuffle), then release the intermediate.
    result.persist(StorageLevel.MEMORY_AND_DISK).count()
    sorted.unpersist(blocking = false)
    result
  }
}
