package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video
  * travel as opaque `binary` columns with typed metadata extracted by
  * per-partition batch transforms.
  *
  * The DECODE step is a STUB — real codec libraries are not available in
  * this environment, so [[decodeStub]] derives deterministic fake media
  * properties from the bytes. Everything around it is real and tested: the
  * schema contract, the mapPartitions batch shape (one decoder instance per
  * partition, streaming over rows — the same shape a Pandas-UDF/mapInPandas
  * or JNI decoder needs), frame sampling, and checksum bookkeeping.
  */
object Media {

  /** Typed metadata row extracted per media object. */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      kind: String,   // sniffed container kind
      width: Int,     // fake-decoded dimensions (stub)
      height: Int,
      checksum: String)

  /** Deterministic fake decode: sniffs a "container" from the leading byte
    * and derives dimensions from stable byte statistics. Replace with a real
    * codec at deployment; the signature (bytes in, typed meta out, no Spark
    * types) is the real contract.
    */
  def decodeStub(bytes: Array[Byte]): (String, Int, Int) = {
    if (bytes.isEmpty) return ("empty", 0, 0)
    val kind = (bytes(0) & 0x03) match {
      case 0 => "image"
      case 1 => "audio"
      case 2 => "video"
      case _ => "binary"
    }
    var acc = 0
    var i = 0
    while (i < bytes.length) { acc = (acc * 31 + (bytes(i) & 0xff)) & 0x7fffffff; i += 1 }
    val width = 16 + (acc % 240)          // 16..255
    val height = 16 + ((acc >> 8) % 240)
    (kind, width, height)
  }

  /** Extract typed metadata for every row of (idCol: long, binCol: binary).
    * One decoder context per partition, streaming over the batch — the
    * correct distribution shape for an expensive stateful decoder.
    */
  def extractMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a real implementation initializes its codec ONCE here
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          val (kind, w, h) = decodeStub(b)
          MediaMeta(id, b.length.toLong, kind, w, h,
            org.apache.commons.codec.digest.DigestUtils.md5Hex(b))
        }
      }
  }

  /** Sample up to `n` fixed-size "frames" at a byte stride — the frame-
    * sampling plumbing (offsets, bounds, batch shape); a video decoder slots
    * into the same loop.
    */
  def sampleFrames(bytes: Array[Byte], frameSize: Int, stride: Int,
                   n: Int): Array[Array[Byte]] = {
    require(frameSize > 0 && stride > 0 && n >= 0)
    val out = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var off = 0
    while (out.length < n && off + frameSize <= bytes.length) {
      out += java.util.Arrays.copyOfRange(bytes, off, off + frameSize)
      off += stride
    }
    out.toArray
  }
}
