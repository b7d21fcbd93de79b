package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video
  * travel as opaque `binary` columns with typed metadata extracted by
  * per-partition batch transforms.
  *
  * IMAGE decode is REAL: container sniffing by magic bytes plus a
  * header-only dimension read through the JDK's own `javax.imageio` (the
  * reader parses just the image header — IHDR / SOF / logical screen
  * descriptor — never the pixel payload, which is what makes per-row decode
  * viable over billions of images). AUDIO container decode is REAL for the
  * formats the JDK itself parses — WAV / AIFF / AU through
  * `javax.sound.sampled.AudioSystem.getAudioFileFormat`, again header-only
  * (the fmt/COMM chunk, never the sample payload). Only VIDEO and
  * compressed-audio (mp3/ogg) decode remains a deterministic STUB behind
  * the same seam ([[decodeStub]]) — those codecs are not in the JDK; a
  * JNI/FFmpeg decoder slots into [[decode]] with the same
  * (bytes in, typed meta out) contract.
  */
object Media {

  /** Typed metadata row extracted per media object. */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      kind: String,   // sniffed container kind ("png","jpeg","gif","bmp",stub kinds)
      width: Int,     // real header-decoded dimensions for images; stub otherwise
      height: Int,
      checksum: String)

  /** Sniff an image container from its magic bytes. */
  def sniffImage(bytes: Array[Byte]): Option[String] = {
    def b(i: Int): Int = bytes(i) & 0xff
    if (bytes.length >= 8 && b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a)
      Some("png")
    else if (bytes.length >= 3 && b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff)
      Some("jpeg")
    else if (bytes.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      Some("gif")
    else if (bytes.length >= 2 && b(0) == 'B' && b(1) == 'M')
      Some("bmp")
    else None
  }

  /** Real header-only dimension decode for a sniffed image container.
    * Returns None for non-images or corrupt headers (callers fall back to
    * the stub) — a malformed row must never fail the batch.
    */
  def imageDims(bytes: Array[Byte]): Option[(String, Int, Int)] =
    sniffImage(bytes).flatMap { kind =>
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              Some((kind, r.getWidth(0), r.getHeight(0)))
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Sniff an audio container the JDK can parse from its magic bytes:
    * RIFF/WAVE, FORM/AIFF(-C), Sun .snd AU.
    */
  def sniffAudio(bytes: Array[Byte]): Option[String] = {
    def tag(off: Int, s: String): Boolean =
      bytes.length >= off + s.length &&
        s.indices.forall(i => (bytes(off + i) & 0xff) == s.charAt(i).toInt)
    if (tag(0, "RIFF") && tag(8, "WAVE")) Some("wav")
    else if (tag(0, "FORM") && (tag(8, "AIFF") || tag(8, "AIFC"))) Some("aiff")
    else if (tag(0, ".snd")) Some("au")
    else None
  }

  /** Parsed audio header (no sample payload is read). `frames` is -1 when
    * the container does not carry a frame count in its header.
    */
  final case class AudioMeta(kind: String, channels: Int, sampleRateHz: Int,
                             frames: Long, durationMs: Long)

  /** Real header-only audio decode for a sniffed WAV/AIFF/AU container via
    * the JDK's `AudioSystem`. None for non-audio or corrupt headers (callers
    * fall back to the stub) — a malformed row must never fail the batch.
    */
  def audioMeta(bytes: Array[Byte]): Option[AudioMeta] =
    sniffAudio(bytes).flatMap { kind =>
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        val f = aff.getFormat
        val rate = math.round(f.getSampleRate)
        val frames = aff.getFrameLength.toLong
        val durMs =
          if (frames >= 0 && rate > 0) math.round(frames * 1000.0 / rate) else -1L
        Some(AudioMeta(kind, f.getChannels, rate, frames, durMs))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Deterministic fake decode for the containers the JDK cannot parse
    * (video/compressed-audio/unknown): sniffs a "container" from the leading byte and
    * derives dimensions from stable byte statistics. The signature (bytes
    * in, typed meta out, no Spark types) is the deployment contract a real
    * codec drops into.
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

  /** Full decode seam: real image/audio header decode where the JDK can,
    * stub elsewhere. Total — never throws on malformed bytes. For audio the
    * two dimension slots carry (channels, sampleRateHz) — the typed
    * [[audioMeta]] accessor returns the full header including duration.
    */
  def decode(bytes: Array[Byte]): (String, Int, Int) =
    if (bytes.isEmpty) ("empty", 0, 0)
    else imageDims(bytes)
      .orElse(audioMeta(bytes).map(a => (a.kind, a.channels, a.sampleRateHz)))
      .getOrElse(decodeStub(bytes))

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
        // a real implementation initializes heavier codecs ONCE here
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          val (kind, w, h) = decode(b)
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
