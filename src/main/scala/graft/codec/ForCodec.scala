package graft.codec

/** Frame-of-reference + bit-packing codec for posting blocks.
  *
  * Same compression idea as the reference's 128-int FOR blocks with an
  * all-values-equal shortcut (format notes:
  * /root/reference/src/Lucene.Net/Codecs/Lucene41/Lucene41PostingsFormat.cs:375,
  * /root/reference/src/Lucene.Net/Codecs/Lucene41/ForUtil.cs:30-120), but a
  * fresh self-contained byte layout designed for Parquet BinaryType cells:
  *
  *   [varint n][varint ref][1 byte width w][ceil(n*w/8) bytes of little-endian
  *   bit-packed (value - ref)]
  *
  * width 0 == all values equal to ref (the shortcut). Values must be >= 0.
  * 64-bit capable so docID gaps at 10^12-doc scale never overflow.
  */
object ForCodec {

  def writeVarLong(buf: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      buf.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    buf.write(v.toInt)
  }

  final class Reader(val bytes: Array[Byte], var pos: Int) {
    def readVarLong(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      while ({ b = bytes(pos) & 0xff; pos += 1; (b & 0x80) != 0 }) {
        result |= (b & 0x7fL) << shift
        shift += 7
      }
      result | (b.toLong << shift)
    }
  }

  private def bitsRequired(v: Long): Int =
    if (v == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)

  def pack(values: Array[Long]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(values.length + 8)
    writeVarLong(buf, values.length.toLong)
    if (values.isEmpty) return buf.toByteArray
    var ref = Long.MaxValue
    var max = Long.MinValue
    var i = 0
    while (i < values.length) {
      val v = values(i)
      require(v >= 0, s"ForCodec values must be non-negative, got $v")
      if (v < ref) ref = v
      if (v > max) max = v
      i += 1
    }
    writeVarLong(buf, ref)
    val width = bitsRequired(max - ref)
    buf.write(width)
    if (width > 0) {
      val nBytes = (values.length * width + 7) / 8
      val out = new Array[Byte](nBytes)
      var bitPos = 0
      i = 0
      while (i < values.length) {
        var delta = values(i) - ref
        var remaining = width
        while (remaining > 0) {
          val byteIdx = bitPos >> 3
          val bitOff = bitPos & 7
          val take = math.min(8 - bitOff, remaining)
          out(byteIdx) = (out(byteIdx) | ((delta & ((1L << take) - 1)) << bitOff)).toByte
          delta >>>= take
          bitPos += take
          remaining -= take
        }
        i += 1
      }
      buf.write(out)
    }
    buf.toByteArray
  }

  def unpack(bytes: Array[Byte]): Array[Long] = unpack(new Reader(bytes, 0))

  def unpack(r: Reader): Array[Long] = {
    val n = r.readVarLong().toInt
    if (n == 0) return Array.emptyLongArray
    val ref = r.readVarLong()
    val width = r.bytes(r.pos) & 0xff
    r.pos += 1
    val out = new Array[Long](n)
    if (width == 0) {
      java.util.Arrays.fill(out, ref)
    } else {
      var bitPos = r.pos * 8
      var i = 0
      while (i < n) {
        var v = 0L
        var got = 0
        while (got < width) {
          val byteIdx = bitPos >> 3
          val bitOff = bitPos & 7
          val take = math.min(8 - bitOff, width - got)
          val chunk = ((r.bytes(byteIdx) & 0xff) >>> bitOff) & ((1 << take) - 1)
          v |= chunk.toLong << got
          got += take
          bitPos += take
        }
        out(i) = v + ref
        i += 1
      }
      r.pos += (n * width + 7) / 8
    }
    out
  }
}
