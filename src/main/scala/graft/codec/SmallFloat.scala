package graft.codec

/** Lossy float-to-byte norm encoding with 3 mantissa bits / zero-exponent 15,
  * semantically equivalent to the encoding Lucene 4.8 uses for BM25 norms
  * (reference: /root/reference/src/Lucene.Net/Util/SmallFloat.cs:146-190).
  *
  * Built from the published format description: take the raw IEEE-754 bits of
  * the float, keep the top 3 explicit mantissa bits (shift right by 21), and
  * rebase the exponent so that byte value 0 maps to 0f. Values that underflow
  * encode to 1 (or 0 for <= 0); values that overflow encode to -1 (0xFF).
  */
object SmallFloat {

  private final val Zero315 = (63 - 15) << 3 // 384

  /** floatToByte(f, mantissaBits=3, zeroExp=15). */
  def singleToByte315(f: Float): Byte = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val smallfloat = bits >> (24 - 3)
    if (smallfloat <= Zero315) {
      if (bits <= 0) 0 else 1 // underflow: round up to smallest positive
    } else if (smallfloat >= Zero315 + 0x100) {
      -1 // overflow: largest representable
    } else {
      (smallfloat - Zero315).toByte
    }
  }

  /** byteToFloat(b, mantissaBits=3, zeroExp=15). */
  def byte315ToSingle(b: Byte): Float = {
    if (b == 0) 0.0f
    else {
      var bits = (b & 0xff) << (24 - 3)
      bits += Zero315 << (24 - 3)
      java.lang.Float.intBitsToFloat(bits)
    }
  }

  /** Norm byte for a field with `numTerms` emitted tokens (boost = 1):
    * encode(1 / sqrt(numTerms)). numTerms = 0 gives +Inf -> overflow byte.
    * Reference semantics: BM25Similarity.ComputeNorm
    * (/root/reference/src/Lucene.Net/Search/Similarities/BM25Similarity.cs:156-160).
    */
  def encodeNorm(numTerms: Int): Byte =
    singleToByte315((1.0 / math.sqrt(numTerms.toDouble)).toFloat)
}
