package graft.codec

/** One compressed posting block: up to `BlockSize` (doc, tf, norm, positions)
  * postings of a single term, doc-sorted. This is the row type of the
  * `postings` table.
  *
  * Design notes (SURVEY.md §1.2/§2.3): docIDs are delta-encoded gaps in a FOR
  * bit-packed cell (reference semantics:
  * /root/reference/src/Lucene.Net/Codecs/Lucene41/Lucene41PostingsWriter.cs:302-354,
  * BLOCK_SIZE=128); `first_doc`/`last_doc`/`max_tf`/`max_nb` are the flat skip
  * list + block-max metadata (skip-list analog:
  * /root/reference/src/Lucene.Net/Codecs/Lucene41/Lucene41SkipWriter.cs:44;
  * block-max WAND metadata is our addition — Lucene 4.8 predates it).
  * Norm bytes are stored inline per posting (divergence from the reference,
  * which random-accesses a separate norms file; a distributed scan cannot
  * cheaply do per-doc random access, and +1 byte/posting is the scale-correct
  * trade).
  *
  * `pos_bytes` is the DOCS_AND_FREQS_AND_POSITIONS payload
  * (/root/reference/src/Lucene.Net/Index/FieldInfo.cs:315-355): per posting,
  * tf varint-delta-encoded token positions (stopword/overlong holes counted,
  * StandardTokenizer position-increment semantics). It lives in its own
  * Parquet column, so scoring-only scans that deserialize [[ScoreBlock]]
  * never read it — the columnar analog of Lucene's separate `.pos` file.
  *
  * `max_nb` = max unsigned norm byte in the block = the shortest-document norm
  * (NORM_TABLE is decreasing in unsigned byte), giving the smallest BM25
  * length-cache value, hence a safe per-block score upper bound together with
  * `max_tf`.
  */
final case class PostingBlock(
    term_id: Long,
    first_doc: Long,
    last_doc: Long,
    cnt: Int,
    doc_bytes: Array[Byte],
    tf_bytes: Array[Byte],
    norm_bytes: Array[Byte],
    pos_bytes: Array[Byte],
    max_tf: Int,
    max_nb: Int,
    // Per-position payload stream (varint length + raw bytes, tf entries per
    // posting — the .pos-payload analog of Lucene41PostingsWriter's
    // payload-carrying positions, /root/reference/src/Lucene.Net/Codecs/
    // Lucene41/Lucene41PostingsWriter.cs:381-405), in its OWN Parquet column
    // so every non-payload scan prunes it. Empty when the index stores none.
    pay_bytes: Array[Byte] = Array.emptyByteArray,
    // Per-position CHARACTER OFFSET stream — the 4th IndexOptions rung
    // (DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS, /root/reference/src/
    // Lucene.Net/Index/FieldInfo.cs:315-355; Lucene41PostingsWriter writes
    // startOffset deltas + lengths next to positions, Lucene41PostingsWriter
    // .cs:390-399). Per posting: 2*tf varints of (start - prevStart,
    // end - start), prevStart reset per posting so segments are
    // self-contained. Own Parquet column; empty when not indexed.
    off_bytes: Array[Byte] = Array.emptyByteArray)

/** Scoring-path projection of [[PostingBlock]] — everything BM25 needs and
  * nothing else, so Parquet column pruning skips the positions payload
  * (`select(ScoreBlock.cols).as[ScoreBlock]`).
  */
final case class ScoreBlock(
    term_id: Long,
    first_doc: Long,
    cnt: Int,
    doc_bytes: Array[Byte],
    tf_bytes: Array[Byte],
    norm_bytes: Array[Byte],
    max_tf: Int,
    max_nb: Int)

object ScoreBlock {
  val cols: Seq[String] = Seq("term_id", "first_doc", "cnt", "doc_bytes",
    "tf_bytes", "norm_bytes", "max_tf", "max_nb")
}

/** Scoring projection carrying `last_doc` too — the doc-range co-partition
  * combine ([[graft.query.BlockCombine]]) keys blocks by the doc-range
  * buckets they overlap, like [[PosSpanBlock]] on the positional path.
  */
final case class ScoreSpanBlock(
    term_id: Long,
    first_doc: Long,
    last_doc: Long,
    cnt: Int,
    doc_bytes: Array[Byte],
    tf_bytes: Array[Byte],
    norm_bytes: Array[Byte],
    max_tf: Int,
    max_nb: Int)

object ScoreSpanBlock {
  val cols: Seq[String] = Seq("term_id", "first_doc", "last_doc", "cnt",
    "doc_bytes", "tf_bytes", "norm_bytes", "max_tf", "max_nb")
}

/** Payload-path projection: scoring columns plus the payload stream
  * (PayloadTermQuery reads postings-with-payloads,
  * /root/reference/src/Lucene.Net/Search/Payloads/PayloadTermQuery.cs:117).
  */
final case class PayBlock(
    term_id: Long,
    first_doc: Long,
    cnt: Int,
    doc_bytes: Array[Byte],
    tf_bytes: Array[Byte],
    norm_bytes: Array[Byte],
    pay_bytes: Array[Byte])

object PayBlock {
  val cols: Seq[String] = Seq("term_id", "first_doc", "cnt", "doc_bytes",
    "tf_bytes", "norm_bytes", "pay_bytes")
}

/** Positions + payloads projection (PayloadNearQuery reads both: span
  * matching needs positions, scoring folds the payloads at the matched
  * positions).
  */
final case class PosPayBlock(
    term_id: Long,
    first_doc: Long,
    cnt: Int,
    doc_bytes: Array[Byte],
    tf_bytes: Array[Byte],
    norm_bytes: Array[Byte],
    pos_bytes: Array[Byte],
    pay_bytes: Array[Byte])

object PosPayBlock {
  val cols: Seq[String] = Seq("term_id", "first_doc", "cnt", "doc_bytes",
    "tf_bytes", "norm_bytes", "pos_bytes", "pay_bytes")
}

/** Doc-ids-only projection — the cheapest scan (conjunction pre-filters). */
final case class DocsBlock(
    term_id: Long,
    first_doc: Long,
    cnt: Int,
    doc_bytes: Array[Byte])

object DocsBlock {
  val cols: Seq[String] = Seq("term_id", "first_doc", "cnt", "doc_bytes")
}

/** Positions-path projection: postings plus the positions payload. */
final case class PosBlock(
    term_id: Long,
    first_doc: Long,
    cnt: Int,
    doc_bytes: Array[Byte],
    tf_bytes: Array[Byte],
    norm_bytes: Array[Byte],
    pos_bytes: Array[Byte])

object PosBlock {
  val cols: Seq[String] = Seq("term_id", "first_doc", "cnt", "doc_bytes",
    "tf_bytes", "norm_bytes", "pos_bytes")
}

/** Positions projection carrying `last_doc` too — the doc-range co-partition
  * path ([[graft.query.PositionalScan]]) keys each block by the doc-range
  * buckets [first_doc/R, last_doc/R] it overlaps, so blocks ship PACKED
  * through the shuffle (the flat-skip-list metadata doing double duty as the
  * partitioner key).
  */
final case class PosSpanBlock(
    term_id: Long,
    first_doc: Long,
    last_doc: Long,
    cnt: Int,
    doc_bytes: Array[Byte],
    tf_bytes: Array[Byte],
    norm_bytes: Array[Byte],
    pos_bytes: Array[Byte])

object PosSpanBlock {
  val cols: Seq[String] = Seq("term_id", "first_doc", "last_doc", "cnt",
    "doc_bytes", "tf_bytes", "norm_bytes", "pos_bytes")
}

object PostingCodec {
  final val BlockSize = 128

  /** Encode one sorted posting run (single term, strictly increasing docIds)
    * into blocks of up to BlockSize entries. `poss(i)` is posting i's sorted
    * position list (length tfs(i)); pass null for a positions-less run.
    */
  def encodeRun(termId: Long, docIds: Array[Long], tfs: Array[Int],
                norms: Array[Byte], poss: Array[Array[Int]],
                paySegs: Array[Array[Byte]] = null,
                offSegs: Array[Array[Byte]] = null): Iterator[PostingBlock] = {
    require(docIds.length == tfs.length && docIds.length == norms.length)
    docIds.indices.iterator.grouped(BlockSize).map { idxs =>
      val n = idxs.length
      val first = docIds(idxs.head)
      val gaps = new Array[Long](n - 1)
      val tfl = new Array[Long](n)
      var maxTf = 0
      var maxNb = 0
      var j = 0
      while (j < n) {
        val i = idxs(j)
        if (j > 0) {
          val gap = docIds(i) - docIds(i - 1)
          require(gap > 0, s"docIds must be strictly increasing (term $termId)")
          gaps(j - 1) = gap
        }
        tfl(j) = tfs(i).toLong
        if (tfs(i) > maxTf) maxTf = tfs(i)
        val nb = norms(i) & 0xff
        if (nb > maxNb) maxNb = nb
        j += 1
      }
      val normArr = new Array[Byte](n)
      j = 0
      while (j < n) { normArr(j) = norms(idxs(j)); j += 1 }
      val posBytes =
        if (poss == null) Array.emptyByteArray
        else {
          val sel = new Array[Array[Int]](n)
          j = 0
          while (j < n) { sel(j) = poss(idxs(j)); j += 1 }
          packPositions(sel)
        }
      val payBytes =
        if (paySegs == null) Array.emptyByteArray
        else {
          val buf = new java.io.ByteArrayOutputStream()
          j = 0
          while (j < n) { buf.write(paySegs(idxs(j))); j += 1 }
          buf.toByteArray
        }
      val offBytes =
        if (offSegs == null) Array.emptyByteArray
        else {
          val buf = new java.io.ByteArrayOutputStream()
          j = 0
          while (j < n) { buf.write(offSegs(idxs(j))); j += 1 }
          buf.toByteArray
        }
      PostingBlock(termId, first, docIds(idxs.last), n,
        ForCodec.pack(gaps), ForCodec.pack(tfl), normArr, posBytes, maxTf, maxNb,
        payBytes, offBytes)
    }
  }

  /** Split a payload stream into raw per-POSTING segments (each holds its
    * tf (varint length + bytes) entries, opaque — re-blocking moves whole
    * postings, so segments never need interpreting).
    */
  def splitPaySegments(bytes: Array[Byte], tfs: Array[Int]): Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](tfs.length)
    val r = new ForCodec.Reader(bytes, 0)
    var start = 0
    var i = 0
    while (i < tfs.length) {
      var j = 0
      // NOTE: must read the varint BEFORE the += — `r.pos += f()` evaluates
      // the old r.pos first, silently discarding f()'s own pos advance
      while (j < tfs(i)) { val len = r.readVarLong().toInt; r.pos += len; j += 1 }
      out(i) = java.util.Arrays.copyOfRange(bytes, start, r.pos)
      start = r.pos
      i += 1
    }
    out
  }

  /** Decode one posting's payload stream into per-position byte arrays. */
  def decodePayloads(seg: Array[Byte], tf: Int): Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](tf)
    val r = new ForCodec.Reader(seg, 0)
    var i = 0
    while (i < tf) {
      val len = r.readVarLong().toInt
      out(i) = java.util.Arrays.copyOfRange(seg, r.pos, r.pos + len)
      r.pos += len
      i += 1
    }
    out
  }

  /** Per-position payload arrays (one list per posting, aligned with its
    * positions) -> the varint-length-prefixed stream; null entries encode
    * as length 0 (no payload at that position).
    */
  def packPayloads(pays: Array[Array[Array[Byte]]]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < pays.length) {
      val ps = pays(i)
      var j = 0
      while (j < ps.length) {
        val p = if (ps(j) == null) Array.emptyByteArray else ps(j)
        ForCodec.writeVarLong(buf, p.length.toLong)
        buf.write(p)
        j += 1
      }
      i += 1
    }
    buf.toByteArray
  }

  /** Encode ONE posting's character offsets — `pairs` is the flat
    * [start0, end0, start1, end1, ...] list (2*tf values, starts ascending) —
    * as the self-contained (start-delta, length) varint segment.
    */
  def encodeOffSegment(pairs: Array[Int]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(pairs.length)
    var prev = 0
    var k = 0
    while (k < pairs.length) {
      ForCodec.writeVarLong(buf, (pairs(k) - prev).toLong)
      ForCodec.writeVarLong(buf, (pairs(k + 1) - pairs(k)).toLong)
      prev = pairs(k)
      k += 2
    }
    buf.toByteArray
  }

  /** Split an offsets stream into raw per-POSTING segments (2*tf varints
    * each; opaque to re-blocking, like [[splitPaySegments]]).
    */
  def splitOffSegments(bytes: Array[Byte], tfs: Array[Int]): Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](tfs.length)
    val r = new ForCodec.Reader(bytes, 0)
    var start = 0
    var i = 0
    while (i < tfs.length) {
      var j = 0
      while (j < 2 * tfs(i)) { r.readVarLong(); j += 1 }
      out(i) = java.util.Arrays.copyOfRange(bytes, start, r.pos)
      start = r.pos
      i += 1
    }
    out
  }

  /** Decode the offsets stream: per posting, the flat [s0, e0, s1, e1, ...]
    * absolute pairs (inverse of [[encodeOffSegment]] concatenation).
    */
  def unpackOffsets(bytes: Array[Byte], tfs: Array[Int]): Array[Array[Int]] = {
    val r = new ForCodec.Reader(bytes, 0)
    val out = new Array[Array[Int]](tfs.length)
    var i = 0
    while (i < tfs.length) {
      val pairs = new Array[Int](2 * tfs(i))
      var prev = 0
      var k = 0
      while (k < pairs.length) {
        val s = prev + r.readVarLong().toInt
        val e = s + r.readVarLong().toInt
        pairs(k) = s; pairs(k + 1) = e
        prev = s
        k += 2
      }
      out(i) = pairs
      i += 1
    }
    out
  }

  /** Per-posting position lists -> one varint-delta byte stream (first
    * position absolute, then gaps; list lengths come from the tf cells).
    */
  def packPositions(poss: Array[Array[Int]]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(poss.length * 2)
    var i = 0
    while (i < poss.length) {
      val ps = poss(i)
      var prev = 0
      var j = 0
      while (j < ps.length) {
        ForCodec.writeVarLong(buf, (ps(j) - prev).toLong)
        prev = ps(j)
        j += 1
      }
      i += 1
    }
    buf.toByteArray
  }

  /** Inverse of [[packPositions]]; `tfs` gives each posting's list length. */
  def unpackPositions(bytes: Array[Byte], tfs: Array[Int]): Array[Array[Int]] = {
    val r = new ForCodec.Reader(bytes, 0)
    val out = new Array[Array[Int]](tfs.length)
    var i = 0
    while (i < tfs.length) {
      val ps = new Array[Int](tfs(i))
      var prev = 0
      var j = 0
      while (j < ps.length) {
        prev += r.readVarLong().toInt
        ps(j) = prev
        j += 1
      }
      out(i) = ps
      i += 1
    }
    out
  }

  private def decodeCore(firstDoc: Long, cnt: Int, docBytes: Array[Byte],
                         tfBytes: Array[Byte]): (Array[Long], Array[Int]) = {
    val gaps = ForCodec.unpack(docBytes)
    val tfl = ForCodec.unpack(tfBytes)
    val docs = new Array[Long](cnt)
    val tfs = new Array[Int](cnt)
    var i = 0
    var doc = firstDoc
    while (i < cnt) {
      if (i > 0) doc += gaps(i - 1)
      docs(i) = doc
      tfs(i) = tfl(i).toInt
      i += 1
    }
    (docs, tfs)
  }

  /** Decode the (docIds, tfs) cells of a packed block — the positional
    * kernel decodes from raw cells so the positions payload can be skipped
    * per posting without materializing arrays.
    */
  def decodeDocsTfs(firstDoc: Long, cnt: Int, docBytes: Array[Byte],
                    tfBytes: Array[Byte]): (Array[Long], Array[Int]) =
    decodeCore(firstDoc, cnt, docBytes, tfBytes)

  /** Decode a block back to parallel (docIds, tfs, norms) arrays. */
  def decode(b: PostingBlock): (Array[Long], Array[Int], Array[Byte]) = {
    val (docs, tfs) = decodeCore(b.first_doc, b.cnt, b.doc_bytes, b.tf_bytes)
    (docs, tfs, b.norm_bytes)
  }

  def decode(b: ScoreBlock): (Array[Long], Array[Int], Array[Byte]) = {
    val (docs, tfs) = decodeCore(b.first_doc, b.cnt, b.doc_bytes, b.tf_bytes)
    (docs, tfs, b.norm_bytes)
  }

  /** Decode only the doc ids of a block. */
  def decodeDocs(b: DocsBlock): Array[Long] = {
    val gaps = ForCodec.unpack(b.doc_bytes)
    val docs = new Array[Long](b.cnt)
    var i = 0
    var doc = b.first_doc
    while (i < b.cnt) {
      if (i > 0) doc += gaps(i - 1)
      docs(i) = doc
      i += 1
    }
    docs
  }

  /** Decode a positions-projection block: (docIds, tfs, norms, positions).
    * Fails fast on a DOCS_AND_FREQS-only index (positions not written).
    */
  def decodePos(b: PosBlock): (Array[Long], Array[Int], Array[Byte], Array[Array[Int]]) = {
    require(b.cnt == 0 || b.pos_bytes.nonEmpty,
      "positions not indexed (IndexOptions DOCS_AND_FREQS): rebuild with " +
        "IndexBuilder.Options(positions = true) to run positional queries")
    val (docs, tfs) = decodeCore(b.first_doc, b.cnt, b.doc_bytes, b.tf_bytes)
    (docs, tfs, b.norm_bytes, unpackPositions(b.pos_bytes, tfs))
  }

  def decodePos(b: PosSpanBlock): (Array[Long], Array[Int], Array[Byte], Array[Array[Int]]) =
    decodePos(PosBlock(b.term_id, b.first_doc, b.cnt, b.doc_bytes, b.tf_bytes,
      b.norm_bytes, b.pos_bytes))
}
