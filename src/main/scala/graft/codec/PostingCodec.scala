package graft.codec

/** One compressed posting block: up to `BlockSize` (doc, tf, norm) postings of a
  * single term, doc-sorted. This is the row type of the `postings` table.
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
    max_tf: Int,
    max_nb: Int)

object PostingCodec {
  final val BlockSize = 128

  /** Encode one sorted posting run (single term, strictly increasing docIds)
    * into blocks of up to BlockSize entries.
    */
  def encodeRun(termId: Long, docIds: Array[Long], tfs: Array[Int],
                norms: Array[Byte]): Iterator[PostingBlock] = {
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
      PostingBlock(termId, first, docIds(idxs.last), n,
        ForCodec.pack(gaps), ForCodec.pack(tfl), normArr, maxTf, maxNb)
    }
  }

  /** Decode a block back to parallel (docIds, tfs, norms) arrays. */
  def decode(b: PostingBlock): (Array[Long], Array[Int], Array[Byte]) = {
    val gaps = ForCodec.unpack(b.doc_bytes)
    val tfl = ForCodec.unpack(b.tf_bytes)
    val docs = new Array[Long](b.cnt)
    val tfs = new Array[Int](b.cnt)
    var i = 0
    var doc = b.first_doc
    while (i < b.cnt) {
      if (i > 0) doc += gaps(i - 1)
      docs(i) = doc
      tfs(i) = tfl(i).toInt
      i += 1
    }
    (docs, tfs, b.norm_bytes)
  }
}
