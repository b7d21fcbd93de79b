package graft.model

import java.sql.Timestamp

/** Input row shape fixed by the task's input hint: one conversation turn. */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** A partial posting run produced by one build task (the DWPT-flush analog,
  * /root/reference/src/Lucene.Net/Index/DocumentsWriterPerThread.cs semantics):
  * all postings of one term within one doc-range partition, doc-sorted,
  * compressed. Runs from different partitions cover disjoint doc ranges, so the
  * global merge is a pure concatenate-and-reblock
  * (SegmentMerger semantics, /root/reference/src/Lucene.Net/Index/SegmentMerger.cs:108-162).
  */
final case class Run(
    pid: Int, // source partition for doc-id offset fixup; -1 = ids already global
    term: String,
    first_doc: Long, // partition-local when pid >= 0 (gaps are shift-invariant)
    last_doc: Long,
    cnt: Int,
    sum_tf: Long,
    max_tf: Int,
    max_nb: Int,
    doc_bytes: Array[Byte], // ForCodec-packed gaps (cnt-1 values)
    tf_bytes: Array[Byte],  // ForCodec-packed tfs (cnt values)
    norm_bytes: Array[Byte], // raw norm byte per posting
    pos_bytes: Array[Byte], // varint-delta positions, tf per posting (may be empty)
    pay_bytes: Array[Byte] = Array.emptyByteArray, // per-position payloads (varint len + bytes; empty when the index stores none)
    off_bytes: Array[Byte] = Array.emptyByteArray // per-position char offsets (varint start-delta + length, 2*tf varints per posting; empty when not indexed)
)

/** Doc-norms sidecar row: emitted-token count and its lossy norm byte. */
final case class NormRow(doc_id: Long, len: Int, norm: Byte)

/** Term-dictionary row. `max_tf`/`max_nb` are the term's GLOBAL block-max
  * metadata (max tf over all postings; max unsigned norm byte = shortest
  * matching doc): together they give a per-term global score upper bound, so
  * the WAND kernel needs no metadata scan before pruning (the skip-list top
  * level, held dictionary-side like the reference's in-RAM term index,
  * /root/reference/src/Lucene.Net/Codecs/BlockTreeTermsWriter.cs:57-64).
  */
final case class TermDictRow(term: String, term_id: Long, df: Long, ttf: Long,
                             max_tf: Int, max_nb: Int)

/** Collection-level statistics
  * (/root/reference/src/Lucene.Net/Search/CollectionStatistics.cs:27-78).
  */
final case class CollectionStats(max_doc: Long, doc_count: Long, sum_ttf: Long, sum_df: Long)
