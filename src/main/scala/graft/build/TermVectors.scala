package graft.build

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.{Analyzer, TextAnalyzer}

/** Term vectors: the per-DOCUMENT mini inverted index — for each doc, its
  * terms with tf, positions and character offsets — the reference's
  * field-level `StoreTermVectors/Positions/Offsets` artifact
  * (/root/reference/src/Lucene.Net/Document/FieldType.cs:166-232, writer
  * /root/reference/src/Lucene.Net/Codecs/TermVectorsWriter.cs:30-60,
  * Lucene40 format
  * /root/reference/src/Lucene.Net/Codecs/Lucene40/Lucene40TermVectorsWriter.cs).
  * Consumers are doc-at-a-time: highlighting snippets without re-analysis,
  * MoreLikeThis seed extraction.
  *
  * Spark-first layout: a DOC-MAJOR Parquet table `(doc_id, term, tf,
  * positions, starts, ends)`, one row per (doc, term), terms sorted within a
  * doc. The build is one analysis pass (`flatMap`, no shuffle) followed by a
  * single range exchange on `doc_id`: range boundaries are sampled from the
  * data, so the layout is identical at any parallelism, and
  * `sortWithinPartitions(doc_id)` gives every file a tight doc_id min/max —
  * a per-doc fetch at 100 TB prunes to one file + one row group by Parquet
  * statistics alone (the vectors analog of the reference's direct
  * per-docID `.tvx` seek).
  *
  * Offsets come from the analyzer's span tracking ([[TextAnalyzer.tokenSpans]]):
  * they always index the ORIGINAL text, so `text.substring(start, end)` is
  * the surface form even under stemming chains.
  */
object TermVectors {

  final case class DocVector(
      doc_id: Long, term: String, tf: Int,
      positions: Array[Int], starts: Array[Int], ends: Array[Int])

  /** Single-doc vector (term-sorted), the per-row kernel of [[build]]. */
  def vectorsOf(docId: Long, text: String,
                analyzer: TextAnalyzer = Analyzer): Seq[DocVector] = {
    val (toks, starts, ends) = analyzer.tokenSpans(if (text == null) "" else text)
    val m = new mutable.HashMap[String,
      (mutable.ArrayBuffer[Int], mutable.ArrayBuffer[Int], mutable.ArrayBuffer[Int])]()
    var p = 0
    while (p < toks.length) {
      val t = toks(p)
      if (t != null) {
        val acc = m.getOrElseUpdate(t,
          (new mutable.ArrayBuffer[Int], new mutable.ArrayBuffer[Int],
            new mutable.ArrayBuffer[Int]))
        acc._1 += p; acc._2 += starts(p); acc._3 += ends(p)
      }
      p += 1
    }
    m.toSeq.sortBy(_._1).map { case (t, (ps, ss, es)) =>
      DocVector(docId, t, ps.length, ps.toArray, ss.toArray, es.toArray)
    }
  }

  /** Build the vectors table over `docs` (`doc_id`, `text`). */
  def build(spark: SparkSession, docs: DataFrame, outDir: String,
            analyzer: TextAnalyzer = Analyzer): Unit = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) => vectorsOf(id, text, analyzer) }
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id", "term")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Doc-at-a-time fetch; the `doc_id IN (...)` predicate reaches the Parquet
    * scan and prunes by file/row-group statistics (doc-major layout above).
    */
  def fetch(spark: SparkSession, dir: String, docIds: Seq[Long]): DataFrame =
    spark.read.parquet(dir).filter(col("doc_id").isin(docIds: _*))
}
