package graft.operators

import graft.query.{MemoryIndex, Query}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch percolation — the production shape of MemoryIndex
  * (/root/reference/src/Lucene.Net.Memory/MemoryIndex.cs:159, whose doc
  * comment names exactly this use: "a pool of registered queries ... run
  * against each incoming document"): N standing queries classify a corpus
  * stream. The Spark plan is the one that survives 100 TB: the (small,
  * driver-held) query pool broadcasts to every executor, each document is
  * analyzed ONCE into a single-doc in-RAM index and matched against all
  * queries in place — one narrow pass, no shuffle, no join; output is the
  * (doc, query) match pairs. Routing/filtering pipelines (alerting, topic
  * taps on a crawl) are this operator.
  */
object Percolator {

  /** Percolate `docs` (idCol: long, textCol: string) against the standing
    * `queries` pool. Returns (doc_id, query_id) — one row per match.
    */
  def percolate(docs: DataFrame, idCol: String, textCol: String,
                queries: Seq[(String, Query)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(queries)
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val pool = bq.value
        it.flatMap { case (id, text) =>
          val mi = new MemoryIndex(if (text == null) "" else text)
          pool.iterator.collect { case (qid, q) if mi.matches(q) => (id, qid) }
        }
      }
      .toDF("doc_id", "query_id")
  }
}
