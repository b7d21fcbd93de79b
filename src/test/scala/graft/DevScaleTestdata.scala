package graft

import org.apache.spark.sql.SparkSession

/** Deterministic 10x (or Kx) scaler for the driver's synthetic gate tables
  * (round-5 sf1 rehearsal). Reads documents/embeddings/events from an
  * existing sf dir and writes K perturbed replicas — NO external data, NO
  * nondeterminism: every perturbation is a splitmix64 of (id, replica, pos).
  *
  * Replica design (r = 0..K-1):
  *  - documents: ids shift by r*N. r=0 is the original; r=5 is an EXACT text
  *    copy (feeds exact-dedup groups); other replicas replace a per-mille of
  *    tokens graded from 10 to 500 (feeds the near-dup gates with pairs on
  *    BOTH sides of the 0.8 Jaccard / simhash / minhash thresholds).
  *  - embeddings: ids shift by r*N; per-dim uniform noise graded 0..0.3 then
  *    re-normalized to unit length (gates assume cosine == dot).
  *  - events: ids shift; each replica's users are a fresh id range (so
  *    sessionization sees 10x users, same per-user session shape).
  *
  * Usage: Test/runMain graft.DevScaleTestdata <inSfDir> <outDir> <K>
  */
object DevScaleTestdata {

  private def mix(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def h3(a: Long, b: Long, c: Long): Long = mix(mix(mix(a) ^ b) ^ c)

  private val vocab: Array[String] = Array(
    "small", "table", "window", "scan", "filter", "line", "value", "join",
    "stream", "slow", "fast", "spark", "column", "order", "group", "batch",
    "sort", "hash", "key", "query", "agg", "big", "part", "index")

  /** Token-replacement rate (per mille) and embedding noise per replica. */
  private def docPerMille(r: Int): Int =
    Array(0, 10, 40, 120, 300, 0, 20, 80, 200, 500)(r % 10)
  private def embNoise(r: Int): Double =
    Array(0.0, 0.002, 0.01, 0.05, 0.15, 0.0, 0.004, 0.02, 0.08, 0.3)(r % 10)

  final case class Doc(doc_id: Long, text: String, lang: String,
                       source: String, n_chars: Long)
  final case class Emb(vec_id: Long, embedding: Array[Float], label: Int)
  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, value: Double, props: String)

  def main(args: Array[String]): Unit = {
    val in = args(0)
    val outDir = args(1)
    val k = args(2).toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$in/documents.parquet").as[Doc]
    val nDocs = docs.count()
    docs.flatMap { d =>
      (0 until k).iterator.map { r =>
        val pm = docPerMille(r)
        val text =
          if (pm == 0) d.text
          else {
            val toks = d.text.split(' ')
            var p = 0
            while (p < toks.length) {
              val h = h3(d.doc_id, r.toLong, p.toLong)
              if (math.floorMod(h, 1000L) < pm)
                toks(p) = vocab(math.floorMod(h >>> 13, vocab.length.toLong).toInt)
              p += 1
            }
            toks.mkString(" ")
          }
        Doc(d.doc_id + r * nDocs, text, d.lang, d.source, text.length.toLong)
      }
    }.repartition(16).write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val embs = spark.read.parquet(s"$in/embeddings.parquet").as[Emb]
    val nEmbs = embs.count()
    embs.flatMap { e =>
      (0 until k).iterator.map { r =>
        val noise = embNoise(r)
        val v =
          if (noise == 0.0) e.embedding
          else {
            val out = new Array[Float](e.embedding.length)
            var i = 0
            var ss = 0.0
            while (i < out.length) {
              val u = (h3(e.vec_id, r.toLong, i.toLong) >>> 11) * (1.0 / (1L << 53))
              out(i) = (e.embedding(i) + (2.0 * u - 1.0) * noise).toFloat
              ss += out(i).toDouble * out(i)
              i += 1
            }
            val inv = (1.0 / math.sqrt(ss)).toFloat
            i = 0
            while (i < out.length) { out(i) *= inv; i += 1 }
            out
          }
        Emb(e.vec_id + r * nEmbs, v, e.label)
      }
    }.repartition(8).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    val evs = spark.read.parquet(s"$in/events.parquet").as[Ev]
    val nEvs = evs.count()
    evs.flatMap { e =>
      (0 until k).iterator.map { r =>
        Ev(e.event_id + r * nEvs, e.ts, e.user_id + r * 1000000L,
          e.event_type, e.value, e.props)
      }
    }.repartition(16).write.mode("overwrite").parquet(s"$outDir/events.parquet")

    println(s"""{"scaled": "$outDir", "k": $k, "docs": ${nDocs * k}, """ +
      s""""embs": ${nEmbs * k}, "events": ${nEvs * k}}""")
    spark.stop()
  }
}
