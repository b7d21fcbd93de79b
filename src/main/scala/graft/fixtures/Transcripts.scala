package graft.fixtures

import graft.model.Turn
import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic transcript synthesizer (FIXTURES.md §1): the input table of
  * the north star, shaped exactly as the input hint
  * (conv_id, turn_idx, role, text, tool, ts). Every turn is a pure function
  * of (seed, conv_idx, turn_idx), so any partitioning produces identical rows
  * and the per-turn text equality invariant holds trivially between the
  * engine input and the oracle input.
  */
object Transcripts {

  final val Epoch = 1767225600000L // 2026-01-01T00:00:00Z

  private val RealWords: Array[String] = (
    "time person year way day thing man world life hand part child eye woman " +
    "place work week case point government company number group problem fact " +
    "be have do say get make go know take see come think look want give use " +
    "find tell ask seem feel try leave call good new first last long great " +
    "little own other old right big high different small large next early " +
    "young important few public bad same able the a an and are as at but by " +
    "for if in into is it no not of on or such that their then there these " +
    "they this to was will with spark index search query merge sort shuffle " +
    "partition token score rank batch stream agent tool turn reply plan act " +
    "observe error retry cache disk memory node executor driver stage task " +
    "don't can't it's we're i've you'll o'neil e.g 3.14 2.0 v1.2.3 foo.bar " +
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu " +
    "xi omicron pi rho sigma tau upsilon phi chi psi omega zero one two three " +
    "four five six seven eight nine ten hundred thousand million run jump " +
    "walk talk read write speak listen open close start stop begin end"
  ).split("\\s+")

  final val VocabSize = 30000
  private val ZipfS = 1.07

  /** Cumulative Zipf(s=1.07) distribution over ranks 1..VocabSize. */
  private lazy val zipfCdf: Array[Double] = {
    val w = Array.tabulate(VocabSize)(i => 1.0 / math.pow(i + 1.0, ZipfS))
    val total = w.sum
    val cdf = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf
  }

  private def word(rank: Int): String =
    if (rank < RealWords.length) RealWords(rank) else f"w$rank%06d"

  private val Tools = Array("bash", "grep", "read", "write", "edit", "search",
    "browse", "fetch", "plan", "exec", "test", "commit")

  private def mix(seed: Long, a: Long, b: Long): Long = {
    var h = seed ^ (a * 0x9e3779b97f4a7c15L) ^ (b * 0xc2b2ae3d27d4eb4fL)
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  def turnsFor(convIdx: Long, seed: Long): Seq[Turn] = {
    val rng = new java.util.Random(mix(seed, convIdx, 0))
    // nTurns ~ 1 + geometric(p=0.25), capped 40
    var n = 1
    while (n < 40 && rng.nextDouble() > 0.25) n += 1
    val convId = f"c$convIdx%08d"
    (0 until n).map { turnIdx =>
      val trng = new java.util.Random(mix(seed, convIdx, turnIdx + 1))
      val isTool = turnIdx > 0 && turnIdx % 2 == 0 && trng.nextDouble() < 0.1
      val role =
        if (isTool) "tool" else if (turnIdx % 2 == 0) "user" else "assistant"
      val nTok = math.min(512, math.max(1,
        math.exp(3.2 + 0.8 * trng.nextGaussian()).toInt))
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < nTok) {
        if (i > 0) sb.append(' ')
        val u = trng.nextDouble()
        if (u < 0.005) {
          sb.append("x".repeat(280)) // >255 chars: dropped but counts a position
        } else if (u < 0.025) {
          sb.append(sampleWord(trng)).append('.').append(sampleWord(trng))
        } else {
          sb.append(sampleWord(trng))
        }
        i += 1
      }
      Turn(convId, turnIdx, role,
        sb.toString,
        if (role == "tool") Tools(trng.nextInt(Tools.length)) else null,
        new Timestamp(Epoch + convIdx * 97000L + turnIdx * 13000L))
    }
  }

  private def sampleWord(rng: java.util.Random): String = {
    val u = rng.nextDouble()
    var lo = 0
    var hi = VocabSize - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCdf(mid) < u) lo = mid + 1 else hi = mid
    }
    word(lo)
  }

  def dataset(spark: SparkSession, numConvs: Long, seed: Long = 42L): Dataset[Turn] = {
    import spark.implicits._
    spark.range(numConvs).flatMap(turnsFor(_, seed))
  }

  /** Driver-free local generation for the in-memory oracle. */
  def local(numConvs: Long, seed: Long = 42L): Seq[Turn] =
    (0L until numConvs).flatMap(turnsFor(_, seed))
}
