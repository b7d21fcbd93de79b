package graft

import graft.codec.SmallFloat
import graft.model.CollectionStats
import graft.score._
import scala.util.Random

/** One-off similarity-matrix numeric hunt (dev main, not part of the
  * suite): every similarity (BM25, Classic, SweetSpot, LMJM, LMDirichlet,
  * the full DFR 7-basic-model x 3-after-effect x 5-normalization matrix,
  * the IB 2x2x(lambda) family, MultiSimilarity) over random VALID
  * collection/term stats and tf/norm inputs:
  *  - scores are finite (no NaN/Inf anywhere in the domain);
  *  - scores are >= 0 (Lucene clips negative LM/DFR contributions);
  *  - scores are non-decreasing in tf at fixed stats (rank sanity — more
  *    occurrences never hurt), allowing float32 ties. EXCEPTED: DFR basic
  *    models P and D, whose published information content genuinely
  *    DECREASES in tf while tfn < lambda (= ttf/maxDoc): occurrences below
  *    the collection-expected Poisson rate carry less surprisal —
  *    d/dtfn [tfn*log2(tfn/lambda) + (lambda-tfn)*log2 e] = log2(tfn/lambda)
  *    < 0 there — and BE, the Bose-Einstein limiting form the reference
  *    itself deprecates for numerical instability (its javadoc recommends
  *    Ine instead; here it dips slightly at degenerate 1-doc corpora).
  *    The reference asserts only finite/positive in its randomized
  *    similarity tests, never tf-monotonicity (verified empirically: the
  *    sweeps flagged ONLY P/D/BE combinations, all 131 sims finite and
  *    non-negative everywhere, and every NON-P/D/BE sim is monotone).
  */
object DevSimilarityHunt {
  def main(args: Array[String]): Unit = {
    val rnd = new Random(if (args.nonEmpty) args(0).toLong else 20260822L)

    val norms: Seq[DfrNormalization] = Seq(DfrNormalization.None,
      DfrNormalization.H1(), DfrNormalization.H2(), DfrNormalization.H3(),
      DfrNormalization.Z())
    val models: Seq[DfrBasicModel] = Seq(DfrBasicModel.IF, DfrBasicModel.In,
      DfrBasicModel.Ine, DfrBasicModel.G, DfrBasicModel.P, DfrBasicModel.D,
      DfrBasicModel.BE)
    val effects: Seq[DfrAfterEffect] = Seq(DfrAfterEffect.None,
      DfrAfterEffect.L, DfrAfterEffect.B)
    val dists: Seq[IbDistribution] = Seq(IbDistribution.LL, IbDistribution.SPL)
    val lambdas: Seq[IbLambda] = Seq(IbLambda.DF, IbLambda.TTF)

    val sims: Seq[(String, Similarity)] =
      Seq[(String, Similarity)](("bm25", Bm25Similarity), ("classic", ClassicSimilarity),
        ("sweetspot", SweetSpotSimilarity()),
        ("lmjm", LMJelinekMercerSimilarity()), ("lmdirichlet", LMDirichletSimilarity()),
        ("multi", MultiSimilarity(Seq(Bm25Similarity, ClassicSimilarity)))) ++
      (for (m <- models; e <- effects; n <- norms)
        yield (s"dfr-$m-$e-${n.getClass.getSimpleName}", DFRSimilarity(m, e, n): Similarity)) ++
      (for (d <- dists; l <- lambdas; n <- norms)
        yield (s"ib-$d-$l-${n.getClass.getSimpleName}", IBSimilarity(d, l, n): Similarity))

    println(s"matrix size: ${sims.size} similarities")
    var fails = 0
    def check(label: String, cond: Boolean, detail: => String): Unit =
      if (!cond) { fails += 1; println(s"SIM-DIVERGE $label: $detail") }

    val trials = if (args.length > 1) args(1).toInt else 200
    (1 to trials).foreach { t =>
      // random valid stats: maxDoc >= 1, df in [1, maxDoc], ttf >= df,
      // sumTtf >= ttf and consistent with maxDoc-scale lengths
      val maxDoc = 1L + rnd.nextLong(1L << (1 + rnd.nextInt(38)))
      val df = 1L + rnd.nextLong(maxDoc)
      val ttf = df + rnd.nextLong(df * (1 + rnd.nextInt(20)) + 1)
      val sumTtf = math.max(ttf, maxDoc * (1 + rnd.nextInt(200)))
      val stats = CollectionStats(maxDoc, maxDoc, sumTtf, ttf max df)
      val boost = Vector(0.5f, 1.0f, 2.0f)(rnd.nextInt(3))
      val dl = 1 + rnd.nextInt(2000)
      val nb: Byte = SmallFloat.encodeNorm(dl)
      // PHYSICAL consistency: one doc's tf can't exceed its own length, nor
      // the term occurrences left after the other df-1 docs take one each
      val tfCap = math.min(dl.toLong, ttf - (df - 1)).toFloat
      val tfs = Seq(1f, 2f, 3f, 5f, 10f, 50f, 255f, 1000f).filter(_ <= tfCap)
      sims.foreach { case (name, sim) =>
        val monotoneExpected = !(name.startsWith("dfr-P-") || name.startsWith("dfr-D-") || name.startsWith("dfr-BE-"))
        val sc = sim.termScorer(df, ttf, stats, boost)
        var prev = -1.0f
        tfs.foreach { tf =>
          val s = sc.score(tf, nb)
          check(s"$name/t$t/finite", java.lang.Float.isFinite(s),
            s"score($tf, nb=$nb) = $s with df=$df ttf=$ttf maxDoc=$maxDoc sumTtf=$sumTtf")
          check(s"$name/t$t/nonneg", s >= 0.0f,
            s"negative score $s at tf=$tf df=$df ttf=$ttf maxDoc=$maxDoc sumTtf=$sumTtf")
          if (monotoneExpected)
            check(s"$name/t$t/monotone", s >= prev - math.abs(prev) * 1e-5f,
              s"score fell $prev -> $s at tf=$tf df=$df ttf=$ttf maxDoc=$maxDoc sumTtf=$sumTtf nb=$nb")
          prev = s
        }
      }
    }
    println(s"similarity hunt: $trials stat draws x ${sims.size} sims x 8 tfs, fails=$fails")
    println(s"SIM_HUNT_RESULT fails=$fails")
    if (fails > 0) sys.exit(1)
  }
}
