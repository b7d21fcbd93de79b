package graft

import graft.operators.ProductQuantizer
import org.scalatest.funsuite.AnyFunSuite

/** PQ invariants + end-to-end recall on CLUSTERABLE data (the regime PQ is
  * for — distance-concentrated uniform-random vectors defeat any compressed
  * index, see the operator scaladoc).
  */
class ProductQuantizerSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** 16 well-separated seeded centers in 32-D, 20 noisy points each. Ids
    * 0..15 are the pure centers (doubling as the deterministic init).
    */
  private def clustered(): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(16)(Array.fill(32)((rnd.nextDouble() * 20 - 10).toFloat))
    val pts = for {
      c <- 0 until 16
      i <- 0 until 20
    } yield {
      val v = centers(c).map(x => x + (rnd.nextDouble() * 0.2 - 0.1).toFloat)
      (16L + c * 20 + i, v)
    }
    centers.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq ++ pts
  }

  test("ADC is exact on codebook points (untrained, iters=0)") {
    import spark.implicits._
    val data = clustered()
    val ds = spark.createDataset(data)
    val cb = ProductQuantizer.train(spark, ds, m = 4, ks = 16, iters = 0)
    val query = data.head._2
    val t = ProductQuantizer.adcTable(query, cb)
    // a codebook point's code is its own centroid per subspace, so its ADC
    // distance equals its true squared L2 distance to the query
    data.take(16).foreach { case (id, v) =>
      val codes = ProductQuantizer.encode(v, cb)
      assert(codes.toSeq == Seq.fill(4)(id.toInt), s"vec $id self-code")
      val ad = codes.indices.map(j => t(j)(codes(j))).sum
      val truth = v.indices.map { i =>
        val d = v(i).toDouble - query(i).toDouble; d * d
      }.sum
      assert(math.abs(ad - truth) < 1e-9, s"vec $id ADC exactness")
    }
  }

  test("trained PQ: shortlist+rerank recovers the exact top-10 on clusters") {
    import spark.implicits._
    val data = clustered()
    val ds = spark.createDataset(data).cache()
    val cb = ProductQuantizer.train(spark, ds, m = 4, ks = 16, iters = 3)
    val query = data.find(_._1 == 16L).get._2 // a noisy point of cluster 0
    // codes-table round-trip: materialize to parquet and read BACK, so the
    // ADC pass provably runs off the persisted codes, not raw vectors
    val codesDir = s"target/test-pq-codes-${System.nanoTime()}"
    ProductQuantizer.encodeStore(spark, ds, cb)
      .toDF("vec_id", "codes").write.mode("overwrite").parquet(codesDir)
    val codes = spark.read.parquet(codesDir)
      .as[(Long, Array[Int])]
    val got = ProductQuantizer.search(spark, codes, ds, cb, query,
      shortlist = 50, k = 10).map(_._1).toSet
    val exact = data.map { case (id, v) =>
      (id, v.indices.map { i =>
        val d = v(i).toDouble - query(i).toDouble; d * d
      }.sum)
    }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    assert((got & exact).size >= 9, s"recall ${(got & exact).size}/10")
  }

  test("trained codebooks reduce quantization error vs init") {
    import spark.implicits._
    val data = clustered()
    val ds = spark.createDataset(data).cache()
    def mse(iters: Int): Double = {
      val cb = ProductQuantizer.train(spark, ds, m = 4, ks = 16, iters = iters)
      data.map { case (_, v) =>
        val codes = ProductQuantizer.encode(v, cb)
        codes.indices.map { j =>
          val c = cb.cents(j)(codes(j))
          c.indices.map { i =>
            val d = v(j * cb.sub + i).toDouble - c(i); d * d
          }.sum
        }.sum
      }.sum / data.size
    }
    assert(mse(3) <= mse(0))
  }
}
