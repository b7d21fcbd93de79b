package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a candidate-pair edge list — turns pairwise
  * near-duplicate MATCHES (MinHash / SimHash / embedding-LSH band output)
  * into duplicate GROUPS, the step a dedup pipeline needs before
  * keep-one-per-group. The reference's sandbox DuplicateFilter
  * (/root/reference/src/Lucene.Net.Sandbox/Queries/DuplicateFilter.cs) only
  * handles EXACT key equality; transitive near-dup grouping is the scale
  * generalization (algorithm: min-label propagation with pointer jumping,
  * the doubling variant of Kiveris et al., "Connected Components in
  * MapReduce and Beyond", ACM SoCC 2014).
  *
  * Each round every node takes the min label over itself and its neighbors,
  * then labels compress one hop (L(v) := L(L(v))). Jumping halves chain
  * depth per round, so convergence is O(log d) rounds for diameter d —
  * near-dup clusters are near-cliques, 2–4 rounds in practice. Labels
  * decrease monotonically, so convergence is detected by the label sum
  * going stationary: ONE scalar aggregate per round instead of an
  * old-vs-new diff join.
  *
  * 100 TB notes: every step is a keyed shuffle over the edge/label tables —
  * two hash joins + one aggregate per round, nothing data-sized ever
  * reaches the driver or a broadcast. The current labels persist
  * MEMORY_AND_DISK and the previous round unpersists, so peak footprint is
  * two label tables + the (static, reusable) symmetric edge table. Hub-node
  * skew is bounded upstream by LSH banding (candidate pairs come per band
  * bucket, capping degree); for adversarial graphs checkpoint labels every
  * ~5 rounds to truncate lineage — at the observed 2–4 rounds the plan
  * stays shallow without it.
  */
object ConnectedComponents {

  /** Components of the undirected graph given by `pairs` (two numeric id
    * columns). Returns (doc_id, root) for every node that appears in a pair;
    * root = min id of the node's component.
    */
  def components(pairs: DataFrame, maxRounds: Int = 25): DataFrame = {
    val cols = pairs.columns
    require(cols.length == 2, s"pairs must have two id columns, got ${cols.toSeq}")
    val base = pairs.select(col(cols(0)).cast("long").as("v"), col(cols(1)).cast("long").as("n"))
    val sym = base.union(base.select(col("n").as("v"), col("v").as("n")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (sym.isEmpty) {
      // zero candidate pairs: no nodes, no groups — an empty (doc_id, root)
      // frame, not an NPE from a null label-sum aggregate
      sym.unpersist()
      return base.sparkSession.range(0)
        .select(col("id").as("doc_id"), col("id").as("root"))
    }
    var lab = sym.select(col("v")).distinct().withColumn("l", col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // decimal(38,0) sum: overflow-proof at any id range / node count;
    // coalesced to 0 so an empty label table can never yield a null
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("l").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head().getDecimal(0)
    var prev = labelSum(lab)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val nmin = sym
        .join(lab.select(col("v").as("n"), col("l").as("nl")), "n")
        .groupBy("v").agg(min("nl").as("nm"))
      val stepped = lab.join(nmin, Seq("v"), "left")
        .select(col("v"), least(col("l"), coalesce(col("nm"), col("l"))).as("l"))
      // pointer jump: L(v) := L(L(v)) (labels are node ids, so L(l) exists)
      val jumped = stepped
        .join(stepped.select(col("v").as("l"), col("l").as("ll")), Seq("l"), "left")
        .select(col("v"), coalesce(col("ll"), col("l")).as("l"))
        // checkpoint, not persist: an iterative DataFrame loop must TRUNCATE
        // the logical plan each round or Catalyst re-analyzes a plan that
        // doubles per iteration (the self-join). localCheckpoint keeps
        // blocks on executors; a multi-hour cluster job would use a
        // reliable checkpoint dir instead (same call shape).
        .localCheckpoint(true)
      val cur = labelSum(jumped)
      lab.unpersist()
      lab = jumped
      converged = cur.compareTo(prev) == 0
      prev = cur
      rounds += 1
    }
    sym.unpersist()
    // maxRounds is a safety valve, not an answer: labels that never went
    // stationary are possibly wrong (split components), so fail loudly
    // (after releasing the cached edge table — a retrying caller must not
    // accumulate leaked persists)
    if (!converged) {
      lab.unpersist()
      throw new IllegalStateException(
        s"label propagation did not converge in $maxRounds rounds " +
          "(adversarial chain graph? raise maxRounds or checkpoint labels)")
    }
    lab.select(col("v").as("doc_id"), col("l").as("root"))
  }

  /** Groups of size >= 2: (root, size), the dedup-pipeline product (pick one
    * representative per root, drop the rest).
    */
  def groups(pairs: DataFrame): DataFrame =
    components(pairs)
      .groupBy("root").agg(count(lit(1)).as("size"))
      .orderBy("root")
}
