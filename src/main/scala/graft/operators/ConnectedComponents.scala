package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph — the clustering
  * step that turns pairwise dedup hits into canonical-document
  * assignments (every doc in a component maps to the component's
  * minimum id, the row a dedup pipeline keeps).
  *
  * Algorithm: min-label propagation with pointer jumping. Every node
  * starts labelled with its own id; each round replaces the label
  * with the minimum over itself and its neighbours, then SHORTCUTS
  * through the previous round's label map (lbl := prevLbl(lbl) —
  * valid because labels are always node ids of the same component
  * and prevLbl(u) <= u, so the jump only tightens). The neighbour
  * hop alone needs diameter rounds; the jump makes the reach
  * compound (roughly doubling per round), so convergence is
  * O(log diameter) — the path-halving trick from parallel
  * union-find, at the cost of one extra node-sized equi-join per
  * round against the already-persisted previous map.
  * Each round is two equi-joins plus one min-aggregate, all shuffling
  * on node id — linear in |E| per round, no cross product anywhere.
  * For adversarially deep graphs (long chains), [[alternatingStar]]
  * implements the large-star/small-star fallback (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond") — same join+agg
  * primitives, O(log²) rounds instead of O(diameter).
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
  /** @param localFinishEdges when the SYMMETRIZED edge list is at or
    *   below this many rows (and ids are longs), solve with a single-
    *   task union-find instead of distributed rounds — the standard
    *   contraction-style local finish (Kiveris et al. §6: "once the
    *   graph fits on one machine, finish there"). Dup-pair graphs are
    *   orders of magnitude smaller than their corpus (only docs WITH
    *   a near-dup edge appear), so even 100 TB corpora usually land
    *   here; graphs above the bound take the iterative path
    *   unchanged. 2M directed edges ≈ tens of MB of hash state in ONE
    *   task — an executor-side job, not a driver collect. Pass 0 to
    *   force the iterative path.
    */
  def minLabel(edges: DataFrame, maxIter: Int = 20,
               localFinishEdges: Long = 2000000L): DataFrame = {
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
    // Symmetrize with ONE scan of the edge subtree (explode of both
    // directions), not a self-union — a union's physical plan carries
    // two copies of the un-persisted pair-mining subtree, so the
    // materializing job would run the whole candidate-mining pass
    // twice before the first propagation round.
    val sym = edges.select(explode(array(
        struct(col(ec(0)).as("src"), col(ec(1)).as("dst")),
        struct(col(ec(1)).as("src"), col(ec(0)).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(MEMORY_AND_DISK)
    // The count doubles as sym's materializing action (pair mining
    // runs exactly once), and routes small graphs to the local finish.
    val nDirected = sym.count()
    val longIds = edges.schema.fields.take(2).forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (nDirected <= localFinishEdges && longIds) {
      import edges.sparkSession.implicits._
      val out = sym.as[(Long, Long)].coalesce(1).mapPartitions { it =>
        // min-root union-find with path compression: the root of every
        // set is its minimum member, so find(x) IS the component label.
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) {
            val n = parent(c); parent(c) = r; c = n
          }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        val keys = parent.keys.toArray
        keys.iterator.map(k => (k, find(k)))
      }.toDF("id", "cluster")
        .persist(MEMORY_AND_DISK)
      out.count() // materialize before sym is dropped
      sym.unpersist()
      return out
    }
    var (labels, prevSum) = materialize(
      sym.select(col("src").as("id")).distinct().withColumn("lbl", col("id")))
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val viaNbr = sym.join(labels, sym("dst") === labels("id"))
        .select(col("src").as("id"), col("lbl"))
      val hop = labels.select("id", "lbl").union(viaNbr)
        .groupBy("id").agg(min("lbl").as("lbl"))
      // Pointer jump through the PREVIOUS (persisted) label map:
      // hop.lbl is always some node's id, so the inner join is total;
      // the looked-up label is <= hop.lbl by the min-includes-self
      // invariant, making the select the min of the two for free.
      // Jumping through `labels` (already materialized) instead of
      // `hop` keeps the round at one action — a jump through `hop`
      // would recompute the hop subtree once per reference.
      val next0 = hop.join(
          labels.select(col("id").as("__jid"), col("lbl").as("__jlbl")),
          col("lbl") === col("__jid"))
        .select(col("id"), col("__jlbl").as("lbl"))
      // The round body references `labels` three times (hop join,
      // union, jump), so the logical plan grows ~3× per round even
      // though execution shortcuts through the persisted data —
      // truncate with an eager checkpoint every 2nd round (3^2 = 9
      // subtrees max) or driver-side analysis time explodes.
      val (next, newSum) = materialize(
        if (round % 2 == 1) next0.localCheckpoint() else next0)
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

  /** Large-star/small-star alternation (Kiveris et al. 2014): the
    * opt-in fallback for graphs whose diameter makes [[minLabel]]'s
    * O(diameter) rounds prohibitive — a 1000-link chain converges in
    * a handful of alternations instead of ~1000 label hops, because
    * each large-star round HALVES long paths (every node re-links to
    * its neighborhood minimum) rather than advancing labels one hop.
    *
    * Round body, all equi-join + min-agg on node id (linear shuffles,
    * same primitives as minLabel — no cross product):
    *   large-star(u): link every neighbor v > u to min(Γ(u) ∪ {u})
    *   small-star(u): link u and its lower neighbors to their min
    * Edges stay canonical (src > dst); the fixpoint is a star forest
    * whose centers are the component minima, read off directly.
    *
    * Same contract as [[minLabel]]: returns (id, cluster = component
    * min) for every node appearing in `edges`. Prefer minLabel for
    * dedup-shaped (shallow) graphs — fewer jobs per round and no
    * exact set-equality convergence check. (Measured on the real d07
    * pair graph at sf0.1 via CCBench: 9.4-10.1 s here vs 10.1-13.3 s
    * for minLabel under ambient load — within contention noise, so
    * the simpler minLabel stays the default; the alternation's win
    * is asymptotic, on deep graphs.)
    */
  def alternatingStar(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val ec = edges.columns
    // canonical undirected edge list: (src, dst) with src > dst
    var cur = edges
      .select(col(ec(0)).as("a"), col(ec(1)).as("b"))
      .where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("src"),
        least(col("a"), col("b")).as("dst"))
      .distinct()
      .persist(MEMORY_AND_DISK)
    var curCnt = cur.count()
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // large-star over the symmetric view: for each u, every strictly
      // larger neighbor re-links to m = min(Γ(u) ∪ {u}); m < v always,
      // so output stays canonical
      val nbr = cur.union(cur.select(col("dst").as("src"), col("src").as("dst")))
      val mn = nbr.groupBy("src").agg(min("dst").as("mn"))
      val large = nbr.join(mn, "src")
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), least(col("mn"), col("src")).as("dst"))
        .distinct()
      // small-star: every edge already points down, so per node u the
      // lower neighborhood min m re-links u and its other lower
      // neighbors
      val mn2 = large.groupBy("src").agg(min("dst").as("m"))
      val next0 = large.join(mn2, "src")
        .where(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(mn2.select(col("src"), col("m").as("dst")))
        .distinct()
      // The round body references `cur` several times (symmetric view,
      // both stars, the equality check), so the LOGICAL plan grows
      // multiplicatively per round even though execution shortcuts
      // through the persisted data — checkpoint every 2nd round to
      // keep driver-side analysis flat.
      val next = (if (round % 2 == 1) next0.localCheckpoint() else next0)
        .persist(MEMORY_AND_DISK)
      val nextCnt = next.count()
      // fixpoint = edge SET unchanged (a star forest maps to itself
      // under both phases). Count first as the cheap short-circuit;
      // exact set equality only when counts match — sums could
      // collide, and this path exists for correctness on adversarial
      // graphs.
      converged = nextCnt == curCnt &&
        next.exceptAll(cur).limit(1).count() == 0
      cur.unpersist()
      cur = next
      curCnt = nextCnt
      round += 1
    }
    // star forest → assignments; centers appear only as dst (their
    // cluster is themselves)
    cur.select(col("src").as("id"), col("dst").as("cluster"))
      .union(cur.select(col("dst").as("id"), col("dst").as("cluster")))
      .groupBy("id").agg(min("cluster").as("cluster"))
  }
}
