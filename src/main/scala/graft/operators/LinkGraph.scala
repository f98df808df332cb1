package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L111 — damped PageRank over a DIRECTED weighted link graph (Brin &
  * Page 1998), the crawl-accounting signal a CCNet-style pipeline uses
  * to rank registrable domains before deciding how much of each to
  * keep: a domain linked from many well-linked domains is likelier to
  * host quality pages than an orphan content farm.
  *
  * DETERMINISM (the TextRank discipline, op/TextRank.scala): the
  * iteration runs in scaled 64-bit INTEGER arithmetic — ranks carry
  * `scale` fixed-point units, each edge ships `rank · wt div outdeg`
  * (floor division) along its direction, and the damping update is
  * `0.15·scale + (85 · Σcontrib) div 100`. Exact integer math means
  * the result is bit-identical across engines; an external SQL oracle
  * replays the rounds as chained CTEs. Two deliberate semantic choices
  * vs TextRank's undirected form:
  *   - contributions flow along EDGE DIRECTION and divide by the
  *     source's OUT-degree (sum of outgoing weight), the PageRank
  *     random-surfer model;
  *   - every node (any edge endpoint) keeps a rank every round — a
  *     node with no in-links holds the damping base rather than
  *     dropping out (the dangling/source-node modeling a directed
  *     graph needs; TextRank's undirected edges make this moot).
  *
  * Scale design (100 TB): the graph is DOMAIN-sized, not page-sized —
  * the caller reduces its corpus to (src, dst, wt) edges with one
  * linear groupBy shuffle first (t40 does host→host accounting off
  * t32's URL grammar), so each of the `iters` rounds is an edge-sized
  * hash join + aggregate and the corpus is touched exactly once.
  * Edges + out-degrees persist across rounds and are RELEASED before
  * return (the operator owns its cache — the bandedHammingPairs
  * discipline: the result is localCheckpoint'd eagerly, so the
  * unpersist can never trigger a recompute); ranks stay (node, long)
  * slim and are localCheckpoint'd per round, so round i's plan never
  * chains through rounds 1..i-1 (the lloydRounds flat-lineage
  * lesson — without it a 50-round graph grows an analyzer-hostile
  * iterative-join lineage). Below `localFinishEdges` the whole
  * iteration runs in ONE task in memory (the CC/BPE local-finish
  * pattern) — bit-equal to the distributed rounds because integer
  * sums are order-independent.
  *
  * FIXED-POINT HEADROOM: total rank mass ≈ V·scale, so a hub's rank
  * is V·scale-bounded and `rank · wt` needs V·scale·max(wt) < 2^63 —
  * at scale=1e9 a 1e4-domain graph tolerates per-edge weights to
  * ~9e5 (doc counts). Extreme graphs lower `scale` (ranking is
  * invariant; only resolution changes). Overflow is ANSI/addExact
  * fatal, never silent.
  */
object LinkGraph {

  /** Ranks after `iters` damped rounds over directed edges
    * `(src, dst, wt)`, in `scale` fixed-point units. Output:
    * `w, rank` (BIGINT), one row per node that appears as either
    * endpoint of an edge. Parallel edges are pre-summed; self-loops
    * are dropped (a self-link transfers no authority).
    */
  def pageRank(edges: DataFrame, iters: Int, scale: Long = 1000000000L,
               localFinishEdges: Long = 2000000L): DataFrame = {
    require(iters >= 1 && iters <= 50)
    val ed = edges.filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(sum("wt").as("wt"))
      .withColumn("deg", sum("wt").over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .persist()
    val base = (scale * 15L) / 100L
    if (localFinishEdges > 0 && ed.count() <= localFinishEdges) {
      import edges.sparkSession.implicits._
      val local = ed.select(col("src"), col("dst"), col("wt"), col("deg"))
        .as[(String, String, Long, Long)].coalesce(1).mapPartitions { it =>
          val es = it.toArray
          val nodes = scala.collection.mutable.LinkedHashSet.empty[String]
          es.foreach { case (s, d, _, _) => nodes += s; nodes += d }
          var rank = scala.collection.mutable.HashMap.empty[String, Long]
          nodes.foreach(n => rank(n) = scale)
          var i = 0
          while (i < iters) {
            val contrib = scala.collection.mutable.HashMap.empty[String, Long]
            es.foreach { case (s, d, w, dg) =>
              contrib(d) = java.lang.Math.addExact(contrib.getOrElse(d, 0L),
                java.lang.Math.multiplyExact(rank(s), w) / dg)
            }
            val next = scala.collection.mutable.HashMap.empty[String, Long]
            nodes.foreach { n =>
              next(n) = base +
                java.lang.Math.multiplyExact(85L, contrib.getOrElse(n, 0L)) / 100L
            }
            rank = next
            i += 1
          }
          rank.iterator
        }.toDF("w", "rank")
        // eager: the single task runs the whole iteration NOW, so
        // releasing the edge cache below cannot force a recompute
        .localCheckpoint(true)
      ed.unpersist(false)
      return local
    }
    val nodes = ed.select(col("src").as("w"))
      .union(ed.select(col("dst").as("w"))).distinct().persist()
    var ranks = nodes.withColumn("rank", lit(scale))
    for (_ <- 1 to iters) {
      val contrib = ed.join(ranks, ed("src") === ranks("w"))
        .select(col("dst"), expr("(rank * wt) div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      // every node keeps a rank: no-in-link nodes hold the base
      ranks = nodes.join(contrib, nodes("w") === contrib("dst"), "left")
        .select(col("w"),
          (lit(base) +
            expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")).as("rank"))
        // node-sized table: truncate lineage every round (the
        // lloydRounds pattern) — round i must not chain through
        // every prior round's join
        .localCheckpoint(true)
    }
    // the final round's checkpoint no longer references either cache
    ed.unpersist(false)
    nodes.unpersist(false)
    ranks
  }
}
