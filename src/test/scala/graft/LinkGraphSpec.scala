package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LinkGraph

/** L111 — damped integer PageRank: the distributed join+agg rounds and
  * the single-task local finish must be bit-equal (integer sums are
  * order-independent), and both must match an independent scalar
  * reference computed here with plain Long arithmetic.
  */
class LinkGraphSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  import spark.implicits._

  // a 4-node directed graph with a cycle, a hub, and a source-only
  // node (s has out-links but no in-links — must hold the base)
  private val E = Seq(
    ("a", "b", 3L), ("b", "c", 1L), ("c", "a", 2L),
    ("a", "c", 1L), ("s", "a", 5L))

  private def scalarRef(iters: Int, scale: Long): Map[String, Long] = {
    val nodes = E.flatMap(e => Seq(e._1, e._2)).distinct
    val deg = E.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val base = scale * 15L / 100L
    var rank = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[String, Long]
      E.foreach { case (s, d, w) =>
        contrib(d) = contrib.getOrElse(d, 0L) + rank(s) * w / deg(s)
      }
      rank = nodes.map(n => n -> (base + 85L * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  test("local finish == distributed rounds == scalar reference; dangling source holds base") {
    val edges = E.toDF("src", "dst", "wt")
    val iters = 4; val scale = 1000000000L
    val local = LinkGraph.pageRank(edges, iters, scale).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dist = LinkGraph.pageRank(edges, iters, scale, localFinishEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = scalarRef(iters, scale)
    assert(local === ref, "local finish diverged from scalar reference")
    assert(dist === ref, "distributed rounds diverged from scalar reference")
    // the source-only node has no in-links: exactly the damping base
    assert(ref("s") === scale * 15L / 100L)
    // authority ordering: a (fed by s's full mass + c) outranks b
    assert(ref("a") > ref("b"))
    spark.catalog.clearCache()
  }

  test("self-loops are dropped and parallel edges pre-summed") {
    val edges = Seq(("a", "a", 9L), ("a", "b", 1L), ("a", "b", 2L),
      ("b", "a", 1L)).toDF("src", "dst", "wt")
    val r = LinkGraph.pageRank(edges, iters = 2).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    // with the self-loop dropped, a→b carries a's WHOLE mass (deg 3,
    // wt 3) — identical to a single a→b edge of any weight
    val single = LinkGraph.pageRank(
      Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "wt"),
      iters = 2).collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === single)
    spark.catalog.clearCache()
  }
}
