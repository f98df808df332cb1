package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  import SharedSpark.spark

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.minLabel(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two components each get their min id") {
    val got = cc(Seq((2L, 1L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a chain deeper than one round converges to the global min") {
    val chain = (1L until 9L).map(i => (i, i + 1))
    assert(cc(chain).values.toSet == Set(1L))
  }

  test("cluster assignment equals the transitive closure of the pair relation") {
    // ring + chord + isolated pair; every node reaches node 1
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L), (7L, 8L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("pointer jumping converges a 200-node chain within the default 20 rounds") {
    // pure neighbour hops would need ~200 rounds (one per diameter
    // step); the prev-map shortcut compounds the reach roughly 2^t,
    // so the default maxIter=20 MUST fully converge — a partial
    // result would leave multiple distinct labels and fail here
    val chain = (0L until 199L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.size == 200)
    assert(got.values.toSet == Set(0L))
  }

  private def ccStar(edges: Seq[(Long, Long)], maxIter: Int = 30): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.alternatingStar(edges.toDF("a", "b"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("forced iterative path equals the union-find local finish") {
    // the local finish (localFinishEdges default) now serves small
    // graphs; the distributed pointer-jumping rounds are the 100 TB
    // path and must stay correct — force them with localFinishEdges=0
    // on the shapes above and on a seeded random graph
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val graphs = Seq(
      (0L until 199L).map(i => (i, i + 1)),                        // deep chain
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L), (7L, 8L)),
      Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter { case (a, b) => a != b })
    for (g <- graphs) {
      val df = g.toDF("a", "b")
      val local = ConnectedComponents.minLabel(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = ConnectedComponents.minLabel(df, localFinishEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == dist)
    }
  }

  test("alternatingStar matches minLabel on shallow mixed graphs") {
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L),
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L), (7L, 8L))
    assert(ccStar(edges) == cc(edges))
  }

  test("alternatingStar solves a 1000-node chain in O(log^2) alternations") {
    // minLabel would need ~1000 label-hop rounds here (one per
    // diameter step); the star alternation path-halves, so 15
    // alternations MUST fully converge — a partial result would leave
    // multiple clusters and fail the assertion
    val chain = (0L until 999L).map(i => (i, i + 1))
    val got = ccStar(chain, maxIter = 15)
    assert(got.size == 1000)
    assert(got.values.toSet == Set(0L))
  }

  test("alternatingStar matches minLabel on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    assert(ccStar(edges) == cc(edges))
  }
}
