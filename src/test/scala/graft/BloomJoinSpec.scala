package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BloomJoin

class BloomJoinSpec extends AnyFunSuite {
  import SharedSpark.{sfDir, spark}

  test("bloom-pruned join equals the plain join (row multiset)") {
    val ord = Graft.table(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_totalprice")
    val li = Graft.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
    val bloom = BloomJoin.prunedJoin(li, ord, "l_orderkey", "o_orderkey",
      expectedItems = 10000L)
      .select(plain.columns.map(col): _*)
    assert(bloom.count() == plain.count())
    assert(bloom.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(bloom).count() == 0)
  }

  test("prune keeps every matching row and actually prunes") {
    val ord = Graft.table(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val li = Graft.table(spark, sfDir, "lineitem")
    val pruned = BloomJoin.prune(li, ord, "l_orderkey", "o_orderkey",
      expectedItems = 10000L)
    val trueMatches = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(li.columns.map(col): _*)
    // no false negatives: every true match survives the probe
    assert(trueMatches.exceptAll(pruned).count() == 0)
    // the probe is selective: far fewer rows than the full fact side
    // (1-URGENT is ~20% of orders; 1% fpp adds ~1% noise on top)
    val (nAll, nPruned) = (li.count(), pruned.count())
    assert(nPruned < nAll * 3 / 4, s"pruned $nPruned of $nAll — no pruning?")
    assert(nPruned >= trueMatches.count())
  }

  test("empty build side yields an empty result") {
    val ord = Graft.table(spark, sfDir, "orders")
      .filter(lit(false)).select("o_orderkey")
    val li = Graft.table(spark, sfDir, "lineitem")
    assert(BloomJoin.prune(li, ord, "l_orderkey", "o_orderkey", 100L).count() == 0)
    assert(BloomJoin.prunedJoin(li, ord, "l_orderkey", "o_orderkey", 100L).count() == 0)
  }

  test("bloom sizing follows -n ln p / ln^2 2 with a floor") {
    assert(BloomJoin.numBitsFor(0L, 0.01) == 64L)
    val bits = BloomJoin.numBitsFor(1000000L, 0.01)
    // ~9.59 bits/key at 1% fpp
    assert(bits > 9000000L && bits < 10000000L)
  }
}
