package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.FlowCyto
import graft.operators.FlowCyto.GateNode

class GateTreeSpec extends AnyFunSuite {
  import SharedSpark.{spark, sfDir}

  private lazy val li = Graft.table(spark, sfDir, "lineitem")

  private val tree = Seq(
    GateNode("mid_qty",
      FlowCyto.rectGate(col("l_quantity"), col("l_discount"), 5.0, 45.0, 0.0, 0.10),
      Seq(
        GateNode("hi_price", col("l_extendedprice") >= 20000.0,
          Seq(GateNode("low_tax", col("l_tax") <= 0.04))),
        GateNode("lo_price", col("l_extendedprice") < 20000.0))))

  test("gate tree: node counts equal sequential filters of the parent population") {
    val out = FlowCyto.gateTree(li, tree, Seq("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val flags = li.select("l_returnflag").distinct().collect().map(_.getString(0))
    val gA = FlowCyto.rectGate(col("l_quantity"), col("l_discount"), 5.0, 45.0, 0.0, 0.10)
    for (f <- flags) {
      val base = li.filter(col("l_returnflag") === f)
      assert(out((f, "mid_qty")) == base.filter(gA).count())
      assert(out((f, "mid_qty/hi_price")) ==
        base.filter(gA && col("l_extendedprice") >= 20000.0).count())
      assert(out((f, "mid_qty/hi_price/low_tax")) ==
        base.filter(gA && col("l_extendedprice") >= 20000.0 && col("l_tax") <= 0.04).count())
    }
  }

  test("gate tree: children partition or nest within the parent; ppm bounded") {
    val rows = FlowCyto.gateTree(li, tree, Seq("l_returnflag")).collect()
    val byKey = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    rows.foreach { r =>
      val (n, nParent) = (r.getLong(3), r.getLong(4))
      assert(n <= nParent, s"${r.getString(1)}: child exceeds parent")
      val ppm = r.getLong(5)
      assert(ppm >= 0 && ppm <= 1000000)
    }
    // hi_price + lo_price is a partition of mid_qty (predicates are complementary)
    byKey.keys.map(_._1).toSeq.distinct.foreach { f =>
      assert(byKey((f, "mid_qty/hi_price")).getLong(3) +
        byKey((f, "mid_qty/lo_price")).getLong(3) == byKey((f, "mid_qty")).getLong(3))
    }
  }

  test("gate tree is a single aggregate pass (one Aggregate over the scan, no join)") {
    val plan = FlowCyto.gateTree(li, tree, Seq("l_returnflag"))
      .queryExecution.optimizedPlan.toString()
    assert(!plan.contains("Join"), "gate tree must not join")
  }
}
