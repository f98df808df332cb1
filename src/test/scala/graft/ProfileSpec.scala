package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profile

/** Pins the column profiler: null accounting on a null-bearing
  * corpus, and the approx (HLL) distinct twin — the corpus-scale
  * configuration — within 5% of the exact oracle form per column.
  */
class ProfileSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("nulls, distincts, and typed min/max on a null-bearing frame") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (2L, null), (null, "a"), (2L, "a"), (3L, null))
      .toDF("num", "s")
    val got = Profile.profile(df, Seq("num"), Seq("s"))
      .orderBy("col_name").collect()
    val num = got(0); val s = got(1)
    assert(num.getString(0) == "num" && s.getString(0) == "s")
    assert(num.getLong(1) == 5 && num.getLong(2) == 1) // rows, nulls
    assert(num.getLong(3) == 3)                        // distinct excl. null
    assert(num.getDouble(4) == 1.0 && num.getDouble(5) == 3.0)
    assert(num.isNullAt(6) && num.isNullAt(7))         // no string lane
    assert(s.getLong(2) == 2 && s.getLong(3) == 2)
    assert(s.getString(6) == "a" && s.getString(7) == "b")
    assert(s.isNullAt(4) && s.isNullAt(5))
  }

  test("approx-distinct twin (the corpus-scale config) within HLL error of exact per column") {
    val li = Graft.table(spark, SharedSpark.sfDir, "lineitem")
    val numCols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val strCols = Seq("l_returnflag", "l_linestatus")
    def byCol(exact: Boolean) =
      Profile.profile(li, numCols, strCols, exact = exact)
        .select("col_name", "n_distinct").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ex = byCol(exact = true)
    val ap = byCol(exact = false)
    // approx_count_distinct's default rsd is 5% (one sigma) — bound at
    // ~3 sigma so the pin is a real regression guard, not a coin flip
    ex.foreach { case (c, n) =>
      val a = ap(c)
      assert(math.abs(a - n) <= math.max(3L, (0.15 * n).toLong),
        s"$c: approx $a vs exact $n")
    }
  }
}
