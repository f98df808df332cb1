package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalAgg

/** Pins the incremental-MV state algebra: merge(partial(A),
  * partial(B)) == partial(A ∪ B) including null keys/measures and
  * empty sides, and merges associate (three-way == chained).
  */
class IncrementalAggSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val keys = Seq("k"); private val ms = Seq("v")

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("k").asc_nulls_first).collect().toSeq

  test("merge of split partials equals full partial (nulls included)") {
    val rows = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (1L, 20L), (2L, 5L), (2L, null), (null, 7L), (3L, -4L))
    val df = rows.toDF("k", "v")
    val (a, b) = (df.filter(coalesce($"v" > 6L, lit(false))),
      df.filter(!coalesce($"v" > 6L, lit(false))))
    val merged = IncrementalAgg.merge(
      Seq(IncrementalAgg.partial(a, keys, ms),
        IncrementalAgg.partial(b, keys, ms)), keys, ms)
    val full = IncrementalAgg.partial(df, keys, ms)
    assert(sorted(merged) == sorted(full))
    // spot-check the null-bearing group: cnt counts rows, cnt_v only
    // non-null measures, sums skip nulls — so the read-time derived
    // average sum_v/cnt_v equals SQL AVG(v) (divides by non-null
    // count), NOT sum_v/cnt (divides by row count).
    val g2 = merged.filter($"k" === 2L).collect().head
    assert(g2.getAs[Long]("cnt") == 2 && g2.getAs[Long]("cnt_v") == 1 &&
      g2.getAs[Long]("sum_v") == 5)
    val sqlAvg = df.filter($"k" === 2L).agg(avg($"v")).collect().head.getDouble(0)
    assert(g2.getAs[Long]("sum_v").toDouble / g2.getAs[Long]("cnt_v") == sqlAvg)
  }

  test("merges associate: three-way == chained two-way; empty side is identity") {
    val df = (1 to 40).map(i => (i.toLong % 5, i.toLong)).toDF("k", "v")
    val parts = Seq(
      IncrementalAgg.partial(df.filter($"v" <= 10), keys, ms),
      IncrementalAgg.partial(df.filter($"v" > 10 && $"v" <= 25), keys, ms),
      IncrementalAgg.partial(df.filter($"v" > 25), keys, ms))
    val threeWay = IncrementalAgg.merge(parts, keys, ms)
    val chained = IncrementalAgg.merge(
      Seq(IncrementalAgg.merge(parts.take(2), keys, ms), parts(2)), keys, ms)
    assert(sorted(threeWay) == sorted(chained))
    assert(sorted(threeWay) == sorted(IncrementalAgg.partial(df, keys, ms)))
    val withEmpty = IncrementalAgg.merge(
      Seq(threeWay, IncrementalAgg.partial(df.filter($"v" < 0), keys, ms)),
      keys, ms)
    assert(sorted(withEmpty) == sorted(threeWay))
  }
}
