package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ExactQuantiles

/** Pins the sort-free bracketed exact selection against the ranked-
  * window reference form: identical exact order statistics on real
  * data, heavy-tie corpora, and tiny groups — and deterministic
  * across runs despite the randomized KLL bracket proposal.
  */
class ExactQuantilesSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val ranks = Seq(
    ("median_v", 0.5,
      (n: org.apache.spark.sql.Column) =>
        floor((n + lit(1L)).cast("double") / 2.0).cast("long")),
    ("p90_v", 0.9,
      (n: org.apache.spark.sql.Column) =>
        floor((n * lit(9L) + lit(9L)).cast("double") / 10.0).cast("long")))

  /** The original ranked-window form (the oracle contract). */
  private def windowed(df: org.apache.spark.sql.DataFrame, keys: Seq[String]) = {
    val wp = Window.partitionBy(keys.map(col): _*)
    df.withColumn("rn", row_number().over(wp.orderBy("v")))
      .withColumn("n", count(lit(1)).over(wp))
      .filter(col("rn") === expr("(n + 1) div 2") ||
        col("rn") === expr("(9 * n + 9) div 10"))
      .groupBy(keys.map(col): _*)
      .agg(max("n").as("n"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("v"))).as("median_v"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("v"))).as("p90_v"))
  }

  private def collectMap(df: org.apache.spark.sql.DataFrame, keys: Seq[String]) =
    df.collect().map { r =>
      keys.map(k => r.getAs[Any](k)).mkString("|") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("median_v"), r.getAs[Long]("p90_v")))
    }.toMap

  test("bracketed selection equals the ranked window on lineitem") {
    val m = Graft.table(spark, SharedSpark.sfDir, "lineitem").selectExpr(
      "l_returnflag", "l_linestatus",
      """stack(2,
        |  'price_cents', CAST(round(l_extendedprice * 100) AS BIGINT),
        |  'quantity',    CAST(l_quantity AS BIGINT)) AS (measure, v)""".stripMargin)
    val keys = Seq("l_returnflag", "l_linestatus", "measure")
    val got = collectMap(
      ExactQuantiles.groupedExactSelect(m, keys, "v", ranks), keys)
    val ref = collectMap(windowed(m, keys), keys)
    assert(got == ref)
    // deterministic despite the randomized bracket proposal
    assert(collectMap(
      ExactQuantiles.groupedExactSelect(m, keys, "v", ranks), keys) == got)
  }

  test("heavy ties, tiny groups, constant groups — still exact") {
    val rows =
      // one huge heavily-tied group: values from a 5-element domain
      (1 to 20000).map(i => ("tied", (i % 5).toLong)) ++
        // tiny groups that exercise the collect-everything path
        Seq(("one", 7L), ("two", 1L), ("two", 9L),
          ("three", 5L), ("three", 3L), ("three", 8L)) ++
        // constant group: every rank lands on the same value
        (1 to 500).map(_ => ("const", 42L))
    val df = rows.toDF("g", "v")
    val keys = Seq("g")
    val got = collectMap(
      ExactQuantiles.groupedExactSelect(df, keys, "v", ranks), keys)
    val ref = collectMap(windowed(df, keys), keys)
    assert(got == ref)
    assert(got("const") == ((500L, 42L, 42L)))
    assert(got("one") == ((1L, 7L, 7L)))
  }

  test("fractional value column selects exactly (double-typed accumulator)") {
    // l_discount is a genuine DOUBLE column with heavy ties (11 distinct
    // values) — the case the long-typed accumulator zero used to fail
    // at analysis time with DATATYPE_MISMATCH.
    val m = Graft.table(spark, SharedSpark.sfDir, "lineitem")
      .selectExpr("l_returnflag AS g", "l_discount AS v")
    val keys = Seq("g")
    val got = ExactQuantiles.groupedExactSelect(m, keys, "v", ranks)
      .collect().map { r =>
        r.getAs[String]("g") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("median_v"), r.getAs[Double]("p90_v")))
      }.toMap
    val ref = windowed(m, keys).collect().map { r =>
      r.getAs[String]("g") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("median_v"), r.getAs[Double]("p90_v")))
    }.toMap
    assert(got == ref)
  }

  test("interpolated form matches a scalar R-7 reference (ties, tiny groups, doubles)") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 2000).map { i =>
      (s"g${i % 7}", rnd.nextInt(40).toLong) // heavy ties
    } ++ Seq(("solo", 5L)) // n = 1: h = 0, lo = hi = the single value
    val df = rows.toDF("k", "v")
    val qs = Seq(("p25", 0.25), ("p50", 0.5), ("p90", 0.9))
    val got = ExactQuantiles.groupedInterpolated(df, Seq("k"), "v", qs)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val ref = rows.groupBy(_._1).map { case (k, vs) =>
      val sorted = vs.map(_._2).sorted.toIndexedSeq
      val n = sorted.length
      def r7(p: Double): Double = {
        val h = (n - 1).toDouble * p
        val lo = sorted(math.floor(h).toInt).toDouble
        val hi = sorted(math.min(math.floor(h).toInt + 1, n - 1)).toDouble
        lo + (hi - lo) * (h - math.floor(h))
      }
      k -> ((r7(0.25), r7(0.5), r7(0.9)))
    }
    assert(got == ref)
    // fractional value column interpolates exactly too
    val dd = Seq(("a", 1.5), ("a", 2.5), ("a", 10.0)).toDF("k", "v")
    val g = ExactQuantiles.groupedInterpolated(dd, Seq("k"), "v", Seq(("p50", 0.5)))
      .collect().head
    assert(g.getDouble(2) == 2.5)
  }

  test("plan is sort-free on the data path: no Window, no global sort of rows") {
    val df = (1 to 1000).map(i => ("g" + (i % 3), i.toLong)).toDF("g", "v")
    val plan = ExactQuantiles.groupedExactSelect(df, Seq("g"), "v", ranks)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window:\n$plan")
    // the only Sorts allowed are aggregate-internal (none expected on
    // this shape — SortAggregate would betray a fallback)
    assert(!plan.contains("SortAggregate"), s"unexpected SortAggregate:\n$plan")
  }
}
