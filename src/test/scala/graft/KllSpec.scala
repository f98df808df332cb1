package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

class KllSpec extends AnyFunSuite {
  import SharedSpark.{sfDir, spark}
  import spark.implicits._

  test("kll quantiles land within rank-error bounds of exact on uniform data") {
    // 100k values over many partitions: exercises update + serialize +
    // merge (partial aggregation) + final eval
    val n = 100000
    val df = spark.range(n).repartition(16)
      .select(col("id").cast("double").as("v"))
    val qs = df.agg(GraftFunctions.kll_quantiles(col("v"), 200,
        Seq(0.1, 0.25, 0.5, 0.75, 0.9)).as("qs"))
      .head().getSeq[Double](0)
    Seq(0.1, 0.25, 0.5, 0.75, 0.9).zip(qs).foreach { case (p, q) =>
      // normalized rank error at k=200 is ~1.65%; allow 2.5%
      val rank = q / n
      assert(math.abs(rank - p) < 0.025, s"p=$p got rank $rank (q=$q)")
    }
  }

  test("kll agrees with exact percentile on the real table per group") {
    val li = Graft.table(spark, sfDir, "lineitem")
    val joined = li.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        GraftFunctions.kll_quantiles(col("l_extendedprice"), 200, Seq(0.5)).as("qs"),
        percentile(col("l_extendedprice"), lit(0.5)).as("exact"))
      .withColumn("approx", element_at(col("qs"), 1))
      .collect()
    joined.foreach { r =>
      val (n, approx, exact) =
        (r.getAs[Long]("n"), r.getAs[Double]("approx"), r.getAs[Double]("exact"))
      // translate rank tolerance to a value check: the approx median's
      // true rank must be within 2.5% of 0.5
      val rank = li.filter(col("l_returnflag") === r.getAs[String]("l_returnflag") &&
        col("l_extendedprice") <= approx).count().toDouble / n
      assert(math.abs(rank - 0.5) < 0.025,
        s"flag=${r.getAs[String]("l_returnflag")} approx=$approx exact=$exact rank=$rank")
    }
  }

  test("empty group evaluates to null, null inputs are skipped") {
    val out = Seq[(Integer, java.lang.Double)]((1, 5.0), (1, null), (2, null))
      .toDF("g", "v")
      .groupBy("g").agg(GraftFunctions.kll_quantiles(col("v"), 8, Seq(0.5)).as("qs"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Double](1) == Seq(5.0))
    assert(out(1).isNullAt(1))
  }

  test("f11 query runs and tracks f06's exact quantiles") {
    val f11 = SparkEntry.queries("f11_kll_quantiles")(spark, sfDir).collect()
    val f06 = SparkEntry.queries("f06_channel_stats")(spark, sfDir).collect()
    assert(f11.nonEmpty && f11.length == f06.length)
  }
}
