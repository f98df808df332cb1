package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FlowCyto

class RobustStatsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("trimmed mean and MAD match hand-computed values") {
    // group a: 1..10 → q10=1.9, q90=9.1, band=[2..9] mean 5.5;
    //          med=5.5, |x-med| = .5,.5,1.5,…,4.5 → MAD 2.5
    // group b: 1..5 + outlier 1000 → outlier trimmed out
    val df = ((1 to 10).map(v => ("a", v.toDouble)) ++
      ((1 to 5).map(v => ("b", v.toDouble)) :+ ("b", 1000.0)))
      .toDF("g", "v")
    val got = FlowCyto.robustStats(df, col("v"), Seq("g"), 0.1, 0.9)
      .orderBy("g").collect()
    assert(got(0).getAs[Long]("n") == 10L)
    assert(got(0).getAs[Double]("trimmed_mean") == 5.5)
    assert(got(0).getAs[Double]("mad") == 2.5)
    // b: q10 of (1,2,3,4,5,1000) = 1.5, q90 = 502.5 → band {2,3,4,5}
    // → trimmed mean 3.5 (outlier excluded); med = 3.5,
    // |x-med| = 2.5,1.5,.5,.5,1.5,996.5 → MAD 1.5
    assert(got(1).getAs[Double]("trimmed_mean") == 3.5)
    assert(got(1).getAs[Double]("mad") == 1.5)
  }

  test("equi-depth bins hold ~n/k mass each") {
    import SharedSpark.sfDir
    val li = Graft.table(spark, sfDir, "lineitem")
    val n = li.count().toDouble
    val bins = FlowCyto.equiDepthHistogram(li, col("l_extendedprice"), k = 10)
      .collect()
    assert(bins.length == 10)
    assert(bins.map(_.getAs[Long]("n")).sum == n.toLong)
    bins.foreach { b =>
      val share = b.getAs[Long]("n") / n
      assert(math.abs(share - 0.1) < 0.03, s"bin $b share $share")
    }
    // bins tile the range: each bin's hi ≤ next bin's lo
    bins.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
      case _ =>
    }
  }

  test("f12 query is sane on the real table") {
    import SharedSpark.sfDir
    val r = SparkEntry.queries("f12_robust_stats")(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Double]("mad") >= 0.0)
      assert(row.getAs[Double]("trimmed_mean") > 0.0)
    }
  }
}
