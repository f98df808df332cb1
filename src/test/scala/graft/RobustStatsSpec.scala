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

  test("ellipse gate matches a brute-force double Mahalanobis check") {
    // one group, a tilted cloud plus two far outliers — exact integer
    // inequality must agree with the double-precision d² computation
    val pts = (0 until 40).map(i => (i % 8).toLong * 10 + i / 8) // cloud
      .zipWithIndex.map { case (x, i) => ("s1", x, x * 2 + (i % 5).toLong) } ++
      Seq(("s1", 500L, -300L), ("s1", -400L, 900L))
    val df = pts.toDF("sample", "x", "y")
    val got = FlowCyto.ellipseGateStats(df, col("x"), col("y"),
      Seq("sample"), t2 = 6).collect()(0)
    // brute force in doubles
    val xs = pts.map(_._2.toDouble); val ys = pts.map(_._3.toDouble)
    val n = xs.size.toDouble
    val mx = xs.sum / n; val my = ys.sum / n
    val vxx = xs.map(v => (v - mx) * (v - mx)).sum / n
    val vyy = ys.map(v => (v - my) * (v - my)).sum / n
    val vxy = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum / n
    val det = vxx * vyy - vxy * vxy
    val nIn = xs.zip(ys).count { case (a, b) =>
      val dx = a - mx; val dy = b - my
      (vyy * dx * dx - 2 * vxy * dx * dy + vxx * dy * dy) / det <= 6.0
    }
    assert(got.getAs[Long]("n_events") == pts.size.toLong)
    assert(got.getAs[Long]("n_in") == nIn.toLong)
    assert(nIn < pts.size, "outliers must gate outside")
  }

  test("ellipse gate headroom guard: over-bound group fails loudly and named") {
    // n * spread > 2e9 with only 4 events: spread 1e9 → named error,
    // not a bare ANSI decimal overflow deep in codegen
    val wild = Seq(("w", 0L, 0L), ("w", 1000000000L, 7L),
      ("w", 3L, 999999999L), ("w", 5L, 5L)).toDF("sample", "x", "y")
    val e = intercept[Exception] {
      FlowCyto.ellipseGateStats(wild, col("x"), col("y"), Seq("sample"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("headroom exceeded")),
      s"expected the named guard, got: ${msgs(e).mkString(" | ")}")
    // just under the line with the same shape: gate runs fine
    val tame = Seq(("t", 0L, 0L), ("t", 400000000L, 7L),
      ("t", 3L, 399999999L), ("t", 5L, 5L)).toDF("sample", "x", "y")
    val ok = FlowCyto.ellipseGateStats(tame, col("x"), col("y"), Seq("sample"))
      .collect()(0)
    assert(ok.getAs[Long]("n_events") == 4L)
  }
}
