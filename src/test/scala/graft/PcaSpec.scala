package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pca

class PcaSpec extends AnyFunSuite {
  import SharedSpark.{sfDir, spark}
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("recovers a known principal direction in 3-d") {
    // points spread along (1,1,0)/√2 with small orthogonal noise
    val rows = (0 until 2000).map { i =>
      val t = (i % 200) - 100.0
      val noise = ((i * 2654435761L) % 19 - 9) / 30.0
      Array((t + noise).toFloat, (t - noise).toFloat, (noise / 2).toFloat)
    }
    val df = rows.toDF("embedding").repartition(8)
    val m = Pca.fit(df, col("embedding"), d = 3, k = 2)
    val expect = Array(1.0 / math.sqrt(2), 1.0 / math.sqrt(2), 0.0)
    assert(math.abs(dot(m.components(0), expect)) > 0.999,
      s"pc1=${m.components(0).mkString(",")}")
    // eigenvalues sorted descending, all non-negative (covariance PSD)
    assert(m.eigenvalues(0) >= m.eigenvalues(1) && m.eigenvalues(1) >= -1e-9)
  }

  test("components are orthonormal") {
    val e = Graft.table(spark, sfDir, "embeddings")
    val d = e.select(size(col("embedding"))).head().getInt(0)
    val m = Pca.fit(e, col("embedding"), d, k = 3)
    for (i <- 0 until 3; j <- 0 until 3) {
      val g = dot(m.components(i), m.components(j))
      if (i == j) assert(math.abs(g - 1.0) < 1e-9) else assert(math.abs(g) < 1e-9)
    }
  }

  test("projection equals the manual centered dot product") {
    val e = Graft.table(spark, sfDir, "embeddings")
    val d = e.select(size(col("embedding"))).head().getInt(0)
    val m = Pca.fit(e, col("embedding"), d, k = 2)
    val sample = Pca.project(e, col("embedding"), m)
      .select(col("vec_id"), col("embedding"), col("pc1"), col("pc2"))
      .orderBy("vec_id").limit(20).collect()
    sample.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val centered = v.zip(m.mean).map { case (x, mu) => x - mu }
      assert(math.abs(r.getAs[Double]("pc1") - dot(centered, m.components(0))) < 1e-9)
      assert(math.abs(r.getAs[Double]("pc2") - dot(centered, m.components(1))) < 1e-9)
    }
  }

  test("projected variance matches the eigenvalues") {
    val e = Graft.table(spark, sfDir, "embeddings")
    val d = e.select(size(col("embedding"))).head().getInt(0)
    val m = Pca.fit(e, col("embedding"), d, k = 2)
    val vars = Pca.project(e, col("embedding"), m)
      .agg(var_pop(col("pc1")), var_pop(col("pc2"))).head()
    assert(math.abs(vars.getDouble(0) - m.eigenvalues(0)) / m.eigenvalues(0) < 1e-6)
    assert(math.abs(vars.getDouble(1) - m.eigenvalues(1)) / m.eigenvalues(1) < 1e-6)
  }

  test("s06 query emits one row per vector") {
    val out = SparkEntry.queries("s06_pca_project")(spark, sfDir)
    assert(out.count() == Graft.table(spark, sfDir, "embeddings").count())
  }
}
