package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Distributed PCA over an embedding column (d ≲ a few hundred).
  *
  * Shape for 100 TB: ONE aggregate pass collects the sufficient
  * statistics — count, sum vector, Gram matrix — as O(d²) state with
  * map-side combine (VecStatsAgg), so the full table contributes to
  * the model through a single tree-reduced row of ~d²/2 doubles. The
  * d×d eigenproblem is then solved on the driver (cyclic Jacobi —
  * exact for symmetric matrices, microseconds at d=32), and the
  * projection runs as a codegen'd constant-plane dot product
  * (ProjectPlanes) — a narrow map, no shuffle, mean-centering folded
  * into per-component constant offsets.
  *
  * This is the covariance-method PCA (not iterative SVD): one pass +
  * one narrow map is the whole cost.
  */
object Pca {

  case class Model(mean: Array[Double], components: Array[Array[Double]],
                   eigenvalues: Array[Double]) {
    /** offsets[j] = dot(mean, comp_j): centering as a constant. */
    def offsets: Array[Double] = components.map(c =>
      c.zip(mean).map { case (a, b) => a * b }.sum)
  }

  /** Fit top-k principal components of `vec` (dimension d). */
  def fit(df: DataFrame, vec: Column, d: Int, k: Int): Model = {
    require(k >= 1 && k <= d)
    val stats = df.agg(GraftFunctions.vec_stats(vec, d).as("s"))
      .head().getSeq[Double](0).toArray
    val n = stats(0)
    require(n > 1, s"need at least 2 vectors, saw $n")
    val mean = Array.tabulate(d)(i => stats(1 + i) / n)
    // covariance from the lower-triangle Gram
    val cov = Array.ofDim[Double](d, d)
    var g = 1 + d
    for (i <- 0 until d; j <- 0 to i) {
      val c = stats(g) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
      g += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => -values(i)).take(k)
    // Sign convention: an eigenvector's sign is arbitrary — pin the
    // largest-|coordinate| entry positive so repeated fits project
    // with consistent orientation. (Not enough for a cross-engine
    // oracle: the Gram itself carries parallel-double-sum jitter and
    // DuckDB has no eigensolver to mirror — s06 stays rows-only.)
    val comps = order.map { i =>
      val c = Array.tabulate(d)(r => vectors(r)(i))
      val pivot = c.indices.maxBy(r => math.abs(c(r)))
      if (c(pivot) < 0) c.map(x => -x) else c
    }.toArray
    Model(mean, comps, order.map(values).toArray)
  }

  /** Append `asCols` projection columns (pc1..pck) of `vec` under the
    * fitted model. Narrow codegen map — safe at any scale.
    */
  def project(df: DataFrame, vec: Column, model: Model): DataFrame = {
    val proj = GraftFunctions.project_planes(vec, model.components, model.offsets)
    val withP = df.withColumn("__p", proj)
    model.components.indices
      .foldLeft(withP) { case (acc, i) =>
        acc.withColumn(s"pc${i + 1}", element_at(col("__p"), i + 1))
      }
      .drop("__p")
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix). O(d³) per sweep, ~8
    * sweeps to machine precision — driver-side cost only, d is small.
    */
  def jacobiEigen(m: Array[Array[Double]],
                  maxSweeps: Int = 32, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < maxSweeps && off > tol) {
      for (p <- 0 until d - 1; q <- p + 1 until d if math.abs(a(p)(q)) > tol / (d * d)) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        // t = sign(θ)/(|θ|+√(θ²+1)); θ=0 (equal diagonal) → 45° rotation
        val t = if (theta == 0.0) 1.0
          else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (i <- 0 until d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }
}
