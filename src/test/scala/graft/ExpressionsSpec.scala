package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{LogicleMath, PointInPolygon, RollingHash, SimHash64}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

class ExpressionsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("asinh_scaled matches math.asinh (codegen path)") {
    val xs = Seq(-100.0, -1.0, 0.0, 0.5, 5.0, 1234.5)
    val got = xs.toDF("x")
      .select(GraftFunctions.asinh_scaled(col("x"), lit(5.0)).as("y"))
      .as[Double].collect()
    xs.zip(got).foreach { case (x, y) =>
      val expect = {
        val v = x / 5.0
        math.log(v + math.sqrt(v * v + 1.0))
      }
      assert(math.abs(y - expect) < 1e-12, s"x=$x")
    }
  }

  test("ngram_hashes equals the composable transform+shingles+xxhash64 form") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog the quick brown"),
      (2L, "one two"),                 // fewer tokens than n → one gram
      (3L, "single"),
      (4L, "a a a a a a")              // heavy dup grams
    ).toDF("id", "text")
    val toks = Dedup.tokens(col("text"))
    val fused = docs.select(col("id"),
      GraftFunctions.ngram_hashes(toks, 3).as("g")).orderBy("id").collect()
    val composed = docs.select(col("id"),
      sort_array(array_distinct(transform(Dedup.shingles(toks, 3),
        s => xxhash64(s)))).as("g")).orderBy("id").collect()
    fused.zip(composed).foreach { case (f, c) =>
      assert(f.getSeq[Long](1) == c.getSeq[Long](1), s"id=${f.getLong(0)}")
    }
    // dedupSort=false keeps one hash per gram occurrence, in order
    val raw = docs.filter(col("id") === 4L).select(
      GraftFunctions.ngram_hashes(toks, 3, dedupSort = false).as("g"))
      .head().getSeq[Long](0)
    assert(raw.length == 4 && raw.distinct.length == 1)
  }

  test("ngram_hashes works via SQL registration") {
    val r = spark.sql(
      "SELECT size(ngram_hashes(array('a','b','c','d'), 3)) AS n," +
      "       size(ngram_hashes(array('a','a','a','a'), 2, false)) AS m")
      .head()
    assert(r.getInt(0) == 2)   // 'a b c', 'b c d'
    assert(r.getInt(1) == 3)   // dup grams kept without dedup
  }

  test("asinh_scaled works via SQL registration") {
    val r = spark.sql("SELECT asinh_scaled(10.0, 5.0)").head().getDouble(0)
    assert(math.abs(r - math.log(2.0 + math.sqrt(5.0))) < 1e-12)
  }

  test("logicle inverts the biexponential") {
    val (t, m, w) = (100000.0, 4.5, 0.5)
    for (x <- Seq(0.5, 10.0, 500.0, 20000.0, 99000.0)) {
      val y = LogicleMath.transform(x, t, m, w)
      val back = LogicleMath.biex(y, t, m, w)
      assert(math.abs(back - x) / math.max(1.0, x) < 1e-6, s"x=$x y=$y back=$back")
    }
  }

  test("logicle is monotone") {
    val (t, m, w) = (100000.0, 4.5, 0.5)
    val xs = Seq(1.0, 10.0, 100.0, 1000.0, 10000.0)
    val ys = xs.map(LogicleMath.transform(_, t, m, w))
    assert(ys == ys.sorted)
  }

  test("fixed-point logicle_q6 tracks the float transform within the grid step") {
    import org.apache.spark.sql.graftx.LogicleFixedMath
    val (t, m, w) = (100000.0, 4.5, 0.5)
    val c = LogicleFixedMath.consts(t, m, w)
    // broad sweep incl. the clamp regions, the linearized negative
    // zone (biex(0) ~ -33, so small negatives map inside the range),
    // and the log zone
    val xs = (0 until 400).map(i => math.pow(10.0, -2.0 + i * 0.02)) ++
      Seq(0.0, 0.001, -1.0, -5.0, -30.0, 99999.0, 100000.0, 1e7)
    for (x <- xs) {
      val yF = LogicleMath.transform(x, t, m, w)
      val yQ = LogicleFixedMath.transform(x, c)
      assert(math.abs(yQ - yF) <= 2e-6, s"x=$x float=$yF q6=$yQ")
      // every output is an exact micro-grid point
      assert(yQ == math.rint(yQ * 1e6) / 1e6, s"off-grid: $yQ")
    }
    // clamps mirror the float convention (biex(0) ~ -33: only data
    // below that clamps to 0)
    assert(LogicleFixedMath.transform(-1000.0, c) == 0.0)
    assert(LogicleFixedMath.transform(1e9, c) == 4.5)
    // monotone on the grid
    val ys = Seq(1.0, 10.0, 100.0, 1000.0, 10000.0)
      .map(LogicleFixedMath.transform(_, c))
    assert(ys == ys.sorted)
  }

  test("rolling_hash codegen equals reference implementation") {
    val strs = Seq("", "a", "hello world", "ünïcödé ✓")
    val got = strs.toDF("s")
      .select(GraftFunctions.rolling_hash(col("s")).as("h"))
      .as[Long].collect()
    strs.zip(got).foreach { case (s, h) =>
      assert(h == RollingHash.hash(s.getBytes("UTF-8")), s"s=$s")
    }
  }

  test("point_in_polygon agrees with reference ray-cast on a grid") {
    val xs = Array(0.0, 10.0, 10.0, 0.0)
    val ys = Array(0.0, 0.0, 10.0, 10.0)
    val pts = for (x <- BigDecimal(-2.0) to 12.0 by 1.3; y <- BigDecimal(-2.0) to 12.0 by 1.7)
      yield (x.toDouble, y.toDouble)
    val got = pts.toDF("x", "y")
      .select(GraftFunctions.point_in_polygon(col("x"), col("y"), xs, ys).as("in"))
      .as[Boolean].collect()
    pts.zip(got).foreach { case ((x, y), in) =>
      assert(in == PointInPolygon.contains(xs, ys, x, y), s"($x,$y)")
      assert(in == (x > 0 && x < 10 && y > 0 && y < 10), s"($x,$y)")
    }
  }

  test("polygon gate bbox rule pushes range filters into the parquet scan") {
    val df = SparkEntry.queries("f09_gate_filter")(spark, SharedSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the diamond's bbox: l_quantity in [5.1, 45.7], l_discount in [0.001, 0.107]
    assert(plan.contains("GreaterThanOrEqual(l_quantity,5.1)"), plan.take(2000))
    // (PushedFilters list is truncated in toString; the discount bound
    // is asserted via the post-scan Filter condition)
    assert(plan.contains("<= 0.107)"), plan.take(2000))
    // and the rewrite must not change results: same rows as the
    // unoptimized conditional-count query (f05's n_gated totals)
    val gated = df.collect().map(_.getAs[Long]("n")).sum
    val viaStats = SparkEntry.queries("f05_poly_gate")(spark, SharedSpark.sfDir)
      .collect().map(_.getAs[Long]("n_gated")).sum
    assert(gated == viaStats)
  }

  test("bbox rule is conjunct-safe: a negated gate is not rewritten") {
    import org.apache.spark.sql.functions._
    val li = Graft.table(spark, SharedSpark.sfDir, "lineitem")
    val negated = li.filter(!GraftFunctions.point_in_polygon(
      col("l_quantity"), col("l_discount"),
      Array(5.1, 45.7, 25.3), Array(0.001, 0.053, 0.107)))
    val plan = negated.queryExecution.executedPlan.toString
    assert(!plan.contains("GreaterThanOrEqual(l_quantity,5.1)"))
    // NOT(gate) keeps everything outside the triangle too
    assert(negated.count() > 0)
  }

  test("cosine_sim matches manual double computation and handles edge cases") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(GraftFunctions.cosine_sim(col("a"), col("b")).as("c"))
      .as[Double].head()
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val expect = dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    assert(math.abs(got - expect) < 1e-12)
    // size mismatch and zero vector → null
    val nulls = Seq((Array(1.0f), Array(1.0f, 2.0f)), (Array(0.0f), Array(0.0f)))
      .toDF("a", "b")
      .select(GraftFunctions.cosine_sim(col("a"), col("b")).as("c"))
      .collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("minhash_signature codegen equals reference; similar sets share signature slots") {
    import org.apache.spark.sql.graftx.MinHashSignature
    val a = (1 to 30).map(i => s"tok$i")
    val b = a.updated(0, "other") // jaccard ≈ 29/31
    val rows = Seq(a, b).toDF("toks")
      .select(GraftFunctions.minhash_signature(col("toks"), 64).as("mh"))
      .as[Array[Long]].collect()
    val ref = MinHashSignature.signature(a.iterator.map(_.getBytes("UTF-8")), 64)
    assert(rows(0).toSeq == ref.toSeq)
    val agree = rows(0).zip(rows(1)).count { case (x, y) => x == y }
    // E[agree] = 64 * 29/31 ≈ 60
    assert(agree >= 48, s"agree=$agree")
  }

  test("simhash64: identical token arrays hash identically; perturbation moves few bits") {
    val base = (1 to 40).map(i => s"tok$i")
    val perturbed = base.updated(3, "other")
    val df = Seq(base, perturbed).toDF("toks")
      .select(GraftFunctions.simhash64(col("toks")).as("h"))
      .as[Long].collect()
    assert(df(0) == SimHash64.simhash(base.iterator.map(_.getBytes("UTF-8"))))
    val hamming = java.lang.Long.bitCount(df(0) ^ df(1))
    assert(hamming <= 16, s"hamming=$hamming")
  }
}
