package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions._

class ThetaSpec extends AnyFunSuite {
  import SharedSpark.{sfDir, spark}

  test("exact mode: estimates equal exact distinct counts (update+merge path)") {
    // 10k distinct < 2^14 nominal entries → sketch retains every hash;
    // repartition forces serialize/merge of partials
    val df = spark.range(30000).repartition(16)
      .select((col("id") % 10000).as("k"),
        (col("id") % 2 === 0).as("even"))
    val row = df.agg(
        theta_sketch(when(col("even"), col("k")), 14).as("sa"),
        theta_sketch(when(!col("even"), col("k")), 14).as("sb"))
      .select(
        theta_estimate(col("sa")).as("ea"),
        theta_estimate(col("sb")).as("eb"),
        theta_intersect_estimate(col("sa"), col("sb")).as("both"))
      .head()
    // k even ⇔ id even (10000 even ids → 5000 distinct even k, etc.)
    assert(row.getDouble(0) == 5000.0)
    assert(row.getDouble(1) == 5000.0)
    assert(row.getDouble(2) == 0.0)
  }

  test("estimation mode: relative error within sketch bounds") {
    // 200k distinct >> 2^12 → true estimation; RSE ~1/sqrt(4096)=1.6%
    val n = 200000
    val df = spark.range(n).repartition(32).select(col("id").as("k"))
    val est = df.agg(theta_sketch(col("k"), 12).as("s"))
      .select(theta_estimate(col("s"))).head().getDouble(0)
    assert(math.abs(est - n) / n < 0.08, s"est=$est")
  }

  test("intersection estimate tracks a known 50% overlap") {
    val df = spark.range(100000).repartition(8).select(col("id").as("k"))
    val row = df.agg(
        // A = [0, 100k), B = [50k, 150k) → |A∩B| = 50k
        theta_sketch(col("k"), 12).as("sa"),
        theta_sketch(col("k") + 50000L, 12).as("sb"))
      .select(theta_intersect_estimate(col("sa"), col("sb"))).head().getDouble(0)
    assert(math.abs(row - 50000) / 50000 < 0.15, s"overlap=$row")
  }

  test("theta and kll work through the SQL registry") {
    Graft.registerFunctions(spark)
    val est = spark.sql(
      "SELECT theta_estimate(theta_sketch(id)) FROM range(1000)")
      .head().getDouble(0)
    assert(est == 1000.0)
    val med = spark.sql(
      "SELECT kll_quantiles(CAST(id AS DOUBLE), 200, array(0.5D))[0] FROM range(10000)")
      .head().getDouble(0)
    assert(math.abs(med / 10000.0 - 0.5) < 0.025)
  }

  test("q36 matches exact distinct overlap on the real table") {
    val got = SparkEntry.queries("q36_theta_overlap")(spark, sfDir).head()
    val o = Graft.table(spark, sfDir, "orders")
    val exactUrgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    val exactBoth = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      .intersect(o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey"))
      .count()
    assert(got.getAs[Long]("n_urgent") == exactUrgent)
    assert(got.getAs[Long]("n_both") == exactBoth)
  }
}
