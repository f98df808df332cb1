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

  test("union agg over stored sketches equals a fresh sketch of the union") {
    val df = spark.range(50000).repartition(8)
      .select((col("id") % 9000).as("k"), (col("id") % 7).as("g"))
    val per = df.groupBy("g").agg(theta_sketch(col("k"), 14).as("sk"))
    // qualified: Spark 4.1's own functions._ also exports a
    // theta_union_agg (different sketch wire format than ours)
    val viaRollup = per
      .agg(graft.functions.GraftFunctions.theta_union_agg(col("sk"), 14).as("all"))
      .select(theta_estimate(col("all"))).head().getDouble(0)
    // 9000 distinct < 2^14 → both paths exact
    assert(viaRollup == 9000.0)
  }

  test("freq_items: exact regime equals GROUP BY; tiny sketch still finds the heavy hitter") {
    import graft.functions.GraftFunctions.freq_items
    // skewed stream: item "hot" appears 5000 times, 200 cold items 10x each
    val df = spark.range(5000).select(lit("hot").as("w"))
      .union(spark.range(2000).select(concat(lit("cold"), (col("id") % 200)).as("w")))
      .repartition(8)
    // exact regime: capacity 1024 >> 201 distinct — counts are exact
    val exact = df.agg(freq_items(col("w"), 1 << 10, 3).as("t"))
      .select(explode(col("t"))).select("col.item", "col.est")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(exact.head == ("hot", 5000L))
    assert(exact.tail.forall(_._2 == 10L))
    // approximate regime: capacity 64 << 201 distinct — the guarantee
    // is est within n/maxMapSize of truth for the heavy hitter
    val approx = df.agg(freq_items(col("w"), 64, 1).as("t"))
      .select(explode(col("t"))).select("col.item", "col.est")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(approx.head._1 == "hot")
    assert(math.abs(approx.head._2 - 5000L) <= 7000 / 64 + 1)
    // SQL registry path
    Graft.registerFunctions(spark)
    df.createOrReplaceTempView("fi_words")
    val viaSql = spark.sql(
      "SELECT explode(freq_items(w, 1024, 1)) AS r FROM fi_words")
      .select("r.item").head().getString(0)
    assert(viaSql == "hot")
  }

  test("cpc_sketch: estimate within bounds, partition-invariant-enough, smaller at rest than theta") {
    import graft.functions.GraftFunctions
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val n = 20000
    val df = (1L to n).toDF("k")
    def est(d: org.apache.spark.sql.DataFrame): (Double, Int) = {
      val r = d.agg(GraftFunctions.cpc_sketch(col("k"), lgK = 11).as("sk"))
        .select(GraftFunctions.cpc_estimate(col("sk")).as("e"), length(col("sk")).as("b"))
        .head()
      (r.getDouble(0), r.getInt(1))
    }
    val (e1, bytes) = est(df)
    // lgK=11 RSE ~ 0.59/sqrt(2^11) ~ 1.3%; allow 4 sigma
    assert(math.abs(e1 - n) / n < 0.055, s"estimate $e1 for n=$n")
    // mergeability: a different partitioning merges through CpcUnion
    // to an estimate with the same error bound (CPC unions are not
    // bit-stable across merge orders — the ESTIMATE is the contract)
    val (e2, _) = est(df.repartition(13))
    assert(math.abs(e2 - n) / n < 0.055, s"merged estimate $e2")
    // the archival story: CPC stores materially smaller than theta at
    // comparable nominal size
    val thetaBytes = df.agg(GraftFunctions.theta_sketch(col("k"), lgK = 11).as("sk"))
      .select(length(col("sk"))).head().getInt(0)
    assert(bytes < thetaBytes,
      s"cpc $bytes B should undercut theta $thetaBytes B at rest")
    // serialization round trip via the estimate expression is what
    // eval returns — a second read of the same bytes agrees exactly
    val sk = df.agg(GraftFunctions.cpc_sketch(col("k"), 11).as("sk")).head().getAs[Array[Byte]](0)
    val again = org.apache.datasketches.cpc.CpcSketch
      .heapify(org.apache.datasketches.memory.Memory.wrap(sk)).getEstimate
    assert(math.abs(again - e1) < 1e-6 || math.abs(again - n).toDouble / n < 0.055)
  }

  test("ThetaBuf.compact is idempotent: double serialize keeps the sketch") {
    import org.apache.spark.sql.graftx.ThetaBuf
    import org.apache.datasketches.theta.UpdateSketch
    // update-only buffer (uni == null): the destructive fold used to
    // null upd and return an EMPTY sketch on the second call
    val upd = UpdateSketch.builder().setLogNominalEntries(12).build()
    (0 until 100).foreach(i => upd.update(i.toLong))
    val buf = new ThetaBuf(upd, null)
    val first = buf.compact(12).getEstimate
    val second = buf.compact(12).getEstimate
    assert(first == 100.0 && second == 100.0)
  }

  test("graft sketches interoperate with Spark 4.1's builtin sketch functions") {
    // same DataSketches compact wire format in both directions
    val df = spark.range(5000).repartition(4).select((col("id") % 1000).as("k"))
    // builtin agg → graft estimator
    val viaBuiltin = df.agg(expr("theta_sketch_agg(k)").as("sk"))
      .select(theta_estimate(col("sk"))).head().getDouble(0)
    assert(viaBuiltin == 1000.0)
    // graft agg → builtin estimator
    val viaGraft = df.agg(theta_sketch(col("k"), 14).as("sk"))
      .select(expr("theta_sketch_estimate(sk)")).head().getAs[Number](0).longValue()
    assert(viaGraft == 1000L)
    // KLL: graft's one-call quantile array vs the builtin two-step
    // chain — exact-retention regime (n < k) so both are bit-equal
    val small = spark.range(100).select(col("id").cast("double").as("v"))
    val g = small.agg(graft.functions.GraftFunctions
      .kll_quantiles(col("v"), 200, Seq(0.5)).as("q"))
      .head().getSeq[Double](0).head
    val b = small.agg(
      expr("kll_sketch_get_quantile_double(kll_sketch_agg_double(v, 200), 0.5)"))
      .head().getDouble(0)
    assert(g == b)
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
