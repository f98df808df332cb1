package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.operators.{Sampling, ZOrder}

class ZOrderSpec extends AnyFunSuite {
  import SharedSpark.{sfDir, spark}
  import spark.implicits._

  test("zorder2 interleaves bits (known values + reference impl)") {
    // bit i of x -> 2i, bit i of y -> 2i+1
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 0L), (12345L, 54321L))
      .toDF("x", "y")
      .select(GraftFunctions.zorder2(col("x"), col("y")).as("z"))
      .as[Long].collect()
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 32)
        z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      z
    }
    val expect = Seq(ref(0, 0), ref(1, 0), ref(0, 1), ref(3, 5), ref(65535, 0), ref(12345, 54321))
    assert(got.toSeq == expect)
    assert(expect(1) == 1L && expect(2) == 2L)
  }

  test("zorder2 works via SQL registration") {
    Graft.registerFunctions(spark)
    val z = spark.sql("SELECT zorder2(3L, 5L) AS z").as[Long].head()
    // x=011 -> even bits 0,2 (=5); y=101 -> odd bits 1,5 (=34)
    assert(z == 39L)
  }

  test("bits=32 zkey ordering matches the unsigned Morton order") {
    // y's bit 31 lands in z bit 63: without the sign flip, high-y rows
    // would sort BEFORE low-y rows under signed comparison
    val lo = (0L, 0L); val hi = (0L, 0x80000000L) // y bit 31 set
    val keys = Seq(lo, hi).toDF("x", "y")
      .select(ZOrder.zkey(col("x"), col("y"), bits = 32).as("z"))
      .as[Long].collect()
    assert(keys(0) < keys(1), s"expected lo < hi, got ${keys.toSeq}")
  }

  test("cluster yields non-overlapping z ranges across partitions") {
    val df = Graft.table(spark, sfDir, "lineitem")
    val clustered = ZOrder.cluster(df, col("l_partkey") % 65536,
      col("l_suppkey") % 65536, numPartitions = 8)
    val ranges = clustered
      .select(spark_partition_id().as("pid"), col("zkey"))
      .groupBy("pid").agg(min("zkey").as("lo"), max("zkey").as("hi"))
      .orderBy("lo")
      .collect()
    assert(clustered.count() == df.count())
    // range partitioning: each partition's [lo, hi] interval is disjoint
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
          s"overlap: $a vs $b")
      case _ =>
    }
  }

  test("hilbert2: bijective on the full grid; consecutive indexes are grid-adjacent") {
    import org.apache.spark.sql.graftx.Hilbert2
    val bits = 6
    val n = 1 << bits // 64×64 grid, exhaustive
    // bijection: every cell gets a distinct index in [0, n²)
    val cellOf = new Array[(Int, Int)](n * n)
    var dups = 0
    for (x <- 0 until n; y <- 0 until n) {
      val d = Hilbert2.index(x.toLong, y.toLong, bits).toInt
      assert(d >= 0 && d < n * n, s"index out of range: ($x,$y) -> $d")
      if (cellOf(d) != null) dups += 1
      cellOf(d) = (x, y)
    }
    assert(dups == 0, s"$dups duplicate indexes — not a bijection")
    // the DEFINING property Morton lacks: step d → d+1 moves exactly
    // one cell in exactly one axis — the curve never jumps
    for (d <- 1 until n * n) {
      val (x0, y0) = cellOf(d - 1)
      val (x1, y1) = cellOf(d)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"curve jump at d=$d: ($x0,$y0) -> ($x1,$y1)")
    }
    // Morton DOES jump on the same grid (the property is non-vacuous)
    var mortonJumps = 0
    val mCell = new Array[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n)
      mCell(org.apache.spark.sql.graftx.Zorder2
        .interleave(x.toLong, y.toLong).toInt) = (x, y)
    for (d <- 1 until n * n) {
      val (x0, y0) = mCell(d - 1); val (x1, y1) = mCell(d)
      if (math.abs(x1 - x0) + math.abs(y1 - y0) != 1) mortonJumps += 1
    }
    assert(mortonJumps > 0)
  }

  test("hilbert2: Column + SQL surfaces agree with the kernel; hkey masks") {
    import org.apache.spark.sql.graftx.Hilbert2
    Graft.registerFunctions(spark)
    val viaSql = spark.sql("SELECT hilbert2(3L, 5L, 8) AS h").as[Long].head()
    assert(viaSql == Hilbert2.index(3L, 5L, 8))
    val viaCol = Seq((12345L, 54321L)).toDF("x", "y")
      .select(GraftFunctions.hilbert2(col("x"), col("y"), 16).as("h"))
      .as[Long].head()
    assert(viaCol == Hilbert2.index(12345L, 54321L, 16))
    // hkey masks to the grid exactly like zkey
    val masked = Seq((0x1F003L, 0x2F005L)).toDF("x", "y")
      .select(ZOrder.hkey(col("x"), col("y"), bits = 12).as("h"))
      .as[Long].head()
    assert(masked == Hilbert2.index(0x1F003L & 0xFFF, 0x2F005L & 0xFFF, 12))
  }

  test("weighted sample priorities follow the Sequential Poisson formula") {
    val docs = Graft.table(spark, sfDir, "documents").select("doc_id", "n_chars")
    val got = Sampling.weightedSample(docs, "doc_id", "n_chars", m = 50).collect()
    assert(got.length == 50)
    val manual = docs
      .withColumn("h", GraftFunctions.fmix64(col("doc_id")))
      .collect()
      .map { r =>
        val u = (r.getAs[Long]("h") >>> 11).toDouble / 9007199254740992.0
        (r.getAs[Long]("doc_id"), u / r.getAs[Long]("n_chars").toDouble)
      }
      .sortBy { case (id, p) => (p, id) }
      .take(50)
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == manual.map(_._1).toSeq)
    got.foreach { r =>
      val p = manual.find(_._1 == r.getAs[Long]("doc_id")).get._2
      assert(r.getAs[Double]("priority") == p) // bit-exact
    }
    // weighting pulls in longer docs: sampled mean length > corpus mean
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    val sampleMean = got.map(_.getAs[Long]("n_chars").toDouble).sum / got.length
    assert(sampleMean > corpusMean)
  }
}
