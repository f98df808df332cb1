package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin

class SkewAndStreamSpec extends AnyFunSuite {
  import SharedSpark.{sfDir, spark}
  import spark.implicits._

  test("salted join equals plain join (row multiset)") {
    val li = Graft.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val ord = Graft.table(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(ord, Seq("l_orderkey"))
    val salted = SkewJoin.saltedInnerJoin(li, ord, "l_orderkey", salts = 4)
      .select(plain.columns.map(col): _*)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("AQE splits a skewed join partition at runtime (the no-salt skew path)") {
    // one hot key carrying ~90% of rows; thresholds lowered so the
    // skew detector fires at test scale. AQE skew-join is the FIRST
    // lever at 100 TB (no plan rewrite, no salting); SkewJoin.salted
    // remains for the cases AQE can't split (e.g. aggregations after
    // the join keyed on the hot key).
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = spark.range(200000)
        .select(when(col("id") % 10 === 0, col("id") % 1000).otherwise(7L).as("k"),
          col("id").as("v"))
      val right = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // materialize THROUGH this DataFrame's own QueryExecution —
      // count() would plan a separate query and leave this one's
      // AdaptiveSparkPlan unexecuted (isFinalPlan=false, no skew info)
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew split absent in:\n$plan")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("keySkew surfaces the heavy key with sane shares") {
    import graft.operators.Diagnostics
    val skewed = spark.range(1000).selectExpr("CASE WHEN id < 600 THEN 7 ELSE id END AS k")
    val prof = Diagnostics.keySkew(skewed, col("k"), topN = 3).collect()
    assert(prof.head.getAs[Long]("key") == 7L)
    assert(prof.head.getAs[Long]("n") == 600L)
    assert(math.abs(prof.head.getAs[Double]("share") - 0.6) < 1e-6)
    assert(prof.head.getAs[Double]("skew_vs_uniform") > 100)
  }

  test("partitionBalance accounts for every row") {
    import graft.operators.Diagnostics
    val df = spark.range(10000).repartition(8)
    val bal = Diagnostics.partitionBalance(df.toDF()).collect()
    assert(bal.map(_.getAs[Long]("rows")).sum == 10000L)
    assert(bal.length == 8)
  }

  test("stream-static dim join enriches a stream") {
    implicit val sqlCtx = spark.sqlContext
    val nation = Graft.table(spark, sfDir, "nation").select("n_nationkey", "n_name")
    val input = MemoryStream[Long]
    val joined = input.toDF().toDF("n_nationkey")
      .join(nation, Seq("n_nationkey"))
    val q = joined.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData(0L, 1L, 0L)
      q.processAllAvailable()
      val got = spark.table("enriched").select("n_nationkey", "n_name").collect()
      assert(got.length == 3)
      assert(got.forall(_.getString(1).nonEmpty))
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks to purchases within the window") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("user_id", "c_ts").withWatermark("c_ts", "1 hour")
    val p = purchases.toDF().toDF("p_user", "p_ts").withWatermark("p_ts", "1 hour")
    // purchase joins clicks in the preceding 10 minutes
    val joined = c.join(p,
      expr("user_id = p_user AND c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 10 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0)), (1L, ts(8)), (2L, ts(5)))
      purchases.addData((1L, ts(9)), (2L, ts(30)))
      q.processAllAvailable()
      // advance both watermarks so results finalize
      clicks.addData((9L, ts(120))); purchases.addData((9L, ts(121)))
      q.processAllAvailable()
      val got = spark.table("ssj").select("user_id", "c_ts", "p_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString)).toSet
      // user 1: both clicks (0 and 8 min) within 10 min of purchase at 9
      assert(got.exists(t => t._1 == 1L && t._2.contains("00:00:00")))
      assert(got.exists(t => t._1 == 1L && t._2.contains("00:08:00")))
      // user 2's click at minute 5 is outside [20, 30] → no match
      assert(!got.exists(_._1 == 2L))
    } finally q.stop()
  }

  test("approx percentile lands within its accuracy bound of exact") {
    val li = Graft.table(spark, sfDir, "lineitem")
    val r = li.agg(
      percentile(col("l_extendedprice"), lit(0.5)).as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx")).head()
    val (e, a) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(a - e) / e < 0.01, s"approx=$a exact=$e")
  }
}
