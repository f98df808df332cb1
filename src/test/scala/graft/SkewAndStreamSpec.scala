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

  test("approx percentile lands within its accuracy bound of exact") {
    val li = Graft.table(spark, sfDir, "lineitem")
    val r = li.agg(
      percentile(col("l_extendedprice"), lit(0.5)).as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx")).head()
    val (e, a) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(a - e) / e < 0.01, s"approx=$a exact=$e")
  }
}
