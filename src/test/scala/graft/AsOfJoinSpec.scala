package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin
import graft.sources.TidyIO

import java.sql.Timestamp

class AsOfJoinSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private lazy val quotes = Seq(
    (1L, ts(0), 100.0), (1L, ts(10), 101.0), (1L, ts(20), 102.0),
    (2L, ts(5), 50.0)).toDF("key", "ts", "px")
  private lazy val trades = Seq(
    (1L, ts(5), "t1"), (1L, ts(10), "t2"), (1L, ts(25), "t3"),
    (2L, ts(0), "t4"), (3L, ts(1), "t5")).toDF("key", "ts", "trade")

  test("backward as-of picks latest quote at or before each trade") {
    val got = AsOfJoin.asof(trades, quotes, "key", "ts", Seq("px"))
      .select("trade", "asof_px").as[(String, Option[Double])].collect().toMap
    assert(got("t1").contains(100.0)) // ts 5 → quote at 0
    assert(got("t2").contains(101.0)) // tie at 10 → quote visible
    assert(got("t3").contains(102.0)) // ts 25 → quote at 20
    assert(got("t4").isEmpty)         // first quote for key 2 is later
    assert(got("t5").isEmpty)         // no quotes for key 3
  }

  test("forward as-of picks earliest quote at or after each trade") {
    val got = AsOfJoin.asof(trades, quotes, "key", "ts", Seq("px"), forward = true)
      .select("trade", "asof_px").as[(String, Option[Double])].collect().toMap
    assert(got("t1").contains(101.0))
    assert(got("t2").contains(101.0)) // tie counts
    assert(got("t3").isEmpty)         // nothing after 25
    assert(got("t4").contains(50.0))
  }

  test("all left rows survive (left-join semantics)") {
    val n = AsOfJoin.asof(trades, quotes, "key", "ts", Seq("px")).count()
    assert(n == trades.count())
  }

  test("tidy CSV round-trip preserves values") {
    val dir = java.nio.file.Files.createTempDirectory("tidy").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
    TidyIO.writeCsv(df, s"$dir/csv")
    val back = TidyIO.readCsv(spark, s"$dir/csv", Some("id BIGINT, name STRING, v DOUBLE"))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("jsonl round-trip preserves values; corrupt lines are quarantined") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val df = Seq((1L, "hello world", "en"), (2L, "bonjour", "fr"))
      .toDF("doc_id", "text", "lang")
    TidyIO.writeJsonl(df, s"$dir/docs")
    val ddl = "doc_id BIGINT, text STRING, lang STRING"
    val back = TidyIO.readJsonl(spark, s"$dir/docs", Some(ddl))
    assert(back.select("doc_id", "text", "lang").orderBy("doc_id")
      .collect().toSeq == df.orderBy("doc_id").collect().toSeq)
    // a malformed line lands in _corrupt_record, not in an exception
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/docs/zz_bad.json"), "{not json\n")
    // Spark disallows filtering the corrupt column straight off the
    // raw scan; materialize the parse first (the documented pattern).
    val withBad = TidyIO.readJsonl(spark, s"$dir/docs", Some(ddl)).cache()
    try {
      assert(withBad.filter(col("_corrupt_record").isNotNull).count() == 1)
      assert(withBad.filter(col("doc_id").isNotNull).count() == 2)
    } finally withBad.unpersist()
  }

  test("orc round-trip preserves values and pushes filters") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "name", "v")
    TidyIO.writeOrc(df, s"$dir/orc")
    val back = TidyIO.readOrc(spark, s"$dir/orc")
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    // filter reaches the ORC scan (PushedFilters in the plan text)
    val plan = back.filter(col("id") > 1L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,1)"), plan)
  }

  test("clustered parquet write produces partition dirs with sorted row groups") {
    val dir = java.nio.file.Files.createTempDirectory("clustered").toString
    val li = Graft.table(spark, SharedSpark.sfDir, "lineitem")
      .select("l_returnflag", "l_suppkey", "l_orderkey", "l_quantity")
    TidyIO.writeClustered(li, s"$dir/out", Seq("l_returnflag"), Seq("l_suppkey"))
    val dirs = new java.io.File(s"$dir/out").listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("l_returnflag=")) >= 2)
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == li.count())
  }
}
