package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Sessionize

import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  import SharedSpark.{sfDir, spark}
  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming tumbling-window agg equals the batch transform") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = Sessionize.tumblingAggStreaming(df)
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    try {
      val evs = Seq(
        (ts(5), "click", 1.0), (ts(20), "click", 2.0), (ts(61), "view", 5.0),
        (ts(62), "click", 3.0), (ts(130), "view", 1.5))
      input.addData(evs: _*)
      q.processAllAvailable()
      // advance the watermark far enough to close all windows
      input.addData((ts(600), "late", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("win_agg")
        .select("hour_start", "event_type", "n", "total")
      val batch = Sessionize.tumblingAgg(
        (evs :+ ((ts(600), "late", 0.0))).toDF("ts", "event_type", "value"))
      // append mode emits only closed windows; every emitted row must
      // match batch, and all pre-sentinel windows must have been emitted
      assert(streamed.except(batch).count() == 0)
      val closed = batch.filter(col("hour_start") < ts(180))
      assert(closed.except(streamed).count() == 0)
      assert(streamed.count() >= 3)
    } finally q.stop()
  }

  test("streaming sliding-window agg equals the batch transform") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = Sessionize.slidingAggStreaming(df)
      .writeStream.format("memory").queryName("slide_agg")
      .outputMode("append").start()
    try {
      val evs = Seq(
        (ts(2), "click", 1.0), (ts(7), "click", 2.0), (ts(12), "view", 5.0),
        (ts(21), "click", 3.0))
      input.addData(evs: _*)
      q.processAllAvailable()
      input.addData((ts(600), "late", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("slide_agg")
        .select("win_start_s", "event_type", "n", "total")
      val batch = Sessionize.slidingAgg(
        (evs :+ ((ts(600), "late", 0.0))).toDF("ts", "event_type", "value"))
      assert(streamed.except(batch).count() == 0)
      val closed = batch.filter(col("win_start_s") < 3600)
      assert(closed.except(streamed).count() == 0)
      // every event covered by two windows: 4 events → ≥ 5 distinct rows
      assert(streamed.count() >= 5)
    } finally q.stop()
  }

  test("streaming sessionization emits the same closed sessions as batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.Ev]
    val q = Sessionize.sessionsStreaming(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two sessions (gap 45 min); user 2: one session
      input.addData(
        Sessionize.Ev(1, ts(0), 1), Sessionize.Ev(1, ts(10), 2),
        Sessionize.Ev(1, ts(55), 3), Sessionize.Ev(1, ts(60), 4),
        Sessionize.Ev(2, ts(5), 5))
      q.processAllAvailable()
      // a much later event per user closes the open sessions
      input.addData(Sessionize.Ev(1, ts(600), 6), Sessionize.Ev(2, ts(600), 7))
      q.processAllAvailable()
      val streamed = spark.table("sessions")
        .select("user_id", "session_start", "n_events", "duration_s")
      val batch = Sessionize.sessionsBatch(
        Seq((1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(55), 3L), (1L, ts(60), 4L),
          (2L, ts(5), 5L), (1L, ts(600), 6L), (2L, ts(600), 7L))
          .toDF("user_id", "ts", "event_id"))
        .select("user_id", "session_start", "n_events", "duration_s")
        // batch sees the sentinel sessions as open singletons; the
        // stream hasn't closed them yet
        .filter(col("session_start") < ts(600))
      assert(streamed.except(batch).count() == 0)
      assert(batch.except(streamed).count() == 0)
      assert(streamed.count() == 3)
    } finally q.stop()
  }

  test("transformWithState sessionization twin matches flatMapGroupsWithState") {
    // Spark 4's arbitrary-state API (SPARK-46815) requires the
    // RocksDB state store provider; same inputs, same closed sessions
    // as the fMGWS twin above.
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Sessionize.Ev]
    val q = Sessionize.sessionsTws(input.toDS())
      .writeStream.format("memory").queryName("sessions_tws")
      .outputMode("append").start()
    try {
      input.addData(
        Sessionize.Ev(1, ts(0), 1), Sessionize.Ev(1, ts(10), 2),
        Sessionize.Ev(1, ts(55), 3), Sessionize.Ev(1, ts(60), 4),
        Sessionize.Ev(2, ts(5), 5))
      q.processAllAvailable()
      input.addData(Sessionize.Ev(1, ts(600), 6), Sessionize.Ev(2, ts(600), 7))
      q.processAllAvailable()
      val streamed = spark.table("sessions_tws")
        .select("user_id", "session_start", "n_events", "duration_s")
      // the executed plan must carry the new operator, not fMGWS
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) { q.explain() }
      assert(buf.toString.contains("TransformWithState"),
        s"expected TransformWithStateExec in:\n$buf")
      val batch = Sessionize.sessionsBatch(
        Seq((1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(55), 3L), (1L, ts(60), 4L),
          (2L, ts(5), 5L), (1L, ts(600), 6L), (2L, ts(600), 7L))
          .toDF("user_id", "ts", "event_id"))
        .select("user_id", "session_start", "n_events", "duration_s")
        .filter(col("session_start") < ts(600))
      assert(streamed.except(batch).count() == 0)
      assert(batch.except(streamed).count() == 0)
      assert(streamed.count() == 3)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming dedup drops duplicate ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("event_id", "ts", "value")
    val q = Sessionize.dedupStreaming(df)
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0), (1L, ts(2), 9.9))
      q.processAllAvailable()
      input.addData((2L, ts(3), 8.8), (3L, ts(4), 3.0))
      q.processAllAvailable()
      val got = spark.table("dedup").select("event_id").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming sliding-window top-k emits the batch twin's sealed windows") {
    import graft.streaming.TopK
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = TopK.slidingTopKStreaming(df, k = 2)
      .writeStream.format("memory").queryName("slide_topk")
      .outputMode("append").start()
    try {
      val evs = Seq(
        (ts(2), "click", 1.0), (ts(3), "click", 2.0), (ts(7), "view", 5.0),
        (ts(8), "view", 1.0), (ts(9), "view", 2.0), (ts(12), "scroll", 3.0))
      input.addData(evs: _*)
      q.processAllAvailable()
      // sentinel far in the future: watermark passes every window end
      input.addData((ts(600), "late", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("slide_topk")
      val batch = TopK.slidingTopK(
        evs.toDF("ts", "event_type", "value"), k = 2)
      // sealed windows (all of them — the sentinel's own windows carry
      // no pre-sentinel events) must agree exactly on key/count/rank
      val keys = Seq("win_start_s", "event_type", "n", "rnk")
      assert(streamed.select(keys.map(col): _*)
        .except(batch.select(keys.map(col): _*)).count() == 0)
      assert(batch.select(keys.map(col): _*)
        .except(streamed.select(keys.map(col): _*)).count() == 0)
      // totals agree to rounding dust
      val joined = streamed.as("s")
        .join(batch.as("b"), Seq("win_start_s", "event_type"))
        .filter(abs(col("s.total") - col("b.total")) > 0.011)
      assert(joined.count() == 0)
      assert(streamed.count() >= 4)
    } finally q.stop()
  }

  test("streaming z-score monitor: static stats prune a live stream") {
    // the streaming twin of q39: per-type μ/σ computed batch-side
    // (dim-sized, broadcast into the stream), 3σ filter on the stream
    implicit val sqlCtx = spark.sqlContext
    val stats = Seq(("click", 10.0, 2.0), ("view", 100.0, 5.0))
      .toDF("event_type", "m", "sd")
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = df.join(org.apache.spark.sql.functions.broadcast(stats), "event_type")
      .filter(abs(col("value") - col("m")) > col("sd") * 3.0)
      .select("event_type", "value")
      .writeStream.format("memory").queryName("zmon")
      .outputMode("append").start()
    try {
      input.addData(
        (ts(1), "click", 10.5),   // inlier
        (ts(2), "click", 30.0),   // outlier (z = 10)
        (ts(3), "view", 99.0),    // inlier
        (ts(4), "view", 60.0),    // outlier (z = -8)
        (ts(5), "error", 1e9))    // unknown type → dropped by the join
      q.processAllAvailable()
      val got = spark.table("zmon").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(got == Set(("click", 30.0), ("view", 60.0)))
    } finally q.stop()
  }

  test("st01/st02 batch queries run on the real events table") {
    val w = SparkEntry.queries("st01_window_agg")(spark, sfDir)
    assert(w.count() > 0)
    val s = SparkEntry.queries("st02_sessions")(spark, sfDir)
    assert(s.count() > 0)
    // sessions never overlap: next session starts > 30 min after the
    // previous one's last event
    val bad = s.withColumn("prev_end",
        lag(col("session_start_us") + col("duration_s") * 1000000L, 1)
          .over(org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("session_idx")))
      .filter(col("prev_end").isNotNull &&
        col("session_start_us") - col("prev_end") <= Sessionize.GapMicros)
      .count()
    assert(bad == 0)
  }
}
