package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import java.sql.Timestamp

/** Sessionization (SURVEY.md §2.4 S2): split each user's event stream
  * into sessions separated by ≥ `gap` of inactivity.
  *
  * Batch form: one window pass (lag → new-session flag → running sum)
  * partitioned by user — a single shuffle on user_id, linear in
  * events. Streaming form: flatMapGroupsWithState keeps (start, last,
  * count) per user and emits a session when the gap closes it — state
  * size is O(users), not O(events).
  */
object Sessionize {

  val GapMicros: Long = 30L * 60 * 1000000

  /** Batch sessionization. Gap compared in integer microseconds so
    * the DuckDB oracle (epoch_us) is bit-exact.
    */
  def sessionsBatch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > GapMicros, 1L).otherwise(0L))
      .withColumn("session_idx", sum("new_s").over(wrun))
      .groupBy("user_id", "session_idx")
      .agg(
        min("ts").as("session_start"),
        count(lit(1)).as("n_events"),
        ((max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))) / lit(1000000L))
          .cast("long").as("duration_s"))
  }

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, session_start: Timestamp, n_events: Long, duration_s: Long)

  /** Streaming sessionization twin. Emits a session once the gap (or
    * processing-time timeout) closes it; the in-flight session stays
    * in state. Events inside one trigger are sorted per group —
    * cross-trigger ordering relies on the upstream watermark having
    * dropped late data.
    */
  def sessionsStreaming(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          def micros(t: Timestamp): Long = t.getTime / 1000 * 1000000 + t.getNanos / 1000
          // inverse of micros(): keep sub-millisecond precision so the
          // emitted session_start is bit-identical to the batch twin's
          // min(ts) (new Timestamp(us / 1000) alone would truncate).
          def fromMicros(us: Long): Timestamp = {
            val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
            t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
            t
          }
          val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var open: Option[SessionState] = state.getOption.flatMap(_.headOption)
          val closed = scala.collection.mutable.ListBuffer.empty[Session]
          for (e <- sorted) {
            val us = micros(e.ts)
            open match {
              case Some(st) if us - st.last > GapMicros =>
                closed += Session(userId, fromMicros(st.start),
                  st.n, (st.last - st.start) / 1000000)
                open = Some(SessionState(us, us, 1))
              case Some(st) =>
                open = Some(st.copy(last = math.max(st.last, us), n = st.n + 1))
              case None =>
                open = Some(SessionState(us, us, 1))
            }
          }
          state.update(open.toList)
          closed.iterator
      }
  }

  /** The same sessionization on Spark 4's `transformWithState` — the
    * successor API to flatMapGroupsWithState (SPARK-46815): explicit
    * named state variables on a StatefulProcessor lifecycle instead of
    * one opaque GroupState value, with timers/TTL available when the
    * topology needs them. Requires the RocksDB state store provider.
    * Semantics here are identical to [[sessionsStreaming]] (same
    * in-trigger sort, same gap close, same open-session carry), so the
    * two twins must emit the same closed sessions — the spec pins it.
    */
  private class SessionProcessor
      extends StatefulProcessor[Long, Ev, Session] {
    @transient private var open: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionState]("open",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, evs: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[Session] = {
      def micros(t: Timestamp): Long = t.getTime / 1000 * 1000000 + t.getNanos / 1000
      def fromMicros(us: Long): Timestamp = {
        val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        t
      }
      val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var cur: Option[SessionState] =
        if (open.exists()) Some(open.get()) else None
      val closed = scala.collection.mutable.ListBuffer.empty[Session]
      for (e <- sorted) {
        val us = micros(e.ts)
        cur match {
          case Some(st) if us - st.last > GapMicros =>
            closed += Session(userId, fromMicros(st.start),
              st.n, (st.last - st.start) / 1000000)
            cur = Some(SessionState(us, us, 1))
          case Some(st) =>
            cur = Some(st.copy(last = math.max(st.last, us), n = st.n + 1))
          case None =>
            cur = Some(SessionState(us, us, 1))
        }
      }
      cur match {
        case Some(st) => open.update(st)
        case None => open.clear()
      }
      closed.iterator
    }
  }

  def sessionsTws(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** S1 — tumbling window aggregate; identical code path for batch
    * and streaming input (`window()` is supported on both).
    */
  def tumblingAgg(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("total"))

  /** S4 — sliding-window aggregate (window > slide ⇒ each event lands
    * in window/slide overlapping windows; Spark expands them before
    * the keyed aggregation, so it stays one linear shuffle). Window
    * start reported as epoch seconds: slide boundaries are whole
    * seconds, so nano-vs-micro precision can't leak into the key.
    */
  def slidingAgg(events: DataFrame, width: String = "10 minutes",
                 slide: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(unix_seconds(col("w.start")).as("win_start_s"),
        col("event_type"), col("n"), col("total"))

  /** S4 streaming form: watermark + append-mode sliding windows. */
  def slidingAggStreaming(events: DataFrame, width: String = "10 minutes",
                          slide: String = "5 minutes",
                          watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(unix_seconds(col("w.start")).as("win_start_s"),
        col("event_type"), col("n"), col("total"))

  /** S1 streaming form: watermark + append-mode windowed aggregate. */
  def tumblingAggStreaming(events: DataFrame, width: String = "1 hour",
                           watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("total"))

  /** S3 — streaming dedup inside the watermark horizon. */
  def dedupStreaming(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")
}
