package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** S5 — sliding-window top-k: for every sliding window, the k most
  * frequent event types (count-desc, type-asc tiebreak).
  *
  * Batch form: sliding-window keyed aggregate (one linear shuffle —
  * Spark expands each event into window/slide windows before the
  * hash agg) + a window-function rank PARTITIONED BY the window key.
  * No global window: each sliding window ranks its own handful of
  * event types, so the rank stage is as parallel as the window count.
  *
  * Streaming form: append-mode rank-per-window isn't expressible as a
  * built-in windowed agg (rank needs the window CLOSED), so it's a
  * flatMapGroupsWithState keyed by window start: state is the per-type
  * count/sum map (O(types) per open window, bounded by watermark),
  * and the top-k emits exactly once when the event-time timeout fires
  * — i.e. when the watermark passes the window end. This is the
  * standard Spark shape for "emit a digest when the window seals".
  */
object TopK {

  /** Batch twin of the streaming top-k (what the DuckDB oracle checks).
    * Output: win_start_s, event_type, n, total, rnk (1-based, long).
    */
  def slidingTopK(events: DataFrame, k: Int = 2,
                  width: String = "10 minutes",
                  slide: String = "5 minutes"): DataFrame = {
    val w = Window.partitionBy("win_start_s")
      .orderBy(desc("n"), col("event_type"))
    Sessionize.slidingAgg(events, width, slide)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  case class WinEv(win_start_s: Long, event_type: String, value: Double, ts: Timestamp)
  case class TypeAgg(n: Long, total: Double)
  case class TopRow(win_start_s: Long, event_type: String, n: Long, total: Double, rnk: Long)

  /** Streaming top-k over sliding windows of `events(ts, event_type,
    * value)`. Each event is expanded to its window/slide covering
    * windows map-side (a narrow flatMap — the same expansion the
    * built-in window() performs), then state aggregates per window and
    * the event-time timeout (off the watermark) seals it.
    */
  def slidingTopKStreaming(events: DataFrame, k: Int = 2,
                           widthSec: Long = 600L, slideSec: Long = 300L,
                           watermark: String = "30 minutes"): Dataset[TopRow] = {
    import events.sparkSession.implicits._
    val nWins = ((widthSec + slideSec - 1) / slideSec).toInt
    events
      .select(col("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)]
      .flatMap { case (ts, typ, value) =>
        val sec = Math.floorDiv(ts.getTime, 1000L)
        val base = Math.floorDiv(sec, slideSec) * slideSec
        (0 until nWins).iterator
          .map(i => WinEv(base - i * slideSec, typ, value, ts))
          .filter(we => sec < we.win_start_s + widthSec)
      }
      // watermark AFTER the expansion: the event-time tag would not
      // survive the typed flatMap's serialize/deserialize boundary
      .withWatermark("ts", watermark)
      .groupByKey(_.win_start_s)
      .flatMapGroupsWithState[Map[String, TypeAgg], TopRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (winStart: Long, evs: Iterator[WinEv], state: GroupState[Map[String, TypeAgg]]) =>
          if (state.hasTimedOut) {
            val acc = state.getOption.getOrElse(Map.empty)
            state.remove()
            acc.toSeq
              .sortBy { case (typ, a) => (-a.n, typ) }
              .take(k).zipWithIndex.iterator
              .map { case ((typ, a), i) =>
                TopRow(winStart, typ, a.n,
                  math.round(a.total * 100.0) / 100.0, i + 1L)
              }
          } else {
            var acc = state.getOption.getOrElse(Map.empty)
            for (e <- evs) {
              val cur = acc.getOrElse(e.event_type, TypeAgg(0L, 0.0))
              acc = acc.updated(e.event_type, TypeAgg(cur.n + 1, cur.total + e.value))
            }
            state.update(acc)
            // seal when the watermark passes the window end
            state.setTimeoutTimestamp((winStart + widthSec) * 1000L)
            Iterator.empty
          }
      }
  }
}
