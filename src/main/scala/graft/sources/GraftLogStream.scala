package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftx.StreamBridge
import org.apache.spark.sql.types.StructType

/** S33/st35 — PLAIN streaming read of a graft table (Delta's
  * `spark.readStream.table("t")` semantics, the no-stamps twin of
  * [[GraftLogCdfSource]]): the stream's rows ARE table rows — an
  * initial snapshot of the table as of stream start, then exactly the
  * rows each subsequent APPEND commit added. This is the source the
  * table-name streaming surface resolves to (GraftStreamTableRule
  * rewrites `readStream.table("graft.db.t")` onto it; the
  * `readChangeFeed=true` option switches to the CDF source instead).
  *
  * Semantics (Delta's rules, re-derived from the manifest metadata):
  *   - With no `startingVersion`, the FIRST micro-batch replays the
  *     snapshot at the head current when the engine asks for the
  *     first offset (version-pinned, so recovery replays it
  *     bit-identically); later batches tail new commits.
  *   - `startingVersion=N` skips the snapshot and replays commits
  *     from version N (N's own delta counts; N=0 therefore replays
  *     everything — Delta's startingVersion contract).
  *   - An append commit's rows surface exactly once. Layout-only
  *     commits (compact/recluster — Delta's dataChange=false) and
  *     metadata-only commits surface nothing.
  *   - A commit that REMOVES or suppresses rows (overwrite, restore,
  *     merge, DML, deletion-vector growth) is NOT expressible as an
  *     insert-only stream: the source fails LOUDLY naming the version
  *     and action — unless `skipChangeCommits=true`, which skips those
  *     versions entirely (Delta's option of the same name).
  *   - `maxVersionsPerBatch` paces catch-up replay exactly like the
  *     CDF source (bounded micro-batches under AvailableNow too).
  *
  * Scale shape: per trigger the source reads only the files the
  * window's commits ADDED (manifest-listed, column-pruned, never a
  * snapshot rescan after the first batch); change-commit
  * classification is driver-side manifest arithmetic (delta-chain
  * bounded), and offsets are one header read per trigger.
  */
class GraftLogStreamSource(ctx: SQLContext, root: String,
                           startV: Option[Long],
                           skipChangeCommits: Boolean = false,
                           maxVersionsPerBatch: Option[Long] = None,
                           boundDdl: Option[String] = None)
    extends Source with SupportsTriggerAvailableNow {

  require(maxVersionsPerBatch.forall(_ >= 1L),
    s"graftlog stream: maxVersionsPerBatch must be >= 1, got $maxVersionsPerBatch")

  /** The table DDL captured ONCE at stream start — every micro-batch
    * binds positionally under it; a mid-stream evolution fails loudly
    * at the window that crossed it (the CDF source's rule, shared).
    */
  private val createdDdl: String = boundDdl.getOrElse {
    val head = TableLog.currentVersion(root)
    require(head >= 0L, s"graftlog stream source needs a committed table at $root")
    TableLog.schemaDdlOf(root, head)
  }

  override val schema: StructType = StructType.fromDDL(createdDdl)

  @volatile private var availableNowTarget: Long = Long.MaxValue
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = TableLog.currentVersion(root)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission-control pacing — the CDF source's shape: at most
    * `maxVersionsPerBatch` versions past the engine's last committed
    * offset, never beyond the live head / the AvailableNow target.
    * The snapshot batch (no prior offset, no startingVersion) is ONE
    * batch at the head regardless of pacing — it is a single
    * version-pinned read, not a commit replay.
    */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val head = math.min(TableLog.currentVersion(root), availableNowTarget)
    if (head < 0L) null
    else Option(start).map(_.json.trim.toLong) match {
      case None if startV.isEmpty => LongOffset(head) // snapshot batch
      case prior =>
        val base = prior.getOrElse(startV.get - 1L)
        val capped = maxVersionsPerBatch
          .map(m => math.min(head, base + m)).getOrElse(head)
        if (capped < 0L) null else LongOffset(math.max(base, capped))
    }
  }

  override def reportLatestOffset(): OffsetV2 = {
    val head = TableLog.currentVersion(root)
    if (head < 0L) null else LongOffset(head)
  }

  @volatile private var lastBatchEnd: Long = Long.MinValue

  override def getOffset: Option[Offset] = {
    val head = TableLog.currentVersion(root)
    if (head < 0L) None
    else if (lastBatchEnd == Long.MinValue && startV.isEmpty)
      Some(LongOffset(head)) // snapshot batch
    else {
      val base = if (lastBatchEnd == Long.MinValue) startV.get - 1L
                 else lastBatchEnd
      val capped = maxVersionsPerBatch
        .map(m => math.min(head, base + m)).getOrElse(head)
      if (capped < 0L) None else Some(LongOffset(math.max(base, capped)))
    }
  }

  private def ver(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  /** Is version `v` replayable as pure inserts — and if so, which
    * file entries carry them? Left(reason) = change commit.
    */
  private def insertsOf(v: Long): Either[String, Seq[TableLog.FileEntry]] = {
    val m = TableLog.readManifest(root, v)
    val base = m.action.takeWhile(_ != '+') // strip the +txn= stamp
    if (base == "compact" || base == "recluster")
      Right(Nil) // layout-only rewrite: dataChange=false, nothing streams
    else {
      val (adds, removes) = TableLog.versionDelta(root, v)
      // deletion-vector growth keeps paths but suppresses rows — a
      // change commit even with zero file-level churn (liveRows is
      // the exact, cheap witness: growth strictly shrinks it)
      lazy val dvGrew = m.parent >= 0L && {
        val pByPath = TableLog.readManifest(root, m.parent)
          .files.map(f => f.path -> f).toMap
        m.files.exists(f =>
          pByPath.get(f.path).exists(_.liveRows != f.liveRows))
      }
      if (removes.nonEmpty || dvGrew)
        Left(s"version $v (action '${m.action}') removes or suppresses rows")
      else Right(adds)
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val toV = ver(end)
    val firstBatch = start.isEmpty && lastBatchEnd == Long.MinValue
    val fromV = start.map(ver(_) + 1L).getOrElse(startV.getOrElse(toV))
    lastBatchEnd = math.max(if (lastBatchEnd == Long.MinValue) toV
                            else lastBatchEnd, toV)
    if (fromV > toV) return StreamBridge.emptyStreaming(ctx, schema)
    // drift guard on (name, type) pairs — nullability tightening
    // (NOT NULL markers accreted by the append gate) binds identically
    // positionally, so only a real shape change is a restart error
    val ddlAtEnd = TableLog.schemaDdlOf(root, toV)
    if (!GraftLogCdfSource.sameShape(ddlAtEnd, createdDdl))
      throw new IllegalStateException(
        s"graftlog stream: table schema changed within the stream " +
          s"(started under [$createdDdl], version $toV has [$ddlAtEnd]) — " +
          "restart the streaming query to pick up the new schema")
    val m = TableLog.readManifest(root, toV)
    if (firstBatch && startV.isEmpty)
      // the initial snapshot: one version-pinned read (DV-suppressed,
      // null-filling — the store's one read path), replayed
      // bit-identically on recovery because toV rides the offset WAL
      StreamBridge.asStreaming(ctx,
        TableLog.readFiles(ctx.sparkSession, root, m, m.files), schema)
    else {
      val entries = (fromV to toV).flatMap { v =>
        insertsOf(v) match {
          case Right(adds) => adds
          case Left(reason) if skipChangeCommits => Nil
          case Left(reason) => throw new IllegalStateException(
            s"graftlog stream: $reason — an insert-only table stream " +
              "cannot express it; use the change feed " +
              "(readChangeFeed=true) or set skipChangeCommits=true")
        }
      }
      if (entries.isEmpty) StreamBridge.emptyStreaming(ctx, schema)
      else StreamBridge.asStreaming(ctx,
        TableLog.readFiles(ctx.sparkSession, root, m, entries), schema)
    }
  }

  override def stop(): Unit = ()
}
