package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.{col, expr, lit}
import org.apache.spark.sql.graftx.StreamBridge
import org.apache.spark.sql.types.LongType

/** S31/st33 — the commit log as a Structured Streaming SINK (see
  * [[GraftLogProvider.createSink]] for the contract). Each
  * micro-batch becomes ONE commit through the store's ordinary write
  * path — schema gate, zones, the hard-link claim and the txn
  * high-water guard all apply — stamped `appId:batchId` so replays
  * after recovery are no-ops BEFORE any IO (the st26 exactly-once
  * certification, now engine-wired). The engine hands `addBatch` a
  * streaming-planned frame; the [[StreamBridge.asBatch]] re-plan (the
  * ForeachBatchSink pattern) makes it consumable by a batch writer.
  *
  * Txn IDENTITY: when no explicit `appId` option is set, the default
  * is the streaming QUERY's persistent id (Delta's rule — the id
  * lives inside the checkpoint, read here from the engine's
  * `sql.streaming.queryId` local property at addBatch time). A
  * checkpoint-path or table-root default would be stable across
  * checkpoint DELETION: restarting with a fresh checkpoint replays
  * batchIds from 0, and the high-water guard would silently no-op
  * every batch — data loss with no error. A fresh checkpoint mints a
  * fresh query id, so reprocessing lands; and two queries writing the
  * same root never collide on identity. Upgrade note: a query whose
  * checkpoint predates this default (txn tags stamped under the old
  * checkpoint-path identity) re-commits its ONE in-flight batch on
  * the first post-upgrade restart — a bounded duplicate in the
  * fail-safe direction, preferred over keeping the old default's
  * silent-loss hazard; set an explicit `appId` to pin identity
  * across upgrades.
  *
  * Scale shape: per trigger, work is batch-sized (the files the batch
  * writes + one manifest line set); an empty APPEND batch commits
  * nothing. Complete mode overwrites the snapshot per trigger — the
  * streaming materialized-view shape — INCLUDING an empty result (a
  * materialized view whose state legitimately became empty must stop
  * serving the previous snapshot).
  */
private[sources] final class GraftLogSink(ctx: SQLContext, root: String,
                                          layoutSql: Option[String],
                                          numFiles: Int,
                                          explicitAppId: Option[String],
                                          checkpointInterval: Int,
                                          overwriteEachBatch: Boolean,
                                          clusterRange: Boolean = false)
    extends Sink {

  /** Resolved once per query RUN (the id is stable for the query's
    * lifetime): explicit option > the engine's persistent query id >
    * the table root (non-streaming addBatch callers, e.g. a spec
    * driving the sink directly).
    */
  private lazy val appId: String = explicitAppId
    .orElse(Option(ctx.sparkSession.sparkContext.getLocalProperty(
      org.apache.spark.sql.execution.streaming.runtime
        .StreamExecution.QUERY_ID_KEY)))
    .getOrElse(root)
    .map(c => if (c == ':' || c == ',' || c == '\t' || c == '\n') '_' else c)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = StreamBridge.asBatch(ctx, data)
    // empty APPEND batches commit nothing (the txn guard keeps replay
    // exactness either way); an empty COMPLETE batch is a real state —
    // the overwrite below must land it
    if (batch.isEmpty && !overwriteEachBatch) return
    // a declared CLUSTER BY key (R105) range-buckets this batch (one
    // driver-bounded aggregate) so zones prune contiguous ranges
    val layout =
      if (clusterRange && layoutSql.isDefined)
        TableLog.rangeLayout(batch, layoutSql.get, numFiles)
      else layoutSql.map(expr).getOrElse {
        batch.schema.fields.find(_.dataType == LongType)
          .map(f => col(f.name)).getOrElse(lit(0L))
      }
    TableLog.commit(batch, root, layout, numFiles,
      if (overwriteEachBatch) "overwrite" else "append",
      checkpointInterval, txnTag = Some(s"$appId:$batchId"))
  }

  override def toString: String = s"GraftLogSink[$root]"
}
