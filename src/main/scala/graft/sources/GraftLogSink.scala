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
  * Scale shape: per trigger, work is batch-sized (the files the batch
  * writes + one manifest line set); an empty batch commits nothing.
  * Complete mode overwrites the snapshot per trigger — the streaming
  * materialized-view shape — under the same replay guard.
  */
private[sources] final class GraftLogSink(ctx: SQLContext, root: String,
                                          layoutSql: Option[String],
                                          numFiles: Int, appId: String,
                                          checkpointInterval: Int,
                                          overwriteEachBatch: Boolean)
    extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = StreamBridge.asBatch(ctx, data)
    if (batch.isEmpty) return // nothing to commit; the guard keeps replay-exactness
    val layout = layoutSql.map(expr).getOrElse {
      batch.schema.fields.find(_.dataType == LongType)
        .map(f => col(f.name)).getOrElse(lit(0L))
    }
    TableLog.commit(batch, root, layout, numFiles,
      if (overwriteEachBatch) "overwrite" else "append",
      checkpointInterval, txnTag = Some(s"$appId:$batchId"))
  }

  override def toString: String = s"GraftLogSink[$root]"
}
