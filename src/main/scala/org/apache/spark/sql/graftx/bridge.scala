/*
 * Batch→streaming DataFrame bridge for graft's DSv1 streaming
 * sources.
 *
 * Lives under org.apache.spark.sql.* because
 * classic.SQLContext.internalCreateDataFrame — the only supported way
 * for a DSv1 `Source.getBatch` to hand the engine a DataFrame whose
 * logical plan is marked isStreaming (MicroBatchExecution asserts it)
 * — is private[sql] in Spark 4. Same approach as ../graftx
 * expressions; the graft-facing API is GraftLogCdfProvider.
 */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.types.StructType

object StreamBridge {

  /** Re-plan a driver-built batch DataFrame as a streaming micro-batch
    * under `schema` (the SOURCE's declared schema — using it verbatim
    * guarantees the engine's attribute rewiring sees exactly the
    * schema `sourceSchema` promised, independent of the batch plan's
    * inferred nullability). The RDD is the batch plan's `toRdd` —
    * lazy, executed by the micro-batch like any other source scan.
    */
  def asStreaming(ctx: SQLContext, df: DataFrame, schema: StructType): DataFrame =
    ctx.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      .internalCreateDataFrame(
        df.queryExecution.toRdd, schema, isStreaming = true)

  /** An empty streaming micro-batch under `schema`. */
  def emptyStreaming(ctx: SQLContext, schema: StructType): DataFrame = {
    val classic = ctx.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    classic.internalCreateDataFrame(
      classic.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema, isStreaming = true)
  }
}
