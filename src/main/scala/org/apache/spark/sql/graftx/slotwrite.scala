/*
 * Internal-row slot placement for TableLog.writeDataFiles.
 *
 * The write path routes every row to an exact output file (partition
 * i = slot i — zones, layout clustering and file counts all depend on
 * that exact mapping, which hash repartitioning cannot give). The
 * original implementation dropped to `df.rdd`, paying a full
 * InternalRow→external Row conversion before the shuffle and the
 * reverse conversion after (guide §1.4's `df.rdd` caveat: external
 * objects + Java-serialized GenericRows on the wire). This keeps the
 * rows in Spark's internal (Unsafe) format end to end: `toRdd` →
 * pair by slot → SlotPartitioner shuffle → bound projection dropping
 * the slot column → internalCreateDataFrame for the parquet write.
 *
 * Lives under org.apache.spark.sql.* for internalCreateDataFrame
 * (private[sql]) — same as bridge.scala / materialize.scala.
 */
package org.apache.spark.sql.graftx

import org.apache.spark.Partitioner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.classic
import org.apache.spark.sql.types.StructType

object SlotWrite {

  /** Place `df`'s rows so that output partition i holds exactly the
    * rows whose LAST column (an int slot in [0, partitioner.n)) is i,
    * and return the frame WITHOUT the slot column. Rows never leave
    * Spark's internal format.
    */
  def placed(df: DataFrame, partitioner: Partitioner): DataFrame = {
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    val fields = df.schema.fields.dropRight(1)
    val width = fields.length
    val out = df.queryExecution.toRdd
      // iterator rows are reused buffers; copy before they cross the
      // shuffle's buffering
      .mapPartitions(_.map(r => (r.getInt(width), r.copy())))
      .partitionBy(partitioner)
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(fields.map(_.dataType))
        it.map(kv => proj(kv._2).asInstanceOf[InternalRow])
      }
    session.internalCreateDataFrame(out, StructType(fields))
  }
}
