package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Z-order (Morton-curve) write clustering: sort data by the bit
  * interleave of two key columns before writing, so parquet row-group
  * min/max stats prune predicates on EITHER (or both) dimensions.
  *
  * Why this matters at 100 TB: a table range-partitioned on one key
  * answers filters on that key only; z-order clustering gives
  * locality in both dimensions at once (each row group covers a
  * small rectangle of the key space), which is what a scan planner
  * needs to skip row groups for 2-D predicates — the same layout
  * trick Delta/Iceberg OPTIMIZE ZORDER applies, here as a plain
  * Spark operator with a codegen'd interleave expression.
  *
  * The plan shape is repartitionByRange(z) + sortWithinPartitions(z):
  * one range shuffle (sampled bounds, balanced output files), then a
  * per-partition sort — identical cost to a sorted write on a single
  * key.
  */
object ZOrder {

  /** The clustering key: morton interleave of the low `bits` bits of
    * each column (keys are masked, so callers bucket or mod larger
    * domains first).
    *
    * At bits == 32 the interleave fills all 64 bits, putting y's bit
    * 31 in the SIGN bit — a signed range-partition/sort would then
    * invert the top half of the curve, silently breaking the 2-D
    * clustering. The key is a sort key, not a value, so we flip the
    * sign bit (order-isomorphic to the unsigned Morton code) in that
    * one case; below 32 bits the interleave is sign-free.
    */
  def zkey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 32, s"bits must be in [1,32], got $bits")
    val mask = (1L << bits) - 1
    val z = GraftFunctions.zorder2(x.cast("long").bitwiseAND(lit(mask)),
      y.cast("long").bitwiseAND(lit(mask)))
    if (bits == 32) z.bitwiseXOR(lit(Long.MinValue)) else z
  }

  /** Hilbert clustering key on the 2^bits grid (masked like [[zkey]]):
    * the better-locality alternative — consecutive key values are
    * always grid-ADJACENT (the curve never jumps), where the Morton
    * curve teleports at power-of-two boundaries, so equal key ranges
    * cover tighter 2-D tiles and per-file zones stay tighter on both
    * axes. Fills 2·bits ≤ 62 bits — always sign-free.
    */
  def hkey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    GraftFunctions.hilbert2(x.cast("long").bitwiseAND(lit(mask)),
      y.cast("long").bitwiseAND(lit(mask)), bits)
  }

  /** df clustered for writing: range-partitioned and sorted by the
    * z key (kept as column `zkey` so writers can verify layout).
    */
  def cluster(df: DataFrame, x: Column, y: Column,
              numPartitions: Int, bits: Int = 16): DataFrame =
    df.withColumn("zkey", zkey(x, y, bits))
      .repartitionByRange(numPartitions, col("zkey"))
      .sortWithinPartitions("zkey")
}
