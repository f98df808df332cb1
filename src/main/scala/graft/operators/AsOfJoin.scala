package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (SURVEY.md §2.1 R21): for each left row, attach the
  * latest right row with the same key whose timestamp is at or before
  * the left row's (backward direction; `forward` flips it).
  *
  * Spark-first plan: tag and union both sides, then ONE window pass
  * per key ordered by (ts, tag) carrying the right side's payload as a
  * single struct via last(ignoreNulls). The struct wrapper is non-null
  * for every right row, so the match row is chosen exactly once: right
  * payload values that are genuinely NULL stay NULL, and multi-column
  * payloads always come from the same right row. A single shuffle on
  * the key, linear scan within each key — no per-row correlated lookup
  * and no range join explosion, which is what makes this hold up on a
  * 100 TB event log (the classic sort-merge as-of in time-series
  * engines, expressed as a window).
  */
object AsOfJoin {

  /** @param left      probe side (keeps all its rows)
    * @param right     reference side (its `payload` columns attach)
    * @param key       equi-join key column name (both sides)
    * @param ts        event-time column name (both sides)
    * @param payload   right-side columns to carry (renamed as given)
    * @param forward   false → latest right ≤ left ts (backward);
    *                  true → earliest right ≥ left ts
    */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Seq[String], forward: Boolean = false): DataFrame = {
    val leftCols = left.columns
    // right rows sort before left rows at equal ts (backward: a tie
    // means the right row is visible to the left row). The payload is
    // wrapped in ONE struct so last(ignoreNulls) selects a whole right
    // row atomically (the struct is never null on the right side, even
    // when every payload value in it is null).
    val nullPayStruct =
      lit(null).cast(org.apache.spark.sql.types.StructType(
        payload.map(p => org.apache.spark.sql.types.StructField(p, right.schema(p).dataType))))
    val r = right.select(
      (col(key) +: col(ts) +: lit(0).as("__tag") +:
        struct(payload.map(col): _*).as("__pay") +:
        leftCols.filterNot(c => c == key || c == ts).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val l = left.select(
      (col(key) +: col(ts) +: lit(1).as("__tag") +:
        nullPayStruct.as("__pay") +:
        leftCols.filterNot(c => c == key || c == ts).map(col)): _*)
    val ord: Seq[Column] =
      if (forward) Seq(col(ts).desc, col("__tag")) else Seq(col(ts).asc, col("__tag"))
    val w = Window.partitionBy(key).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(
        (leftCols.map(col) ++ payload.map(p => col(s"__asof.$p").as(s"asof_$p"))): _*)
  }
}
