package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the standard warehouse DQ primitive
  * (complementing q47's threshold audit gate): per column, row/null/
  * distinct counts and min/max, numeric and string columns each in
  * their own typed lane so ordering stays semantic (a string min over
  * numbers would rank "10" < "9").
  *
  * Scale shape: the column pivot is ONE Expand pass (row → one slim
  * (col_name, value) row per profiled column — the classic profiler
  * cost, ×|cols| narrow rows, no joins), then a (col_name)-keyed
  * aggregate with map-side combine. Exact distinct adds the standard
  * two-stage distinct expansion per column; at corpus scale flip
  * `exact = false` to profile with HLL sketches instead
  * (approx_count_distinct, rsd 5% — the q06b trade) and the rest of
  * the profile is unchanged. The exact form is the oracle contract
  * (q54_profile); ProfileSpec pins the approx twin within HLL error
  * of it.
  *
  * Output: (col_name, n_rows, n_null, n_distinct, min_num, max_num,
  * min_str, max_str) — `_num` filled for numeric columns, `_str` for
  * string/date columns (dates profile through their ISO string form,
  * identical on both engines). n_distinct excludes nulls (both
  * engines' COUNT(DISTINCT) semantics).
  */
object Profile {

  def profile(df: DataFrame, numCols: Seq[String], strCols: Seq[String],
              exact: Boolean = true): DataFrame = {
    require(numCols.nonEmpty || strCols.nonEmpty)
    def distinctOf(c: org.apache.spark.sql.Column) =
      if (exact) count_distinct(c) else approx_count_distinct(c)
    val parts = Seq(
      (numCols, "DOUBLE", true),
      (strCols, "STRING", false)).filter(_._1.nonEmpty).map {
      case (cols, castTo, isNum) =>
        val stacked = df.selectExpr(
          s"stack(${cols.size}, " +
            cols.map(c => s"'$c', CAST($c AS $castTo)").mkString(", ") +
            ") AS (col_name, v)")
        val agg = stacked.groupBy("col_name").agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
          distinctOf(col("v")).as("n_distinct"),
          min("v").as("mn"), max("v").as("mx"))
        if (isNum)
          agg.select(col("col_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("mn").as("min_num"), col("mx").as("max_num"),
            lit(null).cast("string").as("min_str"),
            lit(null).cast("string").as("max_str"))
        else
          agg.select(col("col_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), lit(null).cast("double").as("min_num"),
            lit(null).cast("double").as("max_num"),
            col("mn").as("min_str"), col("mx").as("max_str"))
    }
    parts.reduce(_.unionByName(_))
  }
}
