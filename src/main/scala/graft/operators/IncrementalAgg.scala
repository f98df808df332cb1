package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * primitive (Delta/BigQuery "incremental MV", Gray et al.'s
  * re-aggregatable cube state): the base corpus is reduced ONCE to a
  * per-key partial-state table of commutative-monoid accumulators
  * (count / sum / min / max — `avg` is derived at read time as
  * sum_<m>/cnt_<m>, never stored), and every refresh aggregates only
  * the DELTA and merges it with the stored state. Merging is the same
  * keyed aggregate over state rows, so merge(partial(A), partial(B))
  * == partial(A ∪ B) by associativity — the property
  * IncrementalAggSpec pins (including multi-way merges and empty
  * sides) and q56's oracle certifies value-for-value against a full
  * recompute in DuckDB.
  *
  * Scale shape: the 100 TB corpus is scanned exactly once ever (the
  * initial `partial`); afterwards each refresh touches the delta plus
  * a |keys|-bounded state table — the shuffle is MV-sized, not
  * fact-sized. Measures must be integer-exact (cents, micros) so
  * partial-aggregation ORDER can't drift sums; floats would make the
  * merged result partitioning-dependent. Non-algebraic measures
  * (exact distinct, quantiles) can't use this state — that's the
  * sketch-rollup path (q37's stored theta sketches, f11's KLL), which
  * is the same merge discipline over sketch accumulators instead of
  * scalars.
  *
  * State schema: keys ++ (cnt, then cnt_<m>, sum_<m>, min_<m>,
  * max_<m> per measure). `cnt` is the ROW count (count(*));
  * `cnt_<m>` is the NON-NULL count for measure m, stored so the
  * read-time derived average sum_<m>/cnt_<m> equals SQL AVG(m)
  * exactly even when a measure has NULLs (AVG divides by the
  * non-null count, not the row count).
  */
object IncrementalAgg {

  /** Reduce rows to per-key partial state. Measure columns must be
    * integral (cast upstream); null measures are skipped by sum/min/
    * max and by `cnt_<m>` (count(col) is SQL's non-null count) —
    * only `cnt` counts every row.
    */
  def partial(df: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty)
    val aggs = count(lit(1)).as("cnt") +:
      measures.flatMap(m => Seq(
        count(col(m)).as(s"cnt_$m"),
        sum(col(m)).as(s"sum_$m"),
        min(col(m)).as(s"min_$m"),
        max(col(m)).as(s"max_$m")))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of partial-state tables (the stored MV plus one
    * or more delta partials) into a single state table. Identical
    * output schema, so merges chain/associate freely.
    */
  def merge(parts: Seq[DataFrame], keys: Seq[String], measures: Seq[String]): DataFrame = {
    require(parts.nonEmpty)
    val aggs = sum(col("cnt")).as("cnt") +:
      measures.flatMap(m => Seq(
        sum(col(s"cnt_$m")).as(s"cnt_$m"),
        sum(col(s"sum_$m")).as(s"sum_$m"),
        min(col(s"min_$m")).as(s"min_$m"),
        max(col(s"max_$m")).as(s"max_$m")))
    parts.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
