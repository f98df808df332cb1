package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT grouped order statistics without a per-group sort — the
  * 100 TB form of "median and p90 per group".
  *
  * The naive exact form (q48's original window) ranks with
  * `row_number()` over `partitionBy(group).orderBy(v)`: every group
  * becomes ONE window partition sorted on ONE task chain — a
  * single-task sort of billions of rows per group at corpus scale,
  * the same failure class as the pre-round-8 d24 gate. Sketches fix
  * the scale but surrender exactness. This operator keeps BOTH:
  *
  *   1. (keys, v) count — one linear hash shuffle with map-side
  *      combine; ties collapse to (value, multiplicity) pairs.
  *   2. per-group KLL sketch over the raw rows (a plain aggregation —
  *      no sort, no window) bracketing each target rank at
  *      probability p ± delta. The sketch only PROPOSES a value
  *      window; it is never trusted for the answer.
  *   3. one more aggregation over the counted pairs: per group,
  *      n = Σcnt, less_r = Σcnt where v < lo_r, and the (v, cnt)
  *      pairs inside [lo_r, hi_r] collected (ε-sized by the sketch's
  *      rank guarantee). The exact k-th value is then a weighted walk
  *      over the sorted bracket pairs — pure Column arithmetic on a
  *      tiny array.
  *
  * If the sketch's bracket ever misses the true rank (probability
  * ~exp(-k) per group, and impossible for groups below
  * `smallGroup`, which collect everything), the selection raises a
  * runtime error instead of returning a wrong answer — exactness is
  * asserted, not assumed. The output is the exact multiset order
  * statistic, so it is deterministic and oracle-stable even though
  * the KLL sketch itself is randomized.
  *
  * Scale shape: two linear shuffles (both with partial aggregation),
  * one broadcast of a #groups-row bracket table, zero sorts of data
  * — only `array_sort` over per-group brackets of ~2·delta·distinct
  * values. ExactQuantilesSpec pins equality with the ranked-window
  * form, including heavy-tie and tiny-group corpora.
  *
  * Contract: group keys must be non-null (the bracket join is
  * null-unsafe equality — a null-keyed group would silently drop;
  * filter or coalesce keys upstream), and `vCol` non-null numeric.
  * Works for integral AND fractional values: the long-floor/ceil
  * bracket is just wider for doubles, the selection stays exact.
  *
  * @param ranks  (outputName, pFraction, 1-based target rank as a
  *               function of the group-count column) — e.g.
  *               ("median_v", 0.5, n => (n+1) div 2).
  */
object ExactQuantiles {

  def groupedExactSelect(df: DataFrame, keys: Seq[String], vCol: String,
                         ranks: Seq[(String, Double, Column => Column)],
                         sketchK: Int = 4096, delta: Double = 0.01,
                         smallGroup: Long = 4096L): DataFrame = {
    require(ranks.nonEmpty)
    val keyCols = keys.map(col)
    val v = col(vCol)

    // pass 1: tie-collapsed (keys, v) counts — linear, map-side combined
    val vc = df.groupBy((keyCols :+ v.as("__v")): _*)
      .agg(count(lit(1)).as("__cnt"))

    // pass 1b: per-group brackets from a KLL over the DISTINCT values
    // weighted by multiplicity via repeated update? A value-weighted
    // sketch isn't available, so bracket on the raw column instead:
    // the sketch pass reads the original rows (same scan Catalyst
    // often reuses), still a pure aggregation — no sort, no window.
    val probes: Seq[Double] = ranks.flatMap { case (_, p, _) =>
      Seq(math.max(0.0, p - delta), math.min(1.0, p + delta))
    }
    val brackets = df.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__n"),
        graft.functions.GraftFunctions
          .kll_quantiles(v.cast("double"), sketchK, probes).as("__qs"))
      .select((keyCols :+ col("__n")) ++ ranks.zipWithIndex.flatMap {
        case ((name, _, _), i) =>
          Seq(floor(element_at(col("__qs"), 2 * i + 1)).cast("long").as(s"__lo_$name"),
            ceil(element_at(col("__qs"), 2 * i + 2)).cast("long").as(s"__hi_$name"))
      }: _*)

    // pass 2: exact counts below each bracket + the bracket contents,
    // everything per group in ONE aggregation over the counted pairs.
    val joined = vc.join(broadcast(brackets), keys)
    val small = col("__n") <= smallGroup
    val aggs = ranks.flatMap { case (name, _, _) =>
      val lo = col(s"__lo_$name"); val hi = col(s"__hi_$name")
      Seq(
        sum(when(!small && col("__v") < lo, col("__cnt")).otherwise(0L))
          .as(s"__less_$name"),
        sort_array(collect_list(when(small || (col("__v") >= lo && col("__v") <= hi),
          struct(col("__v").as("v"), col("__cnt").as("cnt")))))
          .as(s"__arr_$name"))
    }
    val allAggs = max(col("__n")).as("n") +: aggs
    val grouped = joined.groupBy(keyCols: _*)
      .agg(allAggs.head, allAggs.tail: _*)

    // weighted selection walk over the sorted bracket pairs; a bracket
    // miss surfaces as raise_error, never as a wrong value. The
    // accumulator's ans field is typed from the DATA (a long-typed
    // zero against a double column fails analysis in the merge
    // lambda), so fractional value columns select exactly too.
    val vType = df.schema(vCol).dataType
    val outs = ranks.map { case (name, _, rankFn) =>
      val target = rankFn(col("n")) - col(s"__less_$name")
      val walk = aggregate(col(s"__arr_$name"),
        struct(lit(0L).as("cum"), lit(null).cast(vType).as("ans")),
        (acc, e) => struct(
          (acc.getField("cum") + e.getField("cnt")).as("cum"),
          coalesce(acc.getField("ans"),
            when(acc.getField("cum") + e.getField("cnt") >= target,
              e.getField("v"))).as("ans")),
        acc => acc.getField("ans"))
      when(target >= 1L, coalesce(walk,
        raise_error(concat(lit(s"exact-quantile bracket miss for $name at target "),
          target.cast("string")))))
        .otherwise(raise_error(lit(s"exact-quantile target below bracket for $name")))
        .as(name)
    }
    grouped.select((keyCols :+ col("n")) ++ outs: _*)
  }

  /** EXACT linearly-INTERPOLATED grouped quantiles — the
    * `percentile_cont` contract (SQL standard / NIST R-7: value =
    * v[⌊h⌋] + (v[⌈h⌉] − v[⌊h⌋])·(h − ⌊h⌋) at h = (n−1)·p, 0-based)
    * on [[groupedExactSelect]]'s sort-free machinery: each quantile
    * needs just the TWO bracketing order statistics, fetched as two
    * rank selections in the same two-shuffle plan, then combined with
    * pure Column arithmetic. Same scale shape and bracket-miss
    * raise_error as the discrete form.
    *
    * Determinism: h and the interpolation run in IEEE double with a
    * fixed op order — CAST(n−1 AS DOUBLE)·p, floor, subtract,
    * multiply-add — which an external engine replays bit-for-bit by
    * writing the same expression (the REPLAYED formula is the
    * contract; for p where (n−1)·p is mathematically integral but
    * binary-inexact, e.g. p=0.9 and n−1=10, both sides land on the
    * same ≈2⁻⁵² fraction rather than 0). Same non-null key/value
    * contract as [[groupedExactSelect]].
    */
  def groupedInterpolated(df: DataFrame, keys: Seq[String], vCol: String,
                          quantiles: Seq[(String, Double)],
                          sketchK: Int = 4096, delta: Double = 0.01,
                          smallGroup: Long = 4096L): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall { case (_, p) => p >= 0.0 && p <= 1.0 })
    def h(n: Column, p: Double): Column = (n - 1L).cast("double") * lit(p)
    val ranks = quantiles.flatMap { case (name, p) =>
      Seq(
        (s"__qlo_$name", p, (n: Column) => floor(h(n, p)).cast("long") + 1L),
        (s"__qhi_$name", p, (n: Column) => least(floor(h(n, p)).cast("long") + 2L, n)))
    }
    val sel = groupedExactSelect(df, keys, vCol, ranks, sketchK, delta, smallGroup)
    val outs = quantiles.map { case (name, p) =>
      val frac = h(col("n"), p) - floor(h(col("n"), p))
      val lo = col(s"__qlo_$name").cast("double")
      val hi = col(s"__qhi_$name").cast("double")
      (lo + (hi - lo) * frac).as(name)
    }
    sel.select((keys.map(col) :+ col("n")) ++ outs: _*)
  }
}
