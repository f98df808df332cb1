package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Graft
import graft.functions.GraftFunctions
import graft.operators.FlowCyto
import graft.sources.FcsSource

/** FCS / flow-cytometry operators — SURVEY.md §2.2 (F1–F7).
  *
  * `lineitem` stands in for the events×channels matrix: `l_quantity`,
  * `l_discount`, `l_tax`, `l_extendedprice` are channels and
  * (`l_returnflag`, `l_linestatus`) are the sample keys.
  *
  * Oracle-parity rules: every float computation is written with the
  * SAME operation order as the DuckDB SQL (IEEE doubles are then
  * bit-identical), and rounded identically on both sides.
  */
object FlowCytoQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.table(s, dir, name)

  /** Spillover matrix for f03: row i = true signal i's fractional
    * bleed into each observed channel (qty, disc%, tax%).
    */
  private val spill: Array[Array[Double]] = Array(
    Array(1.00, 0.05, 0.02),
    Array(0.03, 1.00, 0.04),
    Array(0.01, 0.06, 1.00))
  private val inv = FlowCyto.invert(spill)

  /** Diamond polygon gate in (l_quantity, l_discount) space. Vertices
    * CCW; chosen so no data lattice point (integer qty × 0.01-step
    * discount) can sit on an edge — ray-cast (Spark) and half-plane
    * (oracle) then agree exactly.
    */
  private val polyX = Array(25.3, 45.7, 25.3, 5.1)
  private val polyY = Array(0.001, 0.053, 0.107, 0.053)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1: arcsinh channel transform — custom codegen Expression.
    "f01_arcsinh" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(FlowCyto.arcsinhChannel(col("l_quantity"), 5.0), 6).as("asinh_qty"),
          round(FlowCyto.arcsinhChannel(col("l_extendedprice"), 150.0), 6).as("asinh_price"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // F2: logicle biexponential transform — ORACLE-EXACT since round
    // 8: the fixed-point grid form (LogicleFixedMath: integer
    // bit-product exponentials + 23-step integer bisection on the
    // 10^-6 display grid) replaces the float bisection whose branch
    // decisions depended on sub-ulp pow() agreement between engines.
    // The DuckDB oracle replays the identical integer recurrence in a
    // recursive CTE with the SAME driver-computed constant tables.
    // The float transform stays the spec-tested production kernel;
    // ExpressionsSpec pins |q6 - float| <= 2e-6.
    "f02_logicle" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          GraftFunctions.logicle_q6(
            col("l_extendedprice"), 100000.0, 4.5, 0.5).as("logicle_price"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // F3: spillover compensation — observed × S⁻¹ unrolled to literal
    // multiply-adds (see FlowCyto.compensate).
    "f03_compensate" -> ((s, dir) => {
      FlowCyto.compensate(
          t(s, dir, "lineitem"),
          Seq(col("l_quantity"), col("l_discount") * lit(100.0), col("l_tax") * lit(100.0)),
          spill,
          Seq("comp_qty", "comp_disc", "comp_tax"))
        .select("l_orderkey", "l_linenumber", "comp_qty", "comp_disc", "comp_tax")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // F4: rectangular gate + per-sample gate stats (one hash agg).
    "f04_rect_gate" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      FlowCyto.gateStats(
          li,
          FlowCyto.rectGate(col("l_quantity"), col("l_discount"), 10.0, 40.0, 0.02, 0.08),
          Seq("l_returnflag"))
        .orderBy("l_returnflag")
    }),

    // F5: polygon gate (codegen ray-cast Expression).
    "f05_poly_gate" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      FlowCyto.gateStats(
          li,
          FlowCyto.polyGate(col("l_quantity"), col("l_discount"), polyX, polyY),
          Seq("l_returnflag"))
        .orderBy("l_returnflag")
    }),

    // F6: per-sample channel summary stats. Quantiles over the integer
    // channel (interpolation lands on exact quarters — engine-proof),
    // moments over the continuous channel.
    // F17: automatic 1-D density gate (flowDensity/deGate-style): per
    // sample, a fixed 32-bin histogram of the channel (in cents, with
    // per-sample [lo, hi] range), 3-bin box smoothing, then the gate
    // threshold = left edge of the first smoothed-count VALLEY after
    // the main peak. Every step is integer arithmetic over the dense
    // 32-row-per-sample bin spine (windows run on bin-spine
    // cardinality, never events); the event scan is touched twice
    // — the per-sample [lo, hi]/count stats and the histogram
    // build; the below/above gate counts are whole-bin sums read off
    // the persisted spine (the gate sits on a bin edge), not a third
    // event pass.
    // F18: QUADRANT gating — the FlowJo two-channel quadrant stats,
    // with both thresholds set AUTOMATICALLY by f17's density-valley
    // rule (FlowCyto.densityThreshold — the same deGate machinery,
    // factored for composition): per sample, channel X (price cents)
    // and channel Y (quantity) each get a valley threshold, and every
    // event lands in one of four quadrants by VALUE comparison
    // against the broadcast thresholds (value-space gating, so the
    // quadrant rule is engine-exact regardless of bin-edge rounding).
    // Integer counts, one event scan for the gating pass.
    "f18_quadrant_gate" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag"), col("l_linestatus"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("x"),
        col("l_quantity").cast("long").as("y"))
      val keys = Seq("l_returnflag", "l_linestatus")
      val tx = graft.operators.FlowCyto.densityThreshold(li, keys, "x")
        .withColumnRenamed("threshold", "tx")
      val ty = graft.operators.FlowCyto.densityThreshold(li, keys, "y")
        .withColumnRenamed("threshold", "ty")
      li.join(broadcast(tx), keys).join(broadcast(ty), keys)
        .groupBy(keys.map(col): _*)
        .agg(max("tx").as("tx"), max("ty").as("ty"),
          sum(when(col("x") < col("tx") && col("y") < col("ty"), 1L)
            .otherwise(0L)).as("n_ll"),
          sum(when(col("x") < col("tx") && col("y") >= col("ty"), 1L)
            .otherwise(0L)).as("n_lh"),
          sum(when(col("x") >= col("tx") && col("y") < col("ty"), 1L)
            .otherwise(0L)).as("n_hl"),
          sum(when(col("x") >= col("tx") && col("y") >= col("ty"), 1L)
            .otherwise(0L)).as("n_hh"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "f17_density_gate" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      val keys = Seq("l_returnflag", "l_linestatus")
      // stats (sample-cardinality) and the smoothed spine (32 rows ×
      // samples) are persisted: every downstream branch re-derived
      // the whole histogram chain otherwise (plan-audited: 12+ event
      // scans → the documented two). Verify/Bench clearCache between
      // queries (library contract).
      val stats = li.groupBy(keys.map(col): _*)
        .agg(min("cents").as("lo"), max("cents").as("hi"),
          count(lit(1)).as("n_events"))
        .persist()
      val binned = li.join(broadcast(stats), keys)
        .withColumn("bin", least(lit(31L),
          expr("((cents - lo) * 32) div (hi - lo + 1)")))
      val hist = binned.groupBy((keys.map(col) :+ col("bin")): _*)
        .agg(count(lit(1)).as("cnt"))
      val spine = stats.select((keys.map(col) :+
          explode(sequence(lit(0L), lit(31L))).as("bin")): _*)
        .join(hist, keys :+ "bin", "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      val wS = Window.partitionBy(keys.map(col): _*).orderBy("bin")
        .rowsBetween(-1, 1)
      val sm = spine.withColumn("sm", sum("cnt").over(wS)).persist()
      val wPeak = Window.partitionBy(keys.map(col): _*)
        .orderBy(col("sm").desc, col("bin"))
      val peak = sm.withColumn("pr", row_number().over(wPeak))
        .filter(col("pr") === 1)
        .select((keys.map(col) :+ col("bin").as("peak_bin")): _*)
      val wValley = Window.partitionBy(keys.map(col): _*)
        .orderBy(col("sm"), col("bin"))
      val valley = sm.join(broadcast(peak), keys)
        .filter(col("bin") > col("peak_bin"))
        .withColumn("vr", row_number().over(wValley))
        .filter(col("vr") === 1)
        .select((keys.map(col) :+ col("peak_bin") :+ col("bin").as("valley_bin")): _*)
      val gate = stats.join(valley, keys)
        .withColumn("threshold_cents",
          expr("lo + (valley_bin * (hi - lo + 1)) div 32"))
      // The gate sits on a bin EDGE, so below/above are exact sums of
      // whole-bin counts — read them off the persisted 32-row spine
      // instead of a third event scan.
      val counts = sm.select((keys.map(col) :+ col("bin") :+ col("cnt")): _*)
        .join(broadcast(gate.select((keys.map(col) :+ col("valley_bin")): _*)), keys)
        .groupBy(keys.map(col): _*)
        .agg(sum(when(col("bin") < col("valley_bin"), col("cnt")).otherwise(0L)).as("n_below"),
          sum(when(col("bin") >= col("valley_bin"), col("cnt")).otherwise(0L)).as("n_above"))
      gate.join(counts, keys)
        .select(col("l_returnflag"), col("l_linestatus"), col("n_events"),
          col("peak_bin"), col("valley_bin"), col("threshold_cents"),
          col("n_below"), col("n_above"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // F19: per-sample channel CORRELATION (the compensation-QC
    // metric: residual correlation between channels after
    // compensation means the spillover matrix is wrong — f16
    // estimates the coefficients, this audits the result): Pearson r
    // from the five exact DECIMAL(38,0)/HUGEINT integer sums in ONE
    // keyed aggregation — the moment sums are order-independent under
    // any partitioning, and the single final double formula runs in
    // a fixed op order both engines replay; zero-variance samples
    // report NULL (exact integer compare, not an epsilon). Half-up
    // 6 dp display.
    "f19_channel_corr" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("x", expr("CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))"))
        .withColumn("y", expr("CAST(l_quantity AS DECIMAL(38,0))"))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("n").cast("long").as("n_events"),
          when(col("n") * col("sxx") - col("sx") * col("sx") === 0 ||
               col("n") * col("syy") - col("sy") * col("sy") === 0,
            lit(null).cast("double"))
            .otherwise(
              floor((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
                / sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
                  * (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
                * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
            .as("pearson_r"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // F16: spillover coefficient ESTIMATION (the inverse of f03's
    // application): per single-stain control sample, the spill
    // coefficient is the regression-through-origin slope of the spill
    // channel on the primary channel, β = Σxy/Σx². Sums run as exact
    // DECIMAL(38,0) integer arithmetic (primary in cents) so the
    // distributed fold is order-independent and the oracle replays
    // it bit-for-bit; the single final division is reported half-up
    // at 6 dp in integer space. ONE keyed aggregation over the event
    // scan — the AutoSpill-lite matrix build.
    // F21: per-sample distribution DRIFT vs the pooled reference —
    // exact 1-Wasserstein / earth-mover distance between each
    // sample's channel histogram and the pooled global one on a shared
    // equal-width grid (the batch-effect / acquisition-drift QC a
    // cytometry core runs before pooling samples; Orlova 2016's EMD
    // recommendation). For 1-D histograms EMD = Σ_bins |ΔCDF|·width:
    // computed EXACTLY over the common denominator n_s·N — per-bin
    // diff c_s·N − c_g·n_s, partitioned running sum, Σ|cum| — so the
    // oracle replays it in HUGEINT with no normalization floats; the
    // single final division reports 6-dp half-up bin units. Shapes:
    // two keyed aggregates (map-side partials), a groups×bins grid
    // built by BROADCAST (histogram-sized, never fact-sized), and a
    // PARTITIONED window — the fact table is scanned twice, never
    // shuffled.
    "f21_hist_drift" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag"), col("l_linestatus"),
        expr("CAST(floor(l_quantity / 5) AS BIGINT)").as("bin"))
      val per = li.groupBy("l_returnflag", "l_linestatus", "bin")
        .agg(count(lit(1)).as("c"))
      val glob = li.groupBy("bin").agg(count(lit(1)).as("cg"))
      val ns = li.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("ns"))
      val nTot = li.agg(count(lit(1)).as("nn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag", "l_linestatus").orderBy("bin")
      ns.crossJoin(broadcast(glob))
        .join(per, Seq("l_returnflag", "l_linestatus", "bin"), "left")
        .na.fill(0L, Seq("c"))
        .crossJoin(broadcast(nTot))
        .withColumn("d",
          col("c").cast("decimal(38,0)") * col("nn").cast("decimal(38,0)") -
            col("cg").cast("decimal(38,0)") * col("ns").cast("decimal(38,0)"))
        .withColumn("cum", sum(col("d")).over(w))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(max(col("ns")).cast("long").as("n_events"),
          sum(abs(col("cum"))).as("sabs"),
          max(col("nn")).cast("long").as("nn2"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n_events"),
          expr("CAST((2000000 * sabs + n_events * nn2) div (2 * n_events * nn2) AS DOUBLE) / 1000000")
            .as("emd6"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // F22: per-sample Kolmogorov–Smirnov drift vs the pooled
    // reference — the classic two-sample QC next to f21's EMD (flowAI
    // flags acquisition drift with exactly this statistic): KS = sup
    // |F_s − F_pool| over the value ECDFs. Computed EXACTLY in
    // integer space: at every pooled jump point v, the numerator
    // |cum_s·N − cum_pool·n_s| is a DECIMAL(38,0) integer (both ECDFs
    // are step functions, so the sup is attained at a jump point and
    // the grid of pooled values covers every jump of both), and the
    // 6-dp statistic is the f21 half-up integer division — no floats
    // anywhere, HUGEINT-replayable. Grid = samples × distinct
    // values (histogram-sized, broadcast); one partitioned cumsum
    // window; never event×event.
    "f22_ks_drift" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag"), col("l_linestatus"),
        expr("CAST(floor(l_quantity) AS BIGINT)").as("v"))
      val per = li.groupBy("l_returnflag", "l_linestatus", "v")
        .agg(count(lit(1)).as("c"))
      val glob = li.groupBy("v").agg(count(lit(1)).as("cg"))
      val ns = li.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("ns"))
      val nTot = li.agg(count(lit(1)).as("nn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag", "l_linestatus").orderBy("v")
      ns.crossJoin(broadcast(glob))
        .join(per, Seq("l_returnflag", "l_linestatus", "v"), "left")
        .na.fill(0L, Seq("c"))
        .crossJoin(broadcast(nTot))
        .withColumn("cum_c", sum(col("c").cast("decimal(38,0)")).over(w))
        .withColumn("cum_g", sum(col("cg").cast("decimal(38,0)")).over(w))
        .withColumn("dnum", abs(col("cum_c") * col("nn").cast("decimal(38,0)") -
          col("cum_g") * col("ns").cast("decimal(38,0)")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(max(col("ns")).cast("long").as("n_events"),
          max(col("dnum")).as("dmax"),
          max(col("nn")).cast("long").as("nn2"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n_events"),
          expr("CAST((2000000 * dmax + n_events * nn2) div (2 * n_events * nn2) AS DOUBLE) / 1000000")
            .as("ks6"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // F23: automatic SINGLET gate — FlowJo's FSC-A vs FSC-H doublet
    // discrimination, auto-banded: a doublet carries ~2× the area at
    // the same height, so the area/height RATIO separates singlets;
    // the band is derived from the sample's OWN median ratio ±20%
    // (the flowDensity auto-gating idiom — no hand-tuned constants).
    // Channel mapping: l_extendedprice (area) / l_quantity (height).
    // The median is rounded to 4 dp FIRST (the proven percentile ↔
    // quantile_cont pairing), so the band edges are identical doubles
    // in both engines and the gate comparison can't straddle an ulp.
    // Per-sample medians broadcast back (groups-sized); the gate is a
    // narrow projection; singlet_frac is the half-up integer form.
    "f23_singlet_gate" -> ((s, dir) => {
      val e = t(s, dir, "lineitem").filter(col("l_quantity") > 0)
        .select(col("l_returnflag"), col("l_linestatus"),
          (col("l_extendedprice").cast("double") /
            col("l_quantity").cast("double")).as("r"))
      val med = e.groupBy("l_returnflag", "l_linestatus")
        .agg(round(percentile(col("r"), lit(0.5)), 4).as("med_ratio"))
      e.join(broadcast(med), Seq("l_returnflag", "l_linestatus"))
        .withColumn("s",
          when(col("r") >= lit(0.8) * col("med_ratio") &&
            col("r") <= lit(1.2) * col("med_ratio"), 1L).otherwise(0L))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_events"),
          sum(col("s")).as("n_singlets"),
          max(col("med_ratio")).as("med_ratio"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("n_events"), col("n_singlets"), col("med_ratio"),
          expr("CAST((20000 * n_singlets + n_events) div (2 * n_events) AS DOUBLE) / 10000")
            .as("singlet_frac"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // F24: STAIN INDEX — the panel-design / instrument-QC KPI
    // (Maecker & Trotter 2006): how separable is the stained
    // population from the unstained one, per sample — SI =
    // (MFI_pos − MFI_neg) / (2·rSD_neg), with medians as the MFIs
    // and the MAD-derived robust SD (1.4826·MAD, f12's estimator).
    // Populations are auto-split at the sample's own quantity median
    // (the f23 auto-banding idiom — no hand thresholds): pos = above
    // the median, neg = at/below. All medians run at full precision
    // through the proven percentile ↔ quantile_cont pairing (the f12
    // contract), rounded to 4 dp only at the output; the division is
    // identical doubles in both engines. Two groups-sized broadcast
    // joins + one aggregate — never event×event.
    "f24_stain_index" -> ((s, dir) => {
      val e = t(s, dir, "lineitem").select(
        col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("double").as("qty"),
        col("l_extendedprice").cast("double").as("price"))
      val keys = Seq("l_returnflag", "l_linestatus")
      val mq = e.groupBy(keys.map(col): _*)
        .agg(percentile(col("qty"), lit(0.5)).as("__mq"))
      val tg = e.join(broadcast(mq), keys)
        .withColumn("pos", col("qty") > col("__mq"))
      val mn = tg.filter(!col("pos")).groupBy(keys.map(col): _*)
        .agg(percentile(col("price"), lit(0.5)).as("__mn"))
      tg.join(broadcast(mn), keys)
        .groupBy(keys.map(col): _*)
        .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
          sum(when(col("pos"), 0L).otherwise(1L)).as("n_neg"),
          percentile(when(col("pos"), col("price")), lit(0.5)).as("__mp"),
          percentile(when(!col("pos"), col("price")), lit(0.5)).as("__mnn"),
          percentile(when(!col("pos"), abs(col("price") - col("__mn"))),
            lit(0.5)).as("__mad"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("n_pos"), col("n_neg"),
          round(col("__mp"), 4).as("med_pos"),
          round(col("__mnn"), 4).as("med_neg"),
          round(col("__mad") * lit(1.4826), 4).as("rsd_neg"),
          when(col("__mad") * lit(1.4826) * lit(2.0) > 0.0,
            round((col("__mp") - col("__mnn")) /
              (lit(2.0) * col("__mad") * lit(1.4826)), 4))
            .as("stain_index"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // F20: ELLIPSE (Mahalanobis) gate — the standard 2-D population
    // gate above rectangles/polygons: inside ⟺ Mahalanobis d² ≤ 6
    // (the χ²₂ ≈95% contour) against the sample's own (mean,
    // covariance). The comparison runs as a pure integer inequality
    // over n²-scaled central moments (see FlowCyto.ellipseGateStats)
    // — no division, no sqrt — so the oracle replays it bit-for-bit
    // in HUGEINT. Channels: price in DOLLARS (≤ ~1e5, keeping the
    // worst product ≲1e35 inside DECIMAL(38,0)/int128) × quantity.
    "f20_ellipse_gate" -> ((s, dir) => {
      FlowCyto.ellipseGateStats(
          t(s, dir, "lineitem"),
          expr("CAST(round(l_extendedprice) AS DECIMAL(38,0))"),
          expr("CAST(l_quantity AS DECIMAL(38,0))"),
          Seq("l_returnflag", "l_linestatus"), t2 = 6)
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "f16_spillover_fit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("x", expr("CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))"))
        .withColumn("y", expr("CAST(l_quantity AS DECIMAL(38,0))"))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          expr("CAST((2000000 * sxy + sxx) div (2 * sxx) AS DOUBLE) / 1000000")
            .as("beta6"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // F15: per-sample acquisition QC gate (flowAI/flowClean-style):
    // debris fraction (low-scatter analog: quantity ≤ 2), saturation
    // fraction (ADC-ceiling analog: quantity ≥ 49), channel extrema,
    // and a pass flag — thresholds (debris ≤ 20%, saturation ≤ 5%)
    // as integer cross-multiplications, fractions displayed half-up
    // 4dp in integer space. ONE keyed aggregation over the event
    // scan; the gate broadcast-joins back wherever samples are
    // filtered.
    "f15_sample_qc" -> ((s, dir) => {
      def r4(a: Column, b: Column): Column =
        floor((lit(20000L) * a + b).cast("double") / (b * lit(2L)).cast("double")) /
          lit(10000.0)
      val li = t(s, dir, "lineitem")
      val agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        count(lit(1)).as("n_events"),
        sum(when(col("l_quantity") <= 2, 1L).otherwise(0L)).as("debris_n"),
        sum(when(col("l_quantity") >= 49, 1L).otherwise(0L)).as("sat_n"),
        min(col("l_quantity").cast("long")).as("qty_min"),
        max(col("l_quantity").cast("long")).as("qty_max"),
        min(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("cents_min"),
        max(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("cents_max"))
      agg.select(col("l_returnflag"), col("l_linestatus"), col("n_events"),
          col("debris_n"), r4(col("debris_n"), col("n_events")).as("debris_frac"),
          col("sat_n"), r4(col("sat_n"), col("n_events")).as("sat_frac"),
          col("qty_min"), col("qty_max"), col("cents_min"), col("cents_max"),
          ((lit(5L) * col("debris_n") <= col("n_events")) &&
            (lit(20L) * col("sat_n") <= col("n_events"))).cast("int").as("qc_pass"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "f06_channel_stats" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("l_extendedprice")), 4).as("mean_price"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          round(percentile(col("l_quantity"), lit(0.25)), 4).as("q25_qty"),
          round(percentile(col("l_quantity"), lit(0.5)), 4).as("median_qty"),
          round(percentile(col("l_quantity"), lit(0.75)), 4).as("q75_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // F9: filter-style gating — keep only in-gate events, then
    // summarize. The PolygonGateBBoxRule derives a bounding-box
    // pre-filter here that reaches the parquet scan (row-group
    // pruning); the exact ray-cast runs only on surviving rows.
    "f09_gate_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(FlowCyto.polyGate(col("l_quantity"), col("l_discount"), polyX, polyY))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 2).as("gated_value"))
        .orderBy("l_returnflag")
    }),

    // F7: fixed-width histogram per sample key.
    "f07_histogram" -> ((s, dir) => {
      FlowCyto.histogram(
          t(s, dir, "lineitem"),
          col("l_extendedprice"), 0.0, 10000.0, Seq("l_returnflag"))
        .orderBy("l_returnflag", "bin")
    }),

    // F14: 2-D channel density — the dot-plot binning behind gate
    // views (joint quantity × discount grid per return flag). Integer
    // bin keys + counts → exact oracle.
    "f14_hist2d" -> ((s, dir) => {
      FlowCyto.histogram2d(
          t(s, dir, "lineitem"),
          col("l_quantity"), col("l_discount"),
          0.0, 5.0, 0.0, 0.02, Seq("l_returnflag"))
        .orderBy("l_returnflag", "x_bin", "y_bin")
    }),

    // F11: KLL sketch quantiles — the mergeable approximate twin of
    // f06's exact percentiles (a few KB of state per group at any n;
    // the 100 TB path). Sketch output is rank-approximate → no DuckDB
    // oracle; KllSpec bounds the rank error against the exact values.
    "f11_kll_quantiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n"),
          GraftFunctions.kll_quantiles(col("l_quantity"), 200, Seq(0.25, 0.5, 0.75))
            .as("qs"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          round(element_at(col("qs"), 1), 4).as("q25_qty"),
          round(element_at(col("qs"), 2), 4).as("median_qty"),
          round(element_at(col("qs"), 3), 4).as("q75_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // F12: robust channel stats — 10–90% trimmed mean + MAD of the
    // integer-valued quantity channel. Integer data keeps every
    // cutpoint/deviation dyadic (exact in IEEE), so the two engines'
    // differently-shaped interpolation formulas still agree.
    "f12_robust_stats" -> ((s, dir) => {
      FlowCyto.robustStats(t(s, dir, "lineitem"), col("l_quantity"),
          Seq("l_returnflag", "l_linestatus"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // F13: equi-depth histogram — KLL-derived bin edges (approximate
    // ranks → no cross-engine oracle); RobustStatsSpec bounds the
    // per-bin mass deviation instead.
    "f13_equidepth" -> ((s, dir) => {
      FlowCyto.equiDepthHistogram(
        t(s, dir, "lineitem"), col("l_extendedprice"), k = 10)
    }),

    // F8: FCS binary round-trip — write a deterministic fixture with
    // FcsSource.write, read it back through the binaryFile-based
    // parser, aggregate per-sample channel stats. Every value is a
    // half-integer < 500 from a closed-form formula, so the float32
    // DATA segment stores it exactly and the DuckDB oracle can
    // regenerate the identical values from range() without parsing FCS.
    "f08_fcs_roundtrip" -> ((s, dir) => {
      // per-invocation temp dir: a fixed global path let two
      // concurrent harness runs read each other's half-written
      // fixtures. The result is lazy, so the files must outlive this
      // builder — deleteOnExit (dir registered first = deleted last)
      // cleans up at JVM shutdown instead.
      val fix = java.nio.file.Files.createTempDirectory("graft_f08_").toFile
      fix.deleteOnExit()
      val chans = Seq("FSC_A", "SSC_A", "FL1_A")
      f08Samples.foreach { case (f, si, n) =>
        val rows = (0 until n).map(i =>
          Array.tabulate(chans.length)(j => f08Value(si, i, j)))
        val out = new java.io.File(fix, f)
        out.deleteOnExit()
        FcsSource.write(out.getPath, chans, rows)
      }
      FcsSource.read(s, fix.getPath)
        .withColumn("sample", element_at(split(col("file"), "/"), -1))
        .groupBy("sample")
        .agg(
          count(lit(1)).as("n_events"),
          round(sum("FSC_A"), 6).as("sum_fsc"), round(avg("FSC_A"), 6).as("mean_fsc"),
          min("FSC_A").as("min_fsc"), max("FSC_A").as("max_fsc"),
          round(sum("SSC_A"), 6).as("sum_ssc"), round(avg("SSC_A"), 6).as("mean_ssc"),
          round(sum("FL1_A"), 6).as("sum_fl1"), round(avg("FL1_A"), 6).as("mean_fl1"))
        .orderBy("sample")
    }),

    // F10: hierarchical gating — a 3-level gate tree evaluated in ONE
    // aggregate pass (see FlowCyto.gateTree).
    "f10_gate_tree" -> ((s, dir) => {
      FlowCyto.gateTree(t(s, dir, "lineitem"), f10Tree, Seq("l_returnflag"))
        .orderBy("l_returnflag", "path")
    })
  )

  /** f08 fixture: (file, sample index, events). */
  private val f08Samples = Seq(("sample_a.fcs", 0, 800), ("sample_b.fcs", 1, 1200))

  /** Half-integers < 500 — exactly representable in float32, and in
    * any partial-sum order below 2^53, so both engines agree bit-wise.
    */
  /** f17's density-valley threshold chain with prefixed CTE names so
    * f18 can replay it once per channel — ends in
    * `{p}gate(l_returnflag, l_linestatus, threshold)`; the unprefixed
    * f17 oracle text stays the pinned dashboard form.
    */
  private def densityChainSql(p: String, valueExpr: String): String =
    s"""${p}li AS (SELECT l_returnflag, l_linestatus, $valueExpr AS v FROM lineitem),
       | ${p}stats AS (SELECT l_returnflag, l_linestatus, min(v) AS lo,
       |    max(v) AS hi FROM ${p}li GROUP BY 1, 2),
       | ${p}binned AS (SELECT t.l_returnflag, t.l_linestatus,
       |    least(31, ((v - lo) * 32) // (hi - lo + 1)) AS bin
       |   FROM ${p}li t JOIN ${p}stats USING (l_returnflag, l_linestatus)),
       | ${p}hist AS (SELECT l_returnflag, l_linestatus, bin, count(*) AS cnt
       |   FROM ${p}binned GROUP BY 1, 2, 3),
       | ${p}spine AS (SELECT sb.l_returnflag, sb.l_linestatus, sb.bin,
       |    coalesce(h.cnt, 0) AS cnt
       |   FROM (SELECT l_returnflag, l_linestatus, unnest(range(0, 32)) AS bin
       |         FROM ${p}stats) sb
       |   LEFT JOIN ${p}hist h USING (l_returnflag, l_linestatus, bin)),
       | ${p}sm AS (SELECT *, sum(cnt) OVER (PARTITION BY l_returnflag, l_linestatus
       |    ORDER BY bin ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s
       |   FROM ${p}spine),
       | ${p}peak AS (SELECT l_returnflag, l_linestatus, bin AS peak_bin FROM
       |   (SELECT *, row_number() OVER (PARTITION BY l_returnflag, l_linestatus
       |      ORDER BY s DESC, bin) AS pr FROM ${p}sm) WHERE pr = 1),
       | ${p}valley AS (SELECT l_returnflag, l_linestatus, bin AS valley_bin FROM
       |   (SELECT sm2.l_returnflag, sm2.l_linestatus, sm2.bin, sm2.s,
       |      row_number() OVER (PARTITION BY sm2.l_returnflag, sm2.l_linestatus
       |        ORDER BY sm2.s, sm2.bin) AS vr
       |    FROM ${p}sm sm2 JOIN ${p}peak pk USING (l_returnflag, l_linestatus)
       |    WHERE bin > peak_bin) WHERE vr = 1),
       | ${p}gate AS (SELECT s.l_returnflag, s.l_linestatus,
       |    lo + (valley_bin * (hi - lo + 1)) // 32 AS threshold
       |   FROM ${p}stats s JOIN ${p}valley USING (l_returnflag, l_linestatus))""".stripMargin

  private def f08Value(s: Int, i: Int, j: Int): Double =
    ((i * 37 + j * 101 + s * 13) % 997) * 0.5

  /** f10 gate tree over (l_quantity, l_discount, l_extendedprice,
    * l_tax): mid_qty → {hi_price → low_tax, lo_price}.
    */
  private val f10Tree = Seq(
    FlowCyto.GateNode("mid_qty",
      FlowCyto.rectGate(col("l_quantity"), col("l_discount"), 5.0, 45.0, 0.0, 0.10),
      Seq(
        FlowCyto.GateNode("hi_price", col("l_extendedprice") >= 20000.0,
          Seq(FlowCyto.GateNode("low_tax", col("l_tax") <= 0.04))),
        FlowCyto.GateNode("lo_price", col("l_extendedprice") < 20000.0))))

  private def sqlDouble(d: Double): String = {
    val s = d.toString
    if (s.contains("E")) f"$d%.17f" else s
  }

  /** f02 oracle: the fixed-point logicle recurrence (LogicleFixedMath)
    * replayed in DuckDB. The constant pack — bit-product power tables,
    * p², 2^40/p, the outer coefficient, the edge values — is computed
    * ONCE here (same JVM that builds the Spark plan) and embedded as
    * literals, so both engines run the identical integer recurrence:
    * 10^(k/2^40) as a list_reduce product over set bits, (a·b) >> 40
    * per step (HUGEINT here, multiplyHigh there), and a 23-step
    * integer bisection on the 10^-6 display grid as a recursive CTE.
    * Every branch decision is an integer compare — bit-equal by
    * construction, unlike the float bisection whose pow() comparisons
    * sit inside the engines' 1-ulp libm disagreement.
    */
  private def logicleQ6Sql(xCol: String, t: Double, m: Double, w: Double): String = {
    import org.apache.spark.sql.graftx.LogicleFixedMath
    val c = LogicleFixedMath.consts(t, m, w)
    val S = LogicleFixedMath.S
    def tabList(tab: Array[Long]): String =
      tab.zipWithIndex.map { case (v, b) =>
        s"{'b': CAST($b AS BIGINT), 't': CAST($v AS HUGEINT)}"
      }.mkString("[", ", ", "]")
    // 10^(k/2^40) in S-scale: ordered bit-product, struct accumulator
    // (list_reduce needs a uniform element type; the b field rides
    // along unused in the accumulator).
    def expfp(kCol: String, tab: Array[Long]): String =
      s"list_reduce(list_prepend({'b': CAST(-1 AS BIGINT), 't': CAST($S AS HUGEINT)}, " +
        s"${tabList(tab)}), (la, le) -> {'b': le.b, " +
        s"'t': CASE WHEN (($kCol) >> le.b) & 1 = 1 THEN (la.t * le.t) >> 40 ELSE la.t END}).t"
    s"""WITH RECURSIVE inp AS (
       |  SELECT l_orderkey, l_linenumber,
       |    CAST(floor($xCol * ${sqlDouble(S.toDouble)}) AS HUGEINT) AS x_fp
       |  FROM lineitem),
       | bis AS (
       |  SELECT l_orderkey, l_linenumber, x_fp, CAST(0 AS BIGINT) AS it,
       |         CAST(0 AS BIGINT) AS lo, CAST(${c.mMicro} AS BIGINT) AS hi
       |  FROM inp WHERE x_fp > ${c.g0} AND x_fp < ${c.gM}
       |  UNION ALL
       |  SELECT l_orderkey, l_linenumber, x_fp, it + 1,
       |    CASE WHEN gm < x_fp THEN mid ELSE lo END AS lo,
       |    CASE WHEN gm < x_fp THEN hi ELSE mid END AS hi
       |  FROM (
       |   SELECT *, CASE WHEN innr >= 0 THEN (CAST(${c.tc} AS HUGEINT) * innr) >> 40
       |             ELSE -((CAST(${c.tc} AS HUGEINT) * (-innr)) >> 40) END AS gm
       |   FROM (
       |    SELECT *, va - ((CAST(${c.p2} AS HUGEINT) * vb) >> 40) + ${c.p2} - $S AS innr
       |    FROM (
       |     SELECT *, CASE WHEN k2 >= 0 THEN ${expfp("k2", c.tpos)}
       |               ELSE ${expfp("-k2", c.tneg)} END AS vb
       |     FROM (
       |      SELECT *, CASE WHEN v_fp >= 0 THEN ${expfp("v_fp", c.tpos)}
       |                ELSE ${expfp("-v_fp", c.tneg)} END AS va,
       |             CASE WHEN v_fp >= 0 THEN -((v_fp * ${c.invp}) >> 40)
       |             ELSE ((-v_fp) * ${c.invp}) >> 40 END AS k2
       |      FROM (
       |       SELECT *, mid * CAST($S AS HUGEINT) // 1000000 - ${c.wFp} AS v_fp
       |       FROM (SELECT *, (lo + hi) // 2 AS mid FROM bis WHERE it < 23))))))),
       | done AS (SELECT l_orderkey, l_linenumber,
       |            CAST(hi AS DOUBLE) / 1000000.0 AS logicle_price
       |          FROM bis WHERE it = 23),
       | edges AS (SELECT l_orderkey, l_linenumber,
       |             CASE WHEN x_fp <= ${c.g0} THEN 0.0
       |                  ELSE ${sqlDouble(c.mMicro / 1e6)} END AS logicle_price
       |           FROM inp WHERE x_fp <= ${c.g0} OR x_fp >= ${c.gM})
       |SELECT l_orderkey, l_linenumber, logicle_price
       |FROM (SELECT * FROM done UNION ALL SELECT * FROM edges)
       |ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  /** Compensation SQL shares the Scala-side inverse coefficients so
    * both engines run the identical multiply-add sequence.
    */
  private def compExpr(j: Int): String =
    s"round(l_quantity * ${sqlDouble(inv(0)(j))} + " +
      s"(l_discount * 100.0) * ${sqlDouble(inv(1)(j))} + " +
      s"(l_tax * 100.0) * ${sqlDouble(inv(2)(j))}, 4)"

  /** Half-plane (cross-product) test for the convex diamond gate. */
  private def polySql(xCol: String, yCol: String): String =
    polyX.indices.map { i =>
      val jn = (i + 1) % polyX.length
      val (x1, y1, x2, y2) = (polyX(i), polyY(i), polyX(jn), polyY(jn))
      s"((${sqlDouble(x2)} - ${sqlDouble(x1)}) * ($yCol - ${sqlDouble(y1)}) - " +
        s"(${sqlDouble(y2)} - ${sqlDouble(y1)}) * ($xCol - ${sqlDouble(x1)}) > 0)"
    }.mkString("(", " AND ", ")")

  val oracle: Map[String, String] = Map(
    "f02_logicle" -> logicleQ6Sql("l_extendedprice", 100000.0, 4.5, 0.5),

    "f01_arcsinh" ->
      """SELECT l_orderkey, l_linenumber,
        | round(ln(l_quantity/5.0 + sqrt((l_quantity/5.0)*(l_quantity/5.0) + 1.0)), 6) AS asinh_qty,
        | round(ln(l_extendedprice/150.0 + sqrt((l_extendedprice/150.0)*(l_extendedprice/150.0) + 1.0)), 6) AS asinh_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "f03_compensate" ->
      s"""SELECT l_orderkey, l_linenumber,
         | ${compExpr(0)} AS comp_qty,
         | ${compExpr(1)} AS comp_disc,
         | ${compExpr(2)} AS comp_tax
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // DuckDB integer sum() yields HUGEINT (int128) which the driver's
    // pandas frame hashes differently from Spark's int64 even when the
    // values are equal — cast every summed output column to BIGINT.
    "f04_rect_gate" ->
      """SELECT l_returnflag, count(*) AS n_total,
        | CAST(sum(CASE WHEN l_quantity >= 10.0 AND l_quantity < 40.0
        |       AND l_discount >= 0.02 AND l_discount < 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS n_gated,
        | CAST((sum(CASE WHEN l_quantity >= 10.0 AND l_quantity < 40.0
        |       AND l_discount >= 0.02 AND l_discount < 0.08 THEN 1 ELSE 0 END)
        |   * 1000000) // count(*) AS BIGINT) AS frac_gated_ppm
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "f05_poly_gate" ->
      s"""SELECT l_returnflag, count(*) AS n_total,
         | CAST(sum(CASE WHEN ${polySql("l_quantity", "l_discount")} THEN 1 ELSE 0 END) AS BIGINT) AS n_gated,
         | CAST((sum(CASE WHEN ${polySql("l_quantity", "l_discount")} THEN 1 ELSE 0 END)
         |   * 1000000) // count(*) AS BIGINT) AS frac_gated_ppm
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "f09_gate_filter" ->
      s"""SELECT l_returnflag, count(*) AS n,
         | round(sum(l_extendedprice), 2) AS gated_value
         |FROM lineitem
         |WHERE ${polySql("l_quantity", "l_discount")}
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // f18: the f17 chain replayed once per channel (prefixed CTEs),
    // quadrants by VALUE comparison against the two thresholds.
    "f18_quadrant_gate" ->
      s"""WITH ${densityChainSql("x_", "CAST(round(l_extendedprice * 100) AS BIGINT)")},
         | ${densityChainSql("y_", "CAST(l_quantity AS BIGINT)")},
         | ev AS (SELECT l_returnflag, l_linestatus,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
         |    CAST(l_quantity AS BIGINT) AS y FROM lineitem),
         | j AS (SELECT ev.*, gx.threshold AS tx, gy.threshold AS ty
         |   FROM ev JOIN x_gate gx USING (l_returnflag, l_linestatus)
         |   JOIN y_gate gy USING (l_returnflag, l_linestatus))
         |SELECT l_returnflag, l_linestatus,
         |  CAST(max(tx) AS BIGINT) AS tx, CAST(max(ty) AS BIGINT) AS ty,
         |  CAST(sum(CASE WHEN x < tx AND y < ty THEN 1 ELSE 0 END) AS BIGINT) AS n_ll,
         |  CAST(sum(CASE WHEN x < tx AND y >= ty THEN 1 ELSE 0 END) AS BIGINT) AS n_lh,
         |  CAST(sum(CASE WHEN x >= tx AND y < ty THEN 1 ELSE 0 END) AS BIGINT) AS n_hl,
         |  CAST(sum(CASE WHEN x >= tx AND y >= ty THEN 1 ELSE 0 END) AS BIGINT) AS n_hh
         |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // f17: identical dense-spine windows; `//` ≡ Spark `div`.
    "f17_density_gate" ->
      """WITH li AS (SELECT l_returnflag, l_linestatus,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
        | stats AS (SELECT l_returnflag, l_linestatus, min(cents) AS lo,
        |    max(cents) AS hi, count(*) AS n_events FROM li GROUP BY 1, 2),
        | binned AS (SELECT li.l_returnflag, li.l_linestatus,
        |    least(31, ((cents - lo) * 32) // (hi - lo + 1)) AS bin
        |   FROM li JOIN stats USING (l_returnflag, l_linestatus)),
        | hist AS (SELECT l_returnflag, l_linestatus, bin, count(*) AS cnt
        |   FROM binned GROUP BY 1, 2, 3),
        | spine AS (SELECT sb.l_returnflag, sb.l_linestatus, sb.bin,
        |    coalesce(h.cnt, 0) AS cnt
        |   FROM (SELECT l_returnflag, l_linestatus, unnest(range(0, 32)) AS bin
        |         FROM stats) sb
        |   LEFT JOIN hist h USING (l_returnflag, l_linestatus, bin)),
        | sm AS (SELECT *, sum(cnt) OVER (PARTITION BY l_returnflag, l_linestatus
        |    ORDER BY bin ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s
        |   FROM spine),
        | peak AS (SELECT l_returnflag, l_linestatus, bin AS peak_bin FROM
        |   (SELECT *, row_number() OVER (PARTITION BY l_returnflag, l_linestatus
        |      ORDER BY s DESC, bin) AS pr FROM sm) WHERE pr = 1),
        | valley AS (SELECT l_returnflag, l_linestatus, peak_bin, bin AS valley_bin FROM
        |   (SELECT sm.l_returnflag, sm.l_linestatus, sm.bin, sm.s, p.peak_bin,
        |      row_number() OVER (PARTITION BY sm.l_returnflag, sm.l_linestatus
        |        ORDER BY sm.s, sm.bin) AS vr
        |    FROM sm JOIN peak p USING (l_returnflag, l_linestatus)
        |    WHERE bin > peak_bin) WHERE vr = 1),
        | gate AS (SELECT s.l_returnflag, s.l_linestatus, s.n_events, s.lo, s.hi,
        |    v.peak_bin, v.valley_bin,
        |    lo + (valley_bin * (hi - lo + 1)) // 32 AS threshold_cents
        |   FROM stats s JOIN valley v USING (l_returnflag, l_linestatus)),
        | counts AS (SELECT b.l_returnflag, b.l_linestatus,
        |    sum(CASE WHEN bin < valley_bin THEN 1 ELSE 0 END) AS n_below,
        |    sum(CASE WHEN bin >= valley_bin THEN 1 ELSE 0 END) AS n_above
        |   FROM binned b JOIN gate USING (l_returnflag, l_linestatus)
        |   GROUP BY 1, 2)
        |SELECT g.l_returnflag, g.l_linestatus, n_events, peak_bin, valley_bin,
        |  threshold_cents, CAST(n_below AS BIGINT) AS n_below,
        |  CAST(n_above AS BIGINT) AS n_above
        |FROM gate g JOIN counts USING (l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,

    // f19: the same five HUGEINT moment sums; identical final double
    // op order (numerator / sqrt(varx · vary)); exact zero-variance
    // NULL guard.
    "f19_channel_corr" ->
      """WITH a AS (SELECT l_returnflag, l_linestatus,
        |    CAST(count(*) AS HUGEINT) AS n,
        |    sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sx,
        |    sum(CAST(l_quantity AS HUGEINT)) AS sy,
        |    sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
        |        * CAST(l_quantity AS HUGEINT)) AS sxy,
        |    sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
        |        * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sxx,
        |    sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)) AS syy
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n_events,
        |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
        |       ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
        |         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |           * CAST(n * syy - sy * sy AS DOUBLE))
        |         * 1000000.0 + 0.5) / 1000000.0
        |  END AS pearson_r
        |FROM a ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // f16: HUGEINT sums ≡ Spark DECIMAL(38,0) sums (both exact
    // integers); same half-up 6dp integer-space division.
    // f21: the common-denominator EMD replayed in HUGEINT — grid,
    // per-bin diff, running CDF sum and Σ|cum| are exact; only the
    // final 6-dp half-up division touches DOUBLE.
    "f21_hist_drift" ->
      """WITH li AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
        |    CAST(floor(l_quantity / 5) AS BIGINT) AS bin FROM lineitem),
        | per AS (SELECT rf, ls, bin, CAST(count(*) AS HUGEINT) AS c
        |   FROM li GROUP BY 1, 2, 3),
        | gbl AS (SELECT bin, CAST(count(*) AS HUGEINT) AS cg FROM li GROUP BY 1),
        | nsx AS (SELECT rf, ls, CAST(count(*) AS HUGEINT) AS ns FROM li GROUP BY 1, 2),
        | nnx AS (SELECT CAST(count(*) AS HUGEINT) AS nn FROM li),
        | grid AS (SELECT nsx.rf, nsx.ls, nsx.ns, g.bin, g.cg,
        |     coalesce(p.c, 0) AS c, nnx.nn
        |   FROM nsx CROSS JOIN gbl g CROSS JOIN nnx
        |   LEFT JOIN per p ON p.rf = nsx.rf AND p.ls = nsx.ls AND p.bin = g.bin),
        | cum AS (SELECT rf, ls, ns, nn,
        |    sum(c*nn - cg*ns) OVER (PARTITION BY rf, ls ORDER BY bin) AS cumv
        |   FROM grid)
        |SELECT rf AS l_returnflag, ls AS l_linestatus,
        |  CAST(max(ns) AS BIGINT) AS n_events,
        |  CAST((2000000 * sum(abs(cumv)) + max(ns) * max(nn))
        |       // (2 * max(ns) * max(nn)) AS DOUBLE) / 1000000 AS emd6
        |FROM cum GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // f24: the split, both medians, the MAD and the SI division
    // replayed with identical double op order (f12's
    // percentile ↔ quantile_cont contract, round-4 at output only).
    "f24_stain_index" ->
      """WITH e AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
        |    CAST(l_quantity AS DOUBLE) AS qty,
        |    CAST(l_extendedprice AS DOUBLE) AS price FROM lineitem),
        | mq AS (SELECT rf, ls, quantile_cont(qty, 0.5) AS mqv
        |   FROM e GROUP BY 1, 2),
        | tg AS (SELECT e.rf, e.ls, e.price, e.qty > mq.mqv AS pos
        |   FROM e JOIN mq ON e.rf = mq.rf AND e.ls = mq.ls),
        | mn AS (SELECT rf, ls, quantile_cont(price, 0.5) AS mnv
        |   FROM tg WHERE NOT pos GROUP BY 1, 2),
        | ag AS (SELECT tg.rf, tg.ls,
        |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
        |    quantile_cont(CASE WHEN pos THEN price END, 0.5) AS mp,
        |    quantile_cont(CASE WHEN NOT pos THEN price END, 0.5) AS mnn,
        |    quantile_cont(CASE WHEN NOT pos THEN abs(price - mn.mnv) END, 0.5)
        |      AS madn
        |   FROM tg JOIN mn ON tg.rf = mn.rf AND tg.ls = mn.ls
        |   GROUP BY 1, 2)
        |SELECT rf AS l_returnflag, ls AS l_linestatus, n_pos, n_neg,
        |  round(mp, 4) AS med_pos, round(mnn, 4) AS med_neg,
        |  round(madn * 1.4826, 4) AS rsd_neg,
        |  CASE WHEN madn * 1.4826 * 2.0 > 0.0 THEN
        |    round((mp - mnn) / (2.0 * madn * 1.4826), 4) END AS stain_index
        |FROM ag ORDER BY 1, 2""".stripMargin,

    // f22: the exact KS replay in HUGEINT — two cumsums per sample
    // over the pooled value grid, the max |cum_s·N − cum_g·n_s|
    // numerator, f21's half-up 6-dp division.
    "f22_ks_drift" ->
      """WITH li AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
        |    CAST(floor(l_quantity) AS BIGINT) AS v FROM lineitem),
        | per AS (SELECT rf, ls, v, CAST(count(*) AS HUGEINT) AS c
        |   FROM li GROUP BY 1, 2, 3),
        | gbl AS (SELECT v, CAST(count(*) AS HUGEINT) AS cg FROM li GROUP BY 1),
        | nsx AS (SELECT rf, ls, CAST(count(*) AS HUGEINT) AS ns FROM li GROUP BY 1, 2),
        | nnx AS (SELECT CAST(count(*) AS HUGEINT) AS nn FROM li),
        | grid AS (SELECT nsx.rf, nsx.ls, nsx.ns, g.v, g.cg,
        |     coalesce(p.c, 0) AS c, nnx.nn
        |   FROM nsx CROSS JOIN gbl g CROSS JOIN nnx
        |   LEFT JOIN per p ON p.rf = nsx.rf AND p.ls = nsx.ls AND p.v = g.v),
        | cum AS (SELECT rf, ls, ns, nn,
        |    abs(sum(c) OVER w * nn - sum(cg) OVER w * ns) AS dnum
        |   FROM grid WINDOW w AS (PARTITION BY rf, ls ORDER BY v))
        |SELECT rf AS l_returnflag, ls AS l_linestatus,
        |  CAST(max(ns) AS BIGINT) AS n_events,
        |  CAST((2000000 * max(dnum) + max(ns) * max(nn))
        |       // (2 * max(ns) * max(nn)) AS DOUBLE) / 1000000 AS ks6
        |FROM cum GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // f23: the auto singlet band replayed — the proven percentile ↔
    // quantile_cont pairing rounded to 4 dp BEFORE the band edges,
    // identical double comparisons, half-up fraction.
    "f23_singlet_gate" ->
      """WITH e AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
        |    CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE) AS r
        |  FROM lineitem WHERE l_quantity > 0),
        | med AS (SELECT rf, ls, round(quantile_cont(r, 0.5), 4) AS med_ratio
        |   FROM e GROUP BY 1, 2),
        | g AS (SELECT e.rf, e.ls, med.med_ratio,
        |    CASE WHEN e.r >= 0.8 * med.med_ratio
        |          AND e.r <= 1.2 * med.med_ratio THEN 1 ELSE 0 END AS s
        |   FROM e JOIN med ON e.rf = med.rf AND e.ls = med.ls)
        |SELECT rf AS l_returnflag, ls AS l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(s) AS BIGINT) AS n_singlets,
        |  max(med_ratio) AS med_ratio,
        |  CAST((20000 * sum(s) + count(*)) // (2 * count(*)) AS DOUBLE) / 10000
        |    AS singlet_frac
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // f20: the integer Mahalanobis inequality replayed in HUGEINT —
    // moments, D, and the per-event quadratic form are exact, so any
    // drift in the moment algebra or the gate comparison is a value
    // diff, not a tolerance.
    "f20_ellipse_gate" ->
      """WITH li AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
        |    CAST(round(l_extendedprice) AS HUGEINT) AS x,
        |    CAST(l_quantity AS HUGEINT) AS y FROM lineitem),
        | g AS (SELECT rf, ls, CAST(count(*) AS HUGEINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
        |    sum(y*y) AS syy, sum(x*y) AS sxy
        |  FROM li GROUP BY 1, 2),
        | m AS (SELECT rf, ls, n, sx, sy,
        |    n*sxx - sx*sx AS mxx, n*syy - sy*sy AS myy,
        |    n*sxy - sx*sy AS mxy FROM g),
        | q AS (SELECT li.rf, li.ls,
        |    CASE WHEN (mxx*myy - mxy*mxy) > 0 AND
        |      myy*(n*x - sx)*(n*x - sx)
        |        - 2*mxy*(n*x - sx)*(n*y - sy)
        |        + mxx*(n*y - sy)*(n*y - sy) <= 6 * (mxx*myy - mxy*mxy)
        |      THEN 1 ELSE 0 END AS ins
        |  FROM li JOIN m USING (rf, ls))
        |SELECT rf AS l_returnflag, ls AS l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(ins) AS BIGINT) AS n_in,
        |  CAST((2000000 * sum(ins) + count(*)) // (2 * count(*)) AS DOUBLE)
        |    / 1000000 AS share6
        |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "f16_spillover_fit" ->
      """WITH a AS (SELECT l_returnflag, l_linestatus, count(*) AS n,
        |    sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
        |        * CAST(l_quantity AS HUGEINT)) AS sxy,
        |    sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
        |        * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sxx
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag, l_linestatus, n,
        |  CAST((2000000 * sxy + sxx) // (2 * sxx) AS DOUBLE) / 1000000 AS beta6
        |FROM a ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // f15: identical integer thresholds and half-up 4dp fractions.
    "f15_sample_qc" ->
      """WITH a AS (SELECT l_returnflag, l_linestatus,
        |    count(*) AS n_events,
        |    sum(CASE WHEN l_quantity <= 2 THEN 1 ELSE 0 END) AS debris_n,
        |    sum(CASE WHEN l_quantity >= 49 THEN 1 ELSE 0 END) AS sat_n,
        |    min(CAST(l_quantity AS BIGINT)) AS qty_min,
        |    max(CAST(l_quantity AS BIGINT)) AS qty_max,
        |    min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents_min,
        |    max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents_max
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag, l_linestatus, n_events,
        |  CAST(debris_n AS BIGINT) AS debris_n,
        |  CAST((20000*debris_n + n_events) // (2*n_events) AS DOUBLE)/10000 AS debris_frac,
        |  CAST(sat_n AS BIGINT) AS sat_n,
        |  CAST((20000*sat_n + n_events) // (2*n_events) AS DOUBLE)/10000 AS sat_frac,
        |  qty_min, qty_max, cents_min, cents_max,
        |  CASE WHEN 5*debris_n <= n_events AND 20*sat_n <= n_events
        |       THEN 1 ELSE 0 END AS qc_pass
        |FROM a ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "f06_channel_stats" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(avg(l_extendedprice), 4) AS mean_price,
        | round(stddev_samp(l_extendedprice), 4) AS sd_price,
        | round(quantile_cont(l_quantity, 0.25), 4) AS q25_qty,
        | round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        | round(quantile_cont(l_quantity, 0.75), 4) AS q75_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "f12_robust_stats" ->
      """WITH cut AS (SELECT l_returnflag, l_linestatus,
        |    quantile_cont(l_quantity, 0.10) AS qlo,
        |    quantile_cont(l_quantity, 0.90) AS qhi,
        |    quantile_cont(l_quantity, 0.50) AS med
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |SELECT l.l_returnflag, l.l_linestatus, count(*) AS n,
        |  round(avg(CASE WHEN l_quantity BETWEEN qlo AND qhi
        |    THEN l_quantity END), 4) AS trimmed_mean,
        |  round(quantile_cont(abs(l_quantity - med), 0.5), 4) AS mad
        |FROM lineitem l
        |JOIN cut c ON l.l_returnflag = c.l_returnflag
        |  AND l.l_linestatus = c.l_linestatus
        |GROUP BY l.l_returnflag, l.l_linestatus
        |ORDER BY l.l_returnflag, l.l_linestatus""".stripMargin,

    "f14_hist2d" ->
      """SELECT l_returnflag,
        | CAST(floor((l_quantity - 0.0) / 5.0) AS BIGINT) AS x_bin,
        | CAST(floor((l_discount - 0.0) / 0.02) AS BIGINT) AS y_bin,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, x_bin, y_bin
        |ORDER BY l_returnflag, x_bin, y_bin""".stripMargin,

    "f07_histogram" ->
      """SELECT l_returnflag,
        | CAST(floor((l_extendedprice - 0.0) / 10000.0) AS BIGINT) AS bin,
        | count(*) AS n, round(sum(l_extendedprice), 2) AS mass
        |FROM lineitem GROUP BY l_returnflag, bin
        |ORDER BY l_returnflag, bin""".stripMargin,

    // f08: regenerate the fixture values from the same closed-form
    // formula (no FCS parsing needed — the float32 round-trip is exact
    // for half-integers < 500) and aggregate identically.
    "f08_fcs_roundtrip" -> {
      def ch(j: Int): String =
        s"CAST((r.range * 37 + $j * 101 + p.s * 13) % 997 AS DOUBLE) * 0.5"
      val maxN = f08Samples.map(_._3).max
      val vals = f08Samples
        .map { case (f, si, n) => s"('$f', $si, $n)" }.mkString(", ")
      s"""WITH p AS (SELECT * FROM (VALUES $vals) t(sample, s, n)),
         | e AS (SELECT p.sample, ${ch(0)} AS fsc, ${ch(1)} AS ssc, ${ch(2)} AS fl1
         |       FROM p, range(0, $maxN) r WHERE r.range < p.n)
         |SELECT sample, count(*) AS n_events,
         | round(sum(fsc), 6) AS sum_fsc, round(avg(fsc), 6) AS mean_fsc,
         | min(fsc) AS min_fsc, max(fsc) AS max_fsc,
         | round(sum(ssc), 6) AS sum_ssc, round(avg(ssc), 6) AS mean_ssc,
         | round(sum(fl1), 6) AS sum_fl1, round(avg(fl1), 6) AS mean_fl1
         |FROM e GROUP BY sample ORDER BY sample""".stripMargin
    },

    // f10: same tree as nested CASE conjunctions, one aggregate pass
    // then a per-node UNION over the wide row — mirrors gateTree's
    // agg+explode. Counts cast to BIGINT (DuckDB sum() is HUGEINT).
    "f10_gate_tree" -> {
      val gA = "l_quantity >= 5.0 AND l_quantity < 45.0 AND l_discount >= 0.0 AND l_discount < 0.1"
      val gB = "l_extendedprice >= 20000.0"
      val gC = "l_tax <= 0.04"
      val gD = "l_extendedprice < 20000.0"
      def cnt(conds: String*): String =
        s"CAST(sum(CASE WHEN ${conds.mkString("(", ") AND (", ")")} THEN 1 ELSE 0 END) AS BIGINT)"
      s"""WITH agg AS (SELECT l_returnflag, count(*) AS n_total,
         |  ${cnt(gA)} AS n0, ${cnt(gA, gB)} AS n1,
         |  ${cnt(gA, gB, gC)} AS n2, ${cnt(gA, gD)} AS n3
         | FROM lineitem GROUP BY l_returnflag),
         | nodes AS (
         |  SELECT l_returnflag, 'mid_qty' AS path, 1 AS depth, n0 AS n, n_total AS n_parent FROM agg
         |  UNION ALL SELECT l_returnflag, 'mid_qty/hi_price', 2, n1, n0 FROM agg
         |  UNION ALL SELECT l_returnflag, 'mid_qty/hi_price/low_tax', 3, n2, n1 FROM agg
         |  UNION ALL SELECT l_returnflag, 'mid_qty/lo_price', 2, n3, n0 FROM agg)
         |SELECT l_returnflag, path, depth, n, n_parent,
         |  CASE WHEN n_parent > 0 THEN (n * 1000000) // n_parent END AS frac_of_parent_ppm
         |FROM nodes ORDER BY l_returnflag, path""".stripMargin
    }
  )
}
