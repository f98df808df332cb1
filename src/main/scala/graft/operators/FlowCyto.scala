package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Flow-cytometry domain operators, modeled on the capabilities of the
  * SD2E fcs-etl-reactor pipeline (channel scaling, spillover
  * compensation, gating, per-sample statistics) re-expressed as
  * narrow, codegen-friendly Spark projections/aggregations.
  *
  * Scale notes (100 TB): every per-event transform here is a narrow
  * projection — zero shuffle, stays inside whole-stage codegen. The
  * aggregating operators (gate stats, channel stats, histogram) are
  * single hash-aggregate passes with map-side partial aggregation, so
  * the shuffle carries only group keys × partial states.
  */
object FlowCyto {

  /** arcsinh channel scaling with per-channel cofactor — the standard
    * display/analysis transform for cytometry channels.
    */
  def arcsinhChannel(x: Column, cofactor: Double): Column =
    GraftFunctions.asinh_scaled(x, lit(cofactor))

  /** Spillover compensation. Given channel columns and a spillover
    * matrix S (row i = true signal i's bleed into each channel), the
    * compensated vector is `observed × S⁻¹`. The inverse is computed
    * once at plan time on the driver (channel count is tiny — a dim
    * constant) and unrolled into a literal multiply-add projection per
    * output channel: no shuffle, no UDF, pure codegen.
    */
  def compensate(df: DataFrame, channels: Seq[Column], spill: Array[Array[Double]],
                 outNames: Seq[String], round_ : Int = 4): DataFrame = {
    val inv = invert(spill)
    // compensated_j = Σ_i observed_i * inv(i)(j)
    val outCols = outNames.indices.map { j =>
      val c = channels.zipWithIndex
        .map { case (ch, i) => ch * lit(inv(i)(j)) }
        .reduce(_ + _)
      outNames(j) -> round(c, round_)
    }
    df.withColumns(outCols.toMap)
  }

  /** Gauss-Jordan inverse for the (tiny) spillover matrix. */
  private[graft] def invert(m: Array[Array[Double]]): Array[Array[Double]] = {
    val n = m.length
    val a = m.map(_.clone())
    val inv = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (col <- 0 until n) {
      // partial pivot
      var piv = col
      for (r <- col + 1 until n) if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tmpI = inv(col); inv(col) = inv(piv); inv(piv) = tmpI
      val d = a(col)(col)
      require(math.abs(d) > 1e-12, "spillover matrix is singular")
      for (j <- 0 until n) { a(col)(j) /= d; inv(col)(j) /= d }
      for (r <- 0 until n if r != col) {
        val f = a(r)(col)
        if (f != 0.0) for (j <- 0 until n) {
          a(r)(j) -= f * a(col)(j)
          inv(r)(j) -= f * inv(col)(j)
        }
      }
    }
    inv
  }

  /** Rectangular gate membership: lo <= x < hi on each axis. */
  def rectGate(x: Column, y: Column,
               xLo: Double, xHi: Double, yLo: Double, yHi: Double): Column =
    x >= xLo && x < xHi && y >= yLo && y < yHi

  /** Polygon gate membership (ray casting, codegen'd expression). */
  def polyGate(x: Column, y: Column, xs: Array[Double], ys: Array[Double]): Column =
    GraftFunctions.point_in_polygon(x, y, xs, ys)

  /** Per-group gate statistics: total events, gated events, fraction.
    * One hash aggregate — the gate predicate folds into a conditional
    * count, so no second pass / self-join. The fraction is reported in
    * exact integer parts-per-million (floor(gated*1e6/total)) rather
    * than a rounded double: two engines rounding the same double at 6
    * decimals can disagree on ties, integer division cannot.
    */
  def gateStats(df: DataFrame, gate: Column, groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(gate, 1L).otherwise(0L)).as("n_gated"))
      .withColumn("frac_gated_ppm", expr("(n_gated * 1000000) div n_total"))

  /** A node in a hierarchical gating tree: a named gate applied to the
    * population selected by its parent (cytometry's sequential gating —
    * e.g. cells → live → CD3+ → CD4+).
    */
  case class GateNode(name: String, gate: Column, children: Seq[GateNode] = Nil)

  /** Hierarchical gate-tree statistics (F10). Membership in a node is
    * the conjunction of every gate on its root path, so the counts for
    * ALL nodes fold into ONE hash-aggregate pass over the events (one
    * conditional sum per node); a per-group explode of a literal node
    * array then fans the wide aggregate row out to one row per
    * (group, node). At 100 TB this reads the fact table exactly once,
    * shuffles only group keys × (|nodes|+1) partial counters, and
    * never joins.
    *
    * Output per (group, node): `path` (root/…/name), `depth`, `n`
    * (events in the node), `n_parent` (events in the parent population
    * — the whole group for a root), and `frac_of_parent_ppm` as exact
    * integer parts-per-million (two engines rounding the same double
    * can disagree on ties; integer division cannot).
    */
  def gateTree(df: DataFrame, roots: Seq[GateNode], groupCols: Seq[String]): DataFrame = {
    def flatten(n: GateNode, parentPath: String, parentGate: Option[Column],
                depth: Int): Seq[(String, Int, Column, String)] = {
      val path = if (parentPath.isEmpty) n.name else s"$parentPath/${n.name}"
      val conj = parentGate.map(_ && n.gate).getOrElse(n.gate)
      (path, depth, conj, parentPath) +:
        n.children.flatMap(flatten(_, path, Some(conj), depth + 1))
    }
    val nodes = roots.flatMap(flatten(_, "", None, 1))
    require(nodes.map(_._1).distinct.size == nodes.size, "duplicate gate path")
    val aggCols = count(lit(1)).as("__n_total") +:
      nodes.zipWithIndex.map { case ((_, _, conj, _), i) =>
        sum(when(conj, 1L).otherwise(0L)).as(s"__n_$i")
      }
    val wide = df.groupBy(groupCols.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
    val idxOf = nodes.map(_._1).zipWithIndex.toMap
    val nodeRows = nodes.zipWithIndex.map { case ((path, depth, _, parentPath), i) =>
      val parentN = if (parentPath.isEmpty) col("__n_total") else col(s"__n_${idxOf(parentPath)}")
      struct(lit(path).as("path"), lit(depth).as("depth"),
        col(s"__n_$i").as("n"), parentN.as("n_parent"))
    }
    wide
      .select(groupCols.map(col) :+ explode(array(nodeRows: _*)).as("node"): _*)
      .select(groupCols.map(col) ++ Seq(
        col("node.path").as("path"), col("node.depth").as("depth"),
        col("node.n").as("n"), col("node.n_parent").as("n_parent")): _*)
      .withColumn("frac_of_parent_ppm",
        when(col("n_parent") > 0, expr("(n * 1000000) div n_parent")))
  }

  /** Per-sample per-channel summary statistics (count, mean, sd,
    * median, quartiles). Exact percentiles — at 100 TB you'd flip the
    * `exact` flag to use approx_percentile's fixed-size sketch instead
    * of the sort-based exact aggregate.
    */
  def channelStats(df: DataFrame, channel: Column, groupCols: Seq[String],
                   exact: Boolean = true): DataFrame = {
    def pct(p: Double): Column =
      if (exact) percentile(channel, lit(p)) else percentile_approx(channel, lit(p), lit(10000))
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        round(avg(channel), 4).as("mean"),
        round(stddev_samp(channel), 4).as("sd"),
        round(pct(0.25), 4).as("q25"),
        round(pct(0.5), 4).as("median"),
        round(pct(0.75), 4).as("q75"))
  }

  /** Fixed-width histogram of a channel: bin index + count + mass.
    * floor((x - origin)/width) is a narrow projection; the bin
    * aggregate shuffles only (group, bin) keys.
    */
  def histogram(df: DataFrame, channel: Column, origin: Double, width: Double,
                groupCols: Seq[String]): DataFrame = {
    val bin = floor((channel - lit(origin)) / lit(width)).cast("long").as("bin")
    val keys = groupCols.map(col) :+ bin.asInstanceOf[Column]
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        round(sum(channel), 2).as("mass"))
  }

  /** F14 — 2-D channel density (the dot-plot / pseudocolor binning
    * behind every cytometry gate view): joint (x_bin, y_bin) counts on
    * a fixed grid. One keyed aggregation — the bin pair is the
    * shuffle key, so density at any event count is a linear job.
    */
  def histogram2d(df: DataFrame, x: Column, y: Column,
                  xOrigin: Double, xWidth: Double,
                  yOrigin: Double, yWidth: Double,
                  groupCols: Seq[String]): DataFrame = {
    val xb = floor((x - lit(xOrigin)) / lit(xWidth)).cast("long").as("x_bin")
    val yb = floor((y - lit(yOrigin)) / lit(yWidth)).cast("long").as("y_bin")
    val keys = groupCols.map(col) ++ Seq(xb.asInstanceOf[Column], yb)
    df.groupBy(keys: _*).agg(count(lit(1)).as("n"))
  }

  /** F12 — robust channel statistics (cytometry convention: outlier
    * events — doublets, debris — wreck mean/sd, so robust variants are
    * reported): trimmed mean over the [pLo, pHi] quantile band and MAD
    * (median absolute deviation, the robust spread estimator behind
    * flow's rSD ≈ 1.4826·MAD).
    *
    * Shape: two aggregate passes — cutpoints (qLo/qHi/median) per
    * group, broadcast back onto the facts, then one aggregate for the
    * band mean and |x−median| median. The fact table is scanned twice
    * but shuffles only group keys both times; the cutpoint table is
    * group-cardinality (dim-sized, broadcast). Exact percentiles
    * buffer each group's values on one task — the price of exact
    * robust stats; `kll_quantiles` (F11) is the sketch path when
    * approximate cutpoints are acceptable.
    */
  /** F13 — equi-depth histogram: `k` bins of ~equal mass. Bin edges
    * come from one KLL sketch pass (mergeable, a few KB of state —
    * not an exact sort); bin membership is then a k−1-comparison
    * codegen'd projection and the counts one keyed aggregate. Two
    * linear passes total at any scale. Bin populations deviate from
    * n/k only by the sketch's rank error (~1.65% at kllK=200).
    */
  def equiDepthHistogram(df: DataFrame, channel: Column, k: Int,
                         kllK: Int = 200): DataFrame = {
    require(k >= 2)
    val probs = (1 until k).map(_.toDouble / k)
    val edges = df.agg(
        GraftFunctions.kll_quantiles(channel, kllK, probs).as("e"))
      .head().getSeq[Double](0)
    val bin = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(channel > lit(e), 1).otherwise(0)
    }
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(channel), 4).as("lo"),
        round(max(channel), 4).as("hi"))
      .orderBy("bin")
  }

  /** f17's automatic density-gate THRESHOLD as a reusable piece (the
    * flowDensity/deGate valley rule: 32-bin histogram over the
    * per-sample [lo, hi] range → 3-bin box smoothing → the GLOBAL
    * MINIMUM smoothed bin strictly after the main peak (ties broken
    * toward the lower bin), threshold on that bin's left edge) —
    * returns one (keys, threshold) row per sample for composition
    * (f18 crosses two channels' thresholds into quadrants; f17 stays
    * the full per-channel dashboard). All integer; two scans of
    * `events` (stats + binning) like f17, spine windows are
    * 32-row-per-sample relations.
    *
    * A sample whose peak lands in the LAST bin has no post-peak bin
    * and produces NO output row (the valley join is inner) — callers
    * composing by inner join (f18) therefore drop such samples, and
    * any oracle replaying this formula drops them identically. This
    * is deliberate: a monotone-increasing density has no valley, so
    * no deGate threshold exists for it.
    *
    * `valueCol` must be an integral column; callers quantize floats
    * upstream (cents) so the bin arithmetic is exact cross-engine.
    */
  def densityThreshold(events: DataFrame, keys: Seq[String],
                       valueCol: String, bins: Int = 32): DataFrame = {
    val v = col(valueCol)
    val keyCols = keys.map(col)
    val stats = events.groupBy(keyCols: _*)
      .agg(min(v).as("lo"), max(v).as("hi"))
    val hist = events.join(broadcast(stats), keys)
      .withColumn("bin", least(lit(bins - 1L),
        expr(s"(($valueCol - lo) * $bins) div (hi - lo + 1)")))
      .groupBy((keyCols :+ col("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
    val spine = stats.select((keyCols :+
        explode(sequence(lit(0L), lit(bins - 1L))).as("bin")): _*)
      .join(hist, keys :+ "bin", "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*).orderBy("bin").rowsBetween(-1, 1)
    val sm = spine.withColumn("sm", sum("cnt").over(wS))
      .persist() // read by peak and valley; Verify/Bench clearCache contract
    val wPeak = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*).orderBy(col("sm").desc, col("bin"))
    val peak = sm.withColumn("pr", row_number().over(wPeak))
      .filter(col("pr") === 1)
      .select((keyCols :+ col("bin").as("peak_bin")): _*)
    val wValley = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*).orderBy(col("sm"), col("bin"))
    val valley = sm.join(broadcast(peak), keys)
      .filter(col("bin") > col("peak_bin"))
      .withColumn("vr", row_number().over(wValley))
      .filter(col("vr") === 1)
      .select((keyCols :+ col("bin").as("valley_bin")): _*)
    stats.join(valley, keys)
      .select((keyCols :+
        expr(s"lo + (valley_bin * (hi - lo + 1)) div $bins").as("threshold")): _*)
  }

  /** F20 — ELLIPSE (Mahalanobis) gate per sample group: the standard
    * 2-D flow-cytometry gate after rectangles/polygons (FlowJo/
    * GatingML's ellipsoid gate) — an event is inside when its
    * Mahalanobis distance² to the group's (mean, covariance) is ≤
    * `t2` (t2 = 6 ≈ the χ²₂ 95% contour for a Gaussian population).
    *
    * EXACT integer arithmetic end to end (the f16/f19 DECIMAL(38,0)
    * discipline): with per-group integer sums n, sx, sy, sxx, syy,
    * sxy, the scaled central moments are mxx = n·sxx − sx², myy, mxy
    * (= n²·covariance), D = mxx·myy − mxy² (≥ 0 by Cauchy–Schwarz)
    * and, for an event, dx = n·x − sx, dy = n·y − sy (= n²·centered
    * coords): d² ≤ t2 ⟺ myy·dx² − 2·mxy·dx·dy + mxx·dy² ≤ t2·D —
    * a pure integer comparison, no division, no square root, so the
    * oracle replays it bit-for-bit in HUGEINT. Degenerate groups
    * (D = 0: fewer than 2 distinct points or exactly collinear
    * channels) gate NOTHING inside, both engines alike.
    *
    * HEADROOM CONTRACT (exact, per group): every term is CENTRAL —
    * dx = n·(x − mean) and myy = n²·var(y) carry channel DEVIATION,
    * never absolute magnitude — so with s = max per-group |channel −
    * mean| (bounded by the group's spread max−min) the worst
    * magnitude is |t2·D| ≤ 6·n⁴·s⁴, and DECIMAL(38,0) requires
    * n·s ≲ 2·10⁹: a 1e5-spread channel tolerates ~2·10⁴ events per
    * group, a 1e3 spread ~2·10⁶. Larger groups must pre-scale the
    * channel (integer-divide before gating — the gate is
    * scale-covariant up to the division's rounding) or sub-sample.
    * The bound is ENFORCED: the same moment pass carries per-group
    * min/max, and a group over the line fails with a named
    * raise_error stating the contract — never a bare ANSI overflow
    * deep in codegen, and never a silent wrap.
    *
    * Scale shape: one keyed aggregate for the moments (map-side
    * partials, group-sized result), then the gate pass re-reads the
    * facts with the moments BROADCAST — the fact table never
    * shuffles, the 100 TB cost is two linear scans (one with cache
    * locality if the caller persists).
    */
  def ellipseGateStats(df: DataFrame, x: Column, y: Column,
                       groupCols: Seq[String], t2: Int = 6): DataFrame = {
    val d = df.select(groupCols.map(col) :+
      x.cast("decimal(38,0)").as("__gx") :+ y.cast("decimal(38,0)").as("__gy"): _*)
    val g = d.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__gx")).as("__sx"), sum(col("__gy")).as("__sy"),
        sum(col("__gx") * col("__gx")).as("__sxx"),
        sum(col("__gy") * col("__gy")).as("__syy"),
        sum(col("__gx") * col("__gy")).as("__sxy"),
        (max(col("__gx")) - min(col("__gx"))).as("__spx"),
        (max(col("__gy")) - min(col("__gy"))).as("__spy"))
      .withColumn("__mxx", col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__myy", col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .withColumn("__mxy", col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__dt", col("__mxx") * col("__myy") - col("__mxy") * col("__mxy"))
    val dx = col("__n") * col("__gx") - col("__sx")
    val dy = col("__n") * col("__gy") - col("__sy")
    val qv = col("__myy") * dx * dx -
      lit(2).cast("decimal(38,0)") * col("__mxy") * dx * dy +
      col("__mxx") * dy * dy
    // headroom guard (see scaladoc): |t2·D| ≤ 6·n⁴·s⁴ fits
    // DECIMAL(38,0) iff n·s ≲ 2e9, s ≤ max channel spread
    val headroom = col("__n") * greatest(col("__spx"), col("__spy"))
    val inside = when(headroom > lit(2000000000L).cast("decimal(38,0)"),
      raise_error(concat(
        lit("ellipseGateStats: DECIMAL(38,0) headroom exceeded " +
          "(n * channel spread > 2e9; worst term is 6*n^4*s^4) — " +
          "pre-scale the channel or sub-sample the group; n*spread="),
        headroom.cast("string"))))
      .otherwise(col("__dt") > lit(0) &&
        qv <= lit(t2).cast("decimal(38,0)") * col("__dt"))
    d.join(broadcast(g), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(when(inside, 1L).otherwise(0L)).as("n_in"))
      .withColumn("share6",
        expr("CAST((2000000 * n_in + n_events) div (2 * n_events) AS DOUBLE) / 1000000"))
  }

  def robustStats(df: DataFrame, channel: Column, groupCols: Seq[String],
                  pLo: Double = 0.1, pHi: Double = 0.9): DataFrame = {
    val cuts = df.groupBy(groupCols.map(col): _*)
      .agg(
        percentile(channel, lit(pLo)).as("__qlo"),
        percentile(channel, lit(pHi)).as("__qhi"),
        percentile(channel, lit(0.5)).as("__med"))
    df.join(broadcast(cuts), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        round(avg(when(channel.between(col("__qlo"), col("__qhi")), channel)), 4)
          .as("trimmed_mean"),
        round(percentile(abs(channel - col("__med")), lit(0.5)), 4).as("mad"))
  }
}
