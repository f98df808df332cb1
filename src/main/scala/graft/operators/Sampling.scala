package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus sampling / splitting for training-data pipelines.
  *
  * Both operators are narrow projections + filters — no shuffle, no
  * driver-side state — so they compose with any scan at any scale.
  */
object Sampling {

  /** Deterministic hash split: a row lands in [0, 100) by a portable
    * 64-bit hash (fmix64) of its numeric id, so the same row always
    * lands in the same split across runs, machines, re-partitioning —
    * and across ENGINES (unlike xxhash64, fmix64 is replicable by the
    * DuckDB oracle and any downstream system, so a split made here can
    * be reproduced exactly outside Spark; rand()-based sampling can't
    * even survive a repartition).
    */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(graft.functions.GraftFunctions.fmix64(id.cast("long")), lit(buckets.toLong))

  /** (train, heldout) split at `trainPct` percent. */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int): (DataFrame, DataFrame) = {
    val b = hashBucket(col(idCol))
    (df.filter(b < trainPct), df.filter(b >= trainPct))
  }

  /** Sequential Poisson sampling priority (Ohlsson 1998): priority =
    * u / w with u uniform in [0,1) derived from the portable id hash.
    * Taking the m SMALLEST priorities yields a weighted
    * without-replacement sample where inclusion probability is
    * approximately proportional to `weight` (the estimator behind
    * PPS surveys; for training corpora: quality- or length-weighted
    * subsampling). Deterministic and engine-portable: u is
    * (fmix64(id) >>> 11) / 2^53 — a power-of-two division, exact in
    * IEEE — and priority is one correctly-rounded division, so the
    * DuckDB oracle reproduces every priority bit-for-bit.
    */
  def weightedPriority(id: Column, weight: Column): Column =
    (shiftrightunsigned(graft.functions.GraftFunctions.fmix64(id.cast("long")), 11)
      .cast("double") / lit(9007199254740992.0)) / weight.cast("double")

  /** Weighted top-m sample: the m smallest priorities. Plans as
    * TakeOrderedAndProject — per-partition heap + driver merge of m
    * rows, no global sort, no shuffle of the losers.
    *
    * Rows with weight ≤ 0 are excluded up front: they cannot be drawn
    * in A-ES weighted sampling, and dividing by a zero weight would
    * abort the query under ANSI mode (fuzz-harness finding).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, m: Int): DataFrame =
    df.filter(col(weightCol) > 0)
      .withColumn("priority", weightedPriority(col(idCol), col(weightCol)))
      .orderBy("priority", idCol)
      .limit(m)

  /** Per-stratum sampling fractions (e.g. language rebalancing):
    * keep row iff its id-hash bucket (of `denom`) falls under
    * fraction×denom for its stratum. Deterministic, single pass.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double], denom: Int = 10000): DataFrame = {
    val cut = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f * denom)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), denom).cast("double") < cut)
  }

  /** L36 — mixture resampling to a TARGET distribution (the data-
    * mixing step of corpus assembly, à la The Pile / DoReMi weights):
    * given target weights per stratum and a target corpus size, the
    * per-stratum keep rate is computed FROM the observed counts —
    * rate = min(1, targetN·w / n_stratum) — then applied as the same
    * deterministic id-hash filter as [[stratifiedSample]]. Strata
    * richer than their target share are thinned; poorer ones are kept
    * whole (rate capped at 1; no replication).
    *
    * Two passes over the data (count, filter) but the first reduces
    * to one row per stratum and broadcasts back — at 100 TB this is
    * a scan + a broadcast-joined scan, no wide shuffle. Every double
    * in the rate is derived from the same integers on both engines
    * (one mul, one div, one compare), so the oracle reproduces the
    * exact keep decision row-for-row.
    */
  def mixtureSample(df: DataFrame, idCol: String, stratumCol: String,
                    targetWeights: Map[String, Double], targetN: Long,
                    denom: Int = 10000): DataFrame = {
    val w = targetWeights.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val rates = df.groupBy(stratumCol)
      .agg(count(lit(1)).as("n_stratum"))
      .withColumn("keep_rate",
        least(lit(1.0), (w * lit(targetN.toDouble)) / col("n_stratum").cast("double")))
      .select(col(stratumCol), col("keep_rate"))
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(hashBucket(col(idCol), denom).cast("double") <
        col("keep_rate") * lit(denom.toDouble))
      .drop("keep_rate")
  }

  /** L123 — TEMPERATURE-scaled source mixing (the mT5/UniMax
    * α-sampling rule: sample stratum i with probability ∝ n_i^α,
    * α = 1/T — upweights small sources relative to proportional
    * sampling without letting one giant crawl dominate; Raffel et
    * al. 2020 §3.4.2, Chung et al. 2023). α is FIXED at 0.5 (T = 2,
    * the common default) because sqrt is the one power IEEE
    * guarantees correctly rounded — so the keep-rate doubles are
    * bit-identical on any engine when the op ORDER matches, which
    * the oracle replays exactly (including the left-fold summation
    * order of the normalizer, in sorted-stratum order).
    *
    * Per stratum: w_i = √n_i, W = Σw_i (sorted left fold), keep rate
    * r_i = min(1, targetN·w_i / (W·n_i)); a row keeps when its
    * portable id-hash bucket clears r_i — the d14 filter, so the
    * kept set replays on any engine and survives repartitioning.
    * Stratum counts come to the driver (stratum-count bounded — the
    * d14 broadcast class); scoring is a codegen'd literal when-chain,
    * zero extra shuffle beyond the count aggregate.
    */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
                        targetN: Long, denom: Int = 10000): DataFrame = {
    val st = coalesce(col(stratumCol).cast("string"), lit("?"))
    val counts = df.select(st.as("__s")).groupBy("__s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val ws = counts.map { case (s, n) => (s, n, math.sqrt(n.toDouble)) }
    val wsum = ws.foldLeft(0.0) { case (a, (_, _, w)) => a + w }
    val rateCol = ws.foldLeft(lit(0.0)) { case (acc, (s, n, w)) =>
      val r = math.min(1.0, (targetN.toDouble * w) / (wsum * n.toDouble))
      when(st === s, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), denom).cast("double") <
      rateCol * lit(denom.toDouble))
  }

  /** L124 — EPOCH-RECIPE upsampling (the "data recipe" materializer
    * behind every LLM mixture table: give each source a token budget
    * share, convert it to EPOCHS over that source — replicate whole
    * copies, hash-sample the fractional remainder, cap at a maximum
    * epoch count because repeating a tiny source 100× hurts more than
    * its share is worth; the LLaMA/Gopher-style recipe column
    * "epochs"). Budget = ONE corpus worth of units redistributed
    * EQUALLY across strata, so small sources upsample and giant ones
    * downsample — the redistribution is the point; epochs are kept in
    * exact integer MICRO-epochs (e6 = min(maxEpochs6, B·10⁶ div
    * (K·T_i))) so the whole recipe is BIGINT arithmetic any engine
    * replays bit-for-bit. A doc materializes ⌊e6/10⁶⌋ full copies
    * plus one more when its portable hash bucket clears e6 mod 10⁶ —
    * deterministic fractional epochs, the d10/d14 filter. Output rows
    * carry `copy` (0-based) and `epochs6`; a stratum with zero total
    * units has no defined epoch count and contributes nothing.
    * Shape: stratum-sized aggregates broadcast to a per-row explode —
    * the only data-sized work is writing the copies you asked for.
    */
  def epochUpsample(df: DataFrame, idCol: String, stratumCol: String,
                    unitCol: String, maxEpochs6: Long = 4000000L,
                    denom: Int = 1000000): DataFrame = {
    val st = coalesce(col(stratumCol).cast("string"), lit("?"))
    val d = df.withColumn("__s", st)
    val t = d.groupBy("__s").agg(
      sum(coalesce(col(unitCol).cast("long"), lit(0L))).as("__tok"))
    // budget and stratum count are ONE row — collect them (bounded by
    // construction) rather than cross-joining a 1-row frame into the
    // plan (a BroadcastNestedLoopJoin the plan audit rightly flags)
    val totRow = t.agg(sum("__tok"), count(lit(1))).collect()(0)
    // empty input: sum(...) is NULL and there is no recipe — return
    // the (empty) shape rather than NPE on getLong
    if (totRow.isNullAt(0) || totRow.getLong(1) == 0L)
      return d.drop("__s").withColumn("epochs6", lit(0L))
        .withColumn("copy", lit(0L)).limit(0)
    val num = totRow.getLong(0) * 1000000L
    val kk = totRow.getLong(1)
    // a stratum with zero total units has no defined epoch count and
    // contributes nothing (the oracle's WHERE tok > 0) — and under
    // ANSI mode an unguarded `div 0` would abort the whole query; kk
    // still counts EVERY stratum (the budget is split across all)
    val r = t.filter(col("__tok") > 0L)
      .withColumn("__e6",
        least(lit(maxEpochs6), expr(s"${num}L div (${kk}L * __tok)")))
      .select("__s", "__e6")
    d.join(broadcast(r), Seq("__s"))
      .withColumn("__copy",
        explode(sequence(lit(0L), expr("__e6 div 1000000"))))
      .filter(col("__copy") < expr("__e6 div 1000000") ||
        hashBucket(col(idCol), denom).cast("long") < expr("__e6 % 1000000"))
      .withColumn("epochs6", col("__e6"))
      .withColumn("copy", col("__copy"))
      .drop("__s", "__e6", "__copy")
  }

  /** L56 — per-group cap (the CCNet/Gopher per-domain cap): keep at
    * most `k` rows per group, chosen by PORTABLE hash order — a
    * deterministic uniform-without-replacement k-subset per group
    * that any engine (and any later rerun) selects identically. The
    * order key is the unsigned top-53 bits of fmix64(id)
    * (`>>> 11`, the d10 priority trick) so the Spark BIGINT sort and
    * the oracle's HUGEINT shift agree sign-free; distinct ids break
    * the (negligible) collision ties.
    *
    * One window over (group, hash): a linear shuffle on the group
    * key; a hot domain ranks inside its own partitions — nothing is
    * collected. Output keeps `rk` (1-based) so callers can tighten
    * the cap downstream without re-hashing.
    *
    * Null-id contract (both forms): a null id has no portable hash
    * identity, so null-id rows are EXCLUDED from the selection up
    * front. Without the explicit filter the two forms would diverge
    * — the window sorts null order keys first and keeps them, while
    * the heap aggregate skips null inputs (CurationOpsSpec pins the
    * agreement on a null-bearing corpus).
    */
  def perGroupCap(df: DataFrame, idCol: String, groupCol: String,
                  k: Int): DataFrame = {
    val hkey = shiftrightunsigned(
      graft.functions.GraftFunctions.fmix64(col(idCol).cast("long")), 11)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(hkey, col(idCol))
    df.filter(col(idCol).isNotNull)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Aggregate form of [[perGroupCap]]: the same deterministic
    * hash-ordered k-subset per group, selected by a bounded top-k
    * heap AGGREGATE (gx TopKPairsAgg) instead of a ranked window.
    *
    * To be precise about what this buys: the window form is NOT the
    * q48-class single-task-sort hazard — Spark's
    * InferWindowGroupLimit sees `row_number() <= k` and inserts a
    * PARTIAL group limit below the exchange, so both forms shuffle
    * ≤ k rows per (task, group). The heap form still improves on it:
    * O(k) memory with no per-task local sort (the group limit sorts
    * each task's rows first), only (ord, id) pairs shuffle instead
    * of full rows, and the plan needs no Window at all — and it is
    * the form that keeps working when the selection predicate can't
    * be pattern-matched by the optimizer rule.
    *
    * Returns (groupCol, rk, idCol) — the selection, not the full
    * rows (join back on (group, id) when row payloads are needed;
    * the build side is ≤ k rows per group). Spec-pinned equal to the
    * window form's (group, rk, id) set, including duplicate-id
    * multiset behavior.
    */
  def perGroupCapAgg(df: DataFrame, idCol: String, groupCol: String,
                     k: Int): DataFrame = {
    val hkey = shiftrightunsigned(
      graft.functions.GraftFunctions.fmix64(col(idCol).cast("long")), 11)
    df.filter(col(idCol).isNotNull)
      .select(col(groupCol), hkey.as("__ord"),
        col(idCol).cast("long").as("__id"))
      .groupBy(groupCol)
      .agg(graft.functions.GraftFunctions
        .top_k_pairs(col("__ord"), col("__id"), k).as("__tk"))
      .select(col(groupCol), posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(col(groupCol), (col("__pos") + 1).cast("int").as("rk"),
        col("__e").getField("id").as(idCol))
  }

  /** RELATIVE quality gate (the FineWeb-era move from absolute
    * thresholds to per-source percentiles): keep the top
    * `fracNum/fracDen` fraction of each group by `scoreCol`, rank
    * ties broken by id so the kept set is exactly reproducible.
    * Keeps ⌈frac·n⌉ rows per group ((fracNum·n + fracDen − 1) div
    * fracDen in integer space — every group keeps at least one doc),
    * so the cut adapts to each source's own quality distribution
    * instead of starving clean sources / flooding noisy ones.
    *
    * Scale shape: ONE window pass partitioned by group (rank + count
    * over the same frame — no self-join, no global window). At 100 TB
    * a giant single source makes that per-group sort the bottleneck —
    * PRODUCTION SHOULD RUN [[topFractionBySketch]] (per-source KLL
    * threshold + stateless filter, no sort); this exact-rank form is
    * the oracle-checkable contract the sketch path approximates
    * (agreement pinned within rank error by SamplingSketchSpec).
    */
  def topFractionByScore(df: DataFrame, idCol: String, groupCol: String,
                         scoreCol: String, fracNum: Int, fracDen: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(scoreCol).desc, col(idCol))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    df.withColumn("rk", row_number().over(w))
      .withColumn("n_group", count(lit(1)).over(wn))
      .filter(col("rk") * lit(fracDen.toLong) <=
        col("n_group") * lit(fracNum.toLong) + lit(fracDen.toLong - 1L))
  }

  /** PRODUCTION form of [[topFractionByScore]] — the per-source KLL
    * threshold + stateless filter its scaladoc names as the 100 TB
    * path. Two corpus scans, NO per-group sort anywhere:
    *
    *   pass 1: per-group KLL sketch of the score distribution
    *     (TypedImperativeAggregate → map-side partials of a few KB per
    *     (task, group), merged to ONE row per group; the aggregate
    *     output is #groups rows no matter how big any group is), and
    *     the keep threshold is the sketch's (1 − frac) quantile;
    *   pass 2: broadcast the #groups-row threshold table back and keep
    *     rows with score ≥ threshold — a stateless filter that pushes
    *     into the scan's partitioning, no shuffle of the corpus.
    *
    * This is exactly where the exact form breaks at scale: its
    * `row_number()` window sorts an ENTIRE source inside one window
    * partition (the fraction cut needs n_group, so WindowGroupLimit
    * cannot prune before the sort), and one crawl dump is most of a
    * real corpus. Here a dominant group costs the same as any other:
    * its sketch is still a few KB.
    *
    * Semantics vs the exact form (SamplingSketchSpec pins both):
    *   - the kept set is a score-rank PREFIX of each group whose size
    *     is within the sketch's normalized rank error of ⌈frac·n⌉
    *     (±~1.65%·n at sketchK=200; tighten with a larger sketchK);
    *   - TIES AT THE THRESHOLD ARE ALL KEPT (a pure score gate has no
    *     id tiebreak) — callers needing an exact-size sample compose
    *     [[perGroupCap]] downstream on the (much smaller) kept set.
    * The exact form remains the oracle-checkable contract (d24); this
    * form is what production should run.
    */
  def topFractionBySketch(df: DataFrame, idCol: String, groupCol: String,
                          scoreCol: String, fracNum: Int, fracDen: Int,
                          sketchK: Int = 200): DataFrame = {
    require(fracNum >= 1 && fracNum <= fracDen,
      s"need 1 <= fracNum <= fracDen, got $fracNum/$fracDen")
    val q = 1.0 - fracNum.toDouble / fracDen
    val thresholds = df.groupBy(groupCol).agg(
      graft.functions.GraftFunctions
        .kll_quantiles(col(scoreCol).cast("double"), sketchK, Seq(q))
        .getItem(0).as("score_thr"))
    df.join(broadcast(thresholds), Seq(groupCol))
      .filter(col(scoreCol).cast("double") >= col("score_thr"))
  }

  /** Shard count for a deterministic dataloader order: ceil(corpus /
    * targetShardRows), floored at 1 — shards SCALE with the corpus so
    * per-shard sort volume stays ≈ targetShardRows at any size (a
    * fixed count would sort corpus/k rows in one task at 100 TB).
    * Integer arithmetic, replayable by any engine.
    */
  def epochShardCount(corpusRows: Long, targetShardRows: Long): Long = {
    require(targetShardRows >= 1L, s"bad targetShardRows $targetShardRows")
    math.max(1L, (corpusRows + targetShardRows - 1L) / targetShardRows)
  }

  /** DETERMINISTIC DATALOADER ORDER (d43): per epoch, every row takes
    * the portable order key fmix64(fmix64(epoch+1) XOR id), lands in
    * shard pmod(key, shards), and ranks within its shard by
    * (key, id) — so "epoch e, shard s, position p" resolves to the
    * same document on every rerun, any engine, any cluster size.
    * Output: (epoch, idCol, hkey, shard, rank). `shards` is the
    * caller's corpus-scaled count ([[epochShardCount]]); the window
    * partitions by (epoch, shard), so the largest in-task sort is one
    * shard — bounded by the target shard size, never by the corpus.
    */
  def epochOrder(df: DataFrame, idCol: String, epochs: Seq[Long],
                 shards: Long): DataFrame = {
    require(shards >= 1L, s"bad shard count $shards")
    require(epochs.nonEmpty, "need at least one epoch")
    import org.apache.spark.sql.expressions.Window
    val fx = graft.functions.GraftFunctions
    val keyed = epochs.map { e =>
      df.filter(col(idCol).isNotNull)
        .select(lit(e).as("epoch"), col(idCol),
          fx.fmix64(fx.fmix64(lit(e + 1L)).bitwiseXOR(col(idCol)))
            .as("hkey"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy("epoch", "shard")
      .orderBy(col("hkey"), col(idCol))
    keyed
      .withColumn("shard", pmod(col("hkey"), lit(shards)))
      .withColumn("rank", row_number().over(w).cast("long"))
  }
}
