package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** Pins the production sketch-path quality gate
  * (Sampling.topFractionBySketch: per-group KLL threshold + stateless
  * filter, NO per-group sort) against the exact ranked-window form
  * (topFractionByScore, d24's oracle contract) within the sketch's
  * published normalized rank error.
  */
class SamplingSketchSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val SketchK = 200
  // Single-quantile error bound (Karnin–Lang–Liberty): the library's
  // own figure for k=200 is ~1.65% normalized rank error at 99%
  // confidence. The sketch is RANDOMIZED, so the spec budgets 2× the
  // published epsilon — far outside any plausible draw at these n.
  private val eps = org.apache.datasketches.kll.KllSketch
    .getNormalizedRankError(SketchK, false)

  /** Corpus: one dominant group (the crawl-dump shape that breaks the
    * exact form at scale) + one small group; scores are distinct
    * doubles derived from a hash so the exact rank order is total.
    */
  private def corpus(nBig: Int, nSmall: Int) = {
    val rows = (1 to nBig).map(i => (i.toLong, "big")) ++
      (1 to nSmall).map(i => (nBig + i.toLong, "small"))
    rows.toDF("doc_id", "source")
      .withColumn("score",
        (graft.functions.GraftFunctions.fmix64(col("doc_id")).cast("double")
          / lit(1e18)))
  }

  test("sketch gate = a rank-prefix per group, size within rank error of the exact cut") {
    val df = corpus(nBig = 4000, nSmall = 60).cache()
    val fracNum = 3; val fracDen = 10
    val exact = Sampling.topFractionByScore(df, "doc_id", "source", "score",
        fracNum, fracDen)
      .select("source", "doc_id", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val sketch = Sampling.topFractionBySketch(df, "doc_id", "source", "score",
        fracNum, fracDen, SketchK)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

    // Exact ranks of ALL docs (not just the kept 30%), for the band math.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("doc_id"))
    val allRanks = df.withColumn("rk", row_number().over(w))
      .select("source", "doc_id", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val nByGroup = Map("big" -> 4000, "small" -> 60)

    for ((g, n) <- nByGroup) {
      val target = (fracNum * n + fracDen - 1) / fracDen // ⌈frac·n⌉
      val band = math.ceil(2 * eps * n).toInt + 1
      val keptG = sketch.collect { case (s, id) if s == g => allRanks((s, id)) }
      // (1) kept count within the rank-error band of the exact cut
      assert(math.abs(keptG.size - target) <= band,
        s"$g: kept ${keptG.size}, exact target $target, band ±$band")
      // (2) the kept set is a rank PREFIX (scores distinct → the score
      // gate keeps exactly ranks 1..|kept|): max kept rank == |kept|
      assert(keptG.nonEmpty && keptG.max == keptG.size,
        s"$g: kept set is not a rank prefix (max rank ${keptG.max} of ${keptG.size})")
      // (3) and therefore agrees with the exact form outside the band
      val exactG = exact.collect { case ((s, _), rk) if s == g => rk }
      assert(exactG.size == target)
      assert((keptG.size - target).abs <= band)
    }
    df.unpersist()
  }

  test("fracNum == fracDen keeps everything; every group keeps its top doc") {
    val df = corpus(nBig = 500, nSmall = 7)
    assert(Sampling.topFractionBySketch(df, "doc_id", "source", "score",
      1, 1, SketchK).count() == 507L)
    // tiny fraction: the max-score doc always survives (thr <= max)
    val kept1 = Sampling.topFractionBySketch(df, "doc_id", "source", "score",
        1, 1000, SketchK)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept1.keySet == Set("big", "small"))
    assert(kept1.values.forall(_ >= 1L))
  }

  test("plan has no per-group sort: threshold join broadcasts, filter stays narrow") {
    val df = corpus(nBig = 300, nSmall = 9)
    val plan = Sampling.topFractionBySketch(df, "doc_id", "source", "score",
      3, 10, SketchK).queryExecution.executedPlan.toString
    // the corpus side must reach the filter through a broadcast join,
    // never through a Window/Sort chain like the exact form
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Window"), s"sketch path must not plan a Window:\n$plan")
  }

  test("epochUpsample: zero-unit strata contribute nothing (no ANSI div-by-zero); empty input is empty") {
    // stratum 'z' is all null/zero units — the documented contract is
    // "contributes nothing", and under ANSI mode an unguarded
    // num div (kk * 0) aborts the whole query
    // stratum a is tiny (epoch cap kicks in → ≥4 full copies, so its
    // presence in the output is deterministic), b is the bulk, z is
    // the all-null/zero poison pill
    val df = Seq(
      (1L, "a", Some(50L)), (2L, "a", Some(50L)),
      (5L, "b", Some(10000L)),
      (3L, "z", None: Option[Long]), (4L, "z", Some(0L)))
      .toDF("doc_id", "source", "n_chars")
    val out = Sampling.epochUpsample(df, "doc_id", "source", "n_chars")
      .cache()
    val srcs = out.select("source").distinct().collect().map(_.getString(0)).toSet
    assert(!srcs.contains("z"), s"zero-unit stratum must contribute nothing: $srcs")
    assert(srcs.contains("a"), s"capped stratum must materialize: $srcs")
    // the zero-unit stratum still COUNTS toward the budget split (the
    // oracle's kk = count over ALL strata): B=10100, K=3 → stratum a
    // gets e6 = 10100e6 div (3*100) = 33,666,666 → capped at 4e6 →
    // exactly 4 full copies of each of its 2 docs
    assert(out.filter(col("source") === "a").count() == 8L)
    assert(out.filter(col("source") === "a").select("epochs6").distinct()
      .collect().map(_.getLong(0)).toSeq == Seq(4000000L))
    // empty input: no NPE on the null sum — an empty frame of the
    // same shape comes back
    val empty = Sampling.epochUpsample(df.limit(0), "doc_id", "source", "n_chars")
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == out.columns.toSeq)
  }

  test("epochOrder: corpus-scaled shards bound per-shard sort volume; order is deterministic and seed-keyed") {
    val n = 5000L
    val target = 250L
    val df = (0L until n).toDF("doc_id")
    val shards = Sampling.epochShardCount(n, target)
    assert(shards == 20L, s"ceil(5000/250): $shards")
    assert(Sampling.epochShardCount(1L, 1000000L) == 1L)
    assert(Sampling.epochShardCount(1000001L, 1000000L) == 2L)
    val out = Sampling.epochOrder(df, "doc_id", Seq(0L, 1L), shards).cache()
    // per-shard sort volume is bounded by the TARGET shard size (the
    // window's in-task sort): fmix64 is uniform, so no shard exceeds
    // the mean by more than a small hash-imbalance factor
    val perShard = out.groupBy("epoch", "shard").count()
      .agg(max("count"), countDistinct("shard")).head()
    assert(perShard.getLong(0) <= 2L * target,
      s"largest shard ${perShard.getLong(0)} vs target $target — the " +
        "sort volume must track the target, never the corpus")
    assert(perShard.getLong(1) == shards)
    // every row ranks exactly once per epoch; ranks are 1..shardSize
    assert(out.count() == 2L * n)
    assert(out.filter(col("rank") < 1L).isEmpty)
    // deterministic: an independent recompute is identical
    val again = Sampling.epochOrder(df, "doc_id", Seq(0L, 1L), shards)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // the epoch seed changes the permutation (not just the shards)
    val e0 = out.filter(col("epoch") === 0L).select("doc_id", "shard", "rank")
    val e1 = out.filter(col("epoch") === 1L).select("doc_id", "shard", "rank")
    assert(e0.exceptAll(e1).count() > 0L, "epochs must not share an order")
    out.unpersist()
  }
}
