package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Bloom-filter runtime join pruning — the classic 100 TB join
  * optimization (reference behavior: metadata-driven joins where a
  * selective dim-side predicate should stop fact rows from ever
  * entering the shuffle; see SURVEY.md §1 step 6).
  *
  * Shape: one tree-reduced aggregate job builds a bloom filter over
  * xxhash64(build-side key) — the exact sketch Spark's own
  * InjectRuntimeFilter plants when it fires — then the serialized
  * filter rides the task binary as a literal and prunes the large
  * side BEFORE its shuffle. Spark's automatic runtime filter only
  * triggers under specific plan/stats conditions
  * (spark.sql.optimizer.runtime.bloomFilter.enabled, creation-side
  * size thresholds); this operator is the explicit, always-on form
  * for pipelines that know their dim predicate is selective.
  *
  * Why this matters at scale: with a 1%-selective dim predicate, the
  * fact side would shuffle 100× more rows than survive the join. A
  * 1M-key filter at ~8 bits/key is ~1 MB — broadcast-sized — and
  * membership is a codegen'd probe, so the fact scan drops dead rows
  * at read time (filter sits directly above the parquet scan,
  * pipelined into the scan stage, no extra pass).
  *
  * False positives pass the probe but are removed by the join itself,
  * so the result is EXACTLY the plain join — which is what the q33
  * oracle checks. False negatives cannot occur.
  *
  * Driver-side note: building the filter materializes ONE aggregated
  * sketch row on the driver (same data movement as any broadcast
  * build side — the sketch, not the rows). The fact side never moves.
  */
object BloomJoin {

  /** Bits for an `n`-key filter at false-positive rate `fpp`
    * (standard bloom sizing: m = -n ln p / ln² 2), floored at 64.
    */
  def numBitsFor(expectedItems: Long, fpp: Double): Long =
    math.max(64L,
      math.ceil(-expectedItems.max(1L) * math.log(fpp) /
        (math.log(2.0) * math.log(2.0))).toLong)

  /** Serialized bloom filter of `small`'s `smallKey` column, or null
    * when `small` is empty. `expectedItems` is the caller's cardinality
    * estimate for the FILTERED build side (at 100 TB: table stats or a
    * cheap dim-side count); oversizing only costs bits, undersizing
    * only costs false positives — never correctness.
    */
  def buildFilter(small: DataFrame, smallKey: String,
                  expectedItems: Long, fpp: Double): Array[Byte] = {
    val row = small.agg(
      GraftFunctions.bloom_filter_agg(
        col(smallKey), expectedItems, numBitsFor(expectedItems, fpp)).as("bf"))
      .head()
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** `big` reduced to rows whose `bigKey` might appear in `small`'s
    * `smallKey` set. Superset of the true semi-join (bloom false
    * positives), subset of `big`.
    */
  def prune(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
            expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(small, smallKey, expectedItems, fpp)
    if (bytes == null) big.filter(lit(false))
    else big.filter(GraftFunctions.might_contain(lit(bytes), col(bigKey)))
  }

  /** Inner equi-join of `big` ⋈ `small` with the big side bloom-pruned
    * before its shuffle. Result is exactly `big.join(small, ...)`.
    */
  def prunedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val pruned = prune(big, small, bigKey, smallKey, expectedItems, fpp)
    pruned.join(small, pruned(bigKey) === small(smallKey))
  }
}
