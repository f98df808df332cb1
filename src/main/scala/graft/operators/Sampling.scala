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
}
