package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-shape diagnostics you run BEFORE committing to a join/agg
  * strategy at scale: key-skew profile and partition balance. Cheap
  * (one aggregate each) relative to the job they de-risk.
  */
object Diagnostics {

  /** Per-key frequency profile: top-N heaviest keys with their share
    * of all rows and the skew factor vs a uniform spread. A key with
    * share ≫ 1/parallelism is the one that stalls a shuffle join —
    * route it to SkewJoin.saltedInnerJoin or AQE skew handling.
    */
  def keySkew(df: DataFrame, key: Column, topN: Int = 20): DataFrame = {
    val total = df.count().toDouble
    val keys = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val distinct = keys.count().toDouble
    keys
      .withColumn("share", round(col("n") / total, 6))
      .withColumn("skew_vs_uniform", round(col("n") / (total / math.max(distinct, 1.0)), 2))
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
  }

  /** Rows per partition of the current physical distribution —
    * imbalance here means stragglers in the next stage.
    */
  def partitionBalance(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.rdd.mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .toDF("partition", "rows")
      .orderBy("partition")
  }
}
