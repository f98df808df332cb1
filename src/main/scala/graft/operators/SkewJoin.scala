package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §5).
  *
  * When one join key carries a disproportionate share of the fact
  * rows, the plain shuffle join lands that key's entire volume on one
  * task. Salting splits it: the skewed (large) side gets a pseudo-
  * random salt in [0, n); the other side is replicated n times, once
  * per salt value; the join key becomes (key, salt). Row multiplicity
  * is unchanged — the result equals the unsalted join — but the hot
  * key now spreads across n tasks.
  *
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting remains the tool when a single key exceeds what one task
  * can hold even after AQE splits (or when the build side must be
  * shuffled, not broadcast).
  */
object SkewJoin {

  /** @param large  skewed probe side
    * @param small  side to replicate (must be the smaller one)
    * @param key    equi-join key name present on both sides
    * @param salts  number of splits per key
    */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      salts: Int = 8): DataFrame = {
    require(salts > 0)
    // deterministic per-row salt: spread rows of one key across tasks.
    // xxhash64 over the whole row's stable columns would also work;
    // monotonically_increasing_id is per-partition-deterministic and
    // cheaper.
    val l = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val r = small
      .withColumnRenamed(key, "__rkey")
      .withColumn("__rsalt", explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    l.join(r, col(key) === col("__rkey") && col("__salt") === col("__rsalt"))
      .drop("__salt", "__rsalt", "__rkey")
  }
}
