package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ann

/** Pins the fused PQ trainer (one corpus pass per Lloyd stage, all m
  * subspaces together) BIT-EQUAL to the sequential per-subspace
  * reference (m separate lloydRounds chains) — the property that
  * lets s11/s12 keep their per-subspace oracles while training runs
  * m× fewer corpus scans.
  */
class PqFusedSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def modelOf(build: (org.apache.spark.sql.DataFrame, String, String,
      Int, Int, Int, Int, Double) => (Seq[org.apache.spark.sql.DataFrame],
      org.apache.spark.sql.DataFrame), e: org.apache.spark.sql.DataFrame) = {
    val (cents, codes) = build(e, "vec_id", "embedding", 4, 16, 16, 2, 1e6)
    val cs = cents.zipWithIndex.map { case (c, s) =>
      c.collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toList)).sortBy(_._1).toList
    }
    val cd = codes.collect().map(r =>
      (r.getLong(0), (1 to 4).map(r.getLong).toList)).sortBy(_._1).toList
    spark.catalog.clearCache()
    (cs.toList, cd)
  }

  test("fused == sequential on the real embeddings table") {
    val e = Graft.table(spark, SharedSpark.sfDir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .filter(size(col("embedding")) === 64)
    val f = modelOf(Ann.pqModel, e)
    val q = modelOf(Ann.pqModelSequential, e)
    assert(f == q)
  }

  test("fused == sequential on duplicate-id and zero-vector corpora") {
    val rows = (0L until 40L).map { i =>
      (i, Array.tabulate(64)(d => ((i * 7 + d * 13) % 29).toFloat / 29f))
    } ++ Seq(
      (7L, Array.tabulate(64)(d => ((7L * 7 + d * 13) % 29).toFloat / 29f)), // dup row
      (41L, Array.fill(64)(0f))) // zero vector
    val e = rows.toDF("vec_id", "embedding")
    val f = modelOf(Ann.pqModel, e)
    val q = modelOf(Ann.pqModelSequential, e)
    assert(f == q)
  }
}
