package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextStats

/** Pins the fused native codegen scorer (HashedLinearScore: one byte
  * loop doing tokenize → rolling-hash → fmix64 → bucket → integer
  * weight accumulate) bit-equal to the composable higher-order-
  * function reference form, including the degenerate inputs the fuzz
  * harness encodes (empty / whitespace-only / huge docs, unicode that
  * normText ASCII-folds, null text).
  */
class HashedLinearScoreSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val NB = 4096
  private val weights: Seq[Long] =
    (0 until NB).map(j => (j * 2654435761L + 97L) % 2001L - 1000L)

  private def both(df: org.apache.spark.sql.DataFrame) = {
    val fused = TextStats.hashedLinearScore(col("text"), NB, weights)
    val hof = TextStats.hashedLinearScoreHof(col("text"), NB,
      j => (j * lit(2654435761L) + lit(97L)) % lit(2001L) - lit(1000L))
    (df.select(col("id") +: fused.map { case (n, c) => c.as(n) }: _*)
       .orderBy("id").collect().toSeq,
     df.select(col("id") +: hof.map { case (n, c) => c.as(n) }: _*)
       .orderBy("id").collect().toSeq)
  }

  test("fused loop == HOF reference on adversarial inputs") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, ""),                       // empty: (0, 0, null)
      (3L, "   \t\n  "),              // whitespace-only after norm
      (4L, "one"),                    // single token
      (5L, "x " * 5000),              // huge doc, repeated token
      (6L, "Héllo Wörld\r\nmixed CASE"), // norm ASCII-folds + lowers
      (7L, "a b c d e f g h i j"),
      (8L, null.asInstanceOf[String]) // null text -> null outputs
    ).toDF("id", "text")
    val (f, h) = both(df)
    assert(f == h, s"fused:\n${f.mkString("\n")}\nhof:\n${h.mkString("\n")}")
    // the empty-doc convention explicitly:
    val e = f.find(_.getLong(0) == 2L).get
    assert(e.getLong(1) == 0L && e.getLong(2) == 0L && e.isNullAt(3))
  }

  test("fused loop == HOF on the sf0.001 documents table") {
    val df = Graft.table(spark, SharedSpark.sfDir, "documents")
      .select(col("doc_id").as("id"), col("text"))
    val (f, h) = both(df)
    assert(f.nonEmpty && f == h)
  }

  test("perf A/B fused vs HOF (GRAFT_PERF=1 to run; prints, asserts nothing)") {
    assume(sys.env.get("GRAFT_PERF").contains("1"))
    val big = spark.range(20000).select(col("id"),
      concat_ws(" ", (0 until 200).map(k =>
        concat(lit("w"), pmod(col("id") * 7 + k, lit(997)))): _*).as("text"))
      .cache()
    big.count()
    def time(cols: Seq[(String, org.apache.spark.sql.Column)]): Double = {
      val t0 = System.nanoTime()
      big.select(cols.map { case (n, c) => c.as(n) }: _*)
        .agg(sum("score")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val hofC = TextStats.hashedLinearScoreHof(col("text"), NB,
      j => (j * lit(2654435761L) + lit(97L)) % lit(2001L) - lit(1000L))
    val fusedC = TextStats.hashedLinearScore(col("text"), NB, weights)
    // interleaved reps; report minima (bench-minima protocol)
    val (fs, hs) = (Array.fill(4)(0.0), Array.fill(4)(0.0))
    for (r <- 0 until 4) { fs(r) = time(fusedC); hs(r) = time(hofC) }
    info(f"fused min ${fs.min}%.3f s, HOF min ${hs.min}%.3f s over 20k docs x 200 toks")
    big.unpersist()
  }

  test("the fused scorer stays inside whole-stage codegen; the HOF form does not") {
    // parquet-backed (a local Seq constant-folds into LocalTableScan
    // before any codegen question arises)
    val df = Graft.table(spark, SharedSpark.sfDir, "documents")
      .select(col("doc_id").as("id"), col("text"))
    def planOf(cols: Seq[(String, org.apache.spark.sql.Column)]) =
      df.select(col("id") +: cols.map { case (n, c) => c.as(n) }: _*)
        .queryExecution.executedPlan.toString
    val fusedPlan = planOf(TextStats.hashedLinearScore(col("text"), NB, weights))
    // the scan→project chain is one codegen'd span ("*(1) Project")
    assert(fusedPlan.contains("*(1) Project"),
      s"expected codegen'd Project in fused plan:\n$fusedPlan")
    val hofPlan = planOf(TextStats.hashedLinearScoreHof(col("text"), NB,
      j => (j * lit(2654435761L) + lit(97L)) % lit(2001L) - lit(1000L)))
    // the reference HOF form's ArrayAggregate breaks whole-stage
    // codegen — exactly why the fused expression exists
    assert(!hofPlan.contains("*(1) Project"),
      s"HOF plan unexpectedly codegen'd (update the scaladoc!):\n$hofPlan")
  }
}
