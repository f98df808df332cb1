package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextStats

/** Learning-behavior pins for L81 (rocchioClassify) that the driver
  * query can't provide: the testdata's `lang` column is INDEPENDENT
  * of its text (same synthetic vocabulary for every language), so
  * t31's driver check certifies replay, not learning — accuracy on
  * that table hovers at chance by construction. This spec builds a
  * separable corpus inline and pins that training actually works,
  * plus the contract edges (ties, token-less docs, dup-row
  * invariance, null labels).
  */
class RocchioClassifySpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val isTest = pmod(col("doc_id"), lit(5)) === 0

  private def separable(n: Long) = (0L until n).map { i =>
    val cls = if (i % 2 == 0) "feline" else "canine"
    val vocab =
      if (cls == "feline") Seq("purr", "whisker", "meow", "paw")
      else Seq("bark", "fetch", "bone", "wag")
    val txt = (0 until 20).map(j => vocab(((i + j) % 4).toInt)).mkString(" ")
    (i, cls, txt)
  }

  test("separable corpus: holdout accuracy is perfect") {
    val df = separable(200).toDF("doc_id", "cls", "text")
    val out = TextStats.rocchioClassify(df, "doc_id", "text", "cls", !isTest)
      .collect()
    assert(out.length == 40, s"expected 40 test docs, got ${out.length}")
    assert(out.forall(_.getAs[Int]("hit") == 1),
      "disjoint-vocabulary classes must classify perfectly")
    // the wrong class shares no buckets → its mass is 0, so every
    // winning score is strictly positive
    assert(out.forall(_.getAs[Double]("score") > 0.0))
  }

  test("token-less docs predict the alphabetically first class at score 0") {
    val df = (separable(50) :+ ((50L, "feline", "   "))).toDF("doc_id", "cls", "text")
    val row = TextStats.rocchioClassify(df, "doc_id", "text", "cls", !isTest)
      .filter(col("doc_id") === 50L).collect()
    assert(row.length == 1)
    assert(row.head.getAs[String]("pred") == "canine") // < "feline"
    assert(row.head.getAs[Double]("score") == 0.0)
  }

  test("re-delivered duplicate rows do not move the model or the predictions") {
    val df = separable(200).toDF("doc_id", "cls", "text")
    val once = TextStats.rocchioClassify(df, "doc_id", "text", "cls", !isTest)
      .orderBy("doc_id").collect()
    val twice = TextStats.rocchioClassify(df.unionAll(df), "doc_id", "text", "cls", !isTest)
      .orderBy("doc_id").collect()
    assert(once.toSeq == twice.toSeq,
      "DISTINCT base contract: duplicate delivery must be a no-op")
  }

  test("null-label rows are dropped from train and test") {
    // 205 % 5 = 0 → a TEST row; unlabeled, so it must not predict
    val extra = Seq((205L, null.asInstanceOf[String], "purr whisker"))
    val df = (separable(200).map(t => (t._1, t._2, t._3)) ++ extra)
      .toDF("doc_id", "cls", "text")
    val out = TextStats.rocchioClassify(df, "doc_id", "text", "cls", !isTest)
    assert(out.filter(col("doc_id") === 205L).count() == 0)
    assert(out.count() == 40)
  }
}
