package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** Pins the Aho–Corasick blocklist scan against a scalar reference
  * (per-term greedy leftmost non-overlapping counting — the
  * replace() formula's semantics), including self-overlap, cross-term
  * overlap, substring terms, phrase terms, unicode payloads, and
  * edge docs. The DataFrame path exercises the codegen route (the
  * automaton ships as a reference object inside whole-stage codegen).
  */
class AcBlocklistSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  /** Scalar reference: greedy leftmost non-overlapping count of one
    * term — what replace(text, term, '') removes.
    */
  private def refCount(text: String, term: String): Long = {
    var i = 0; var n = 0L
    while ({ val j = text.indexOf(term, i); j >= 0 && { i = j + term.length; n += 1; true } }) ()
    n
  }

  private def run(texts: Seq[String], terms: Seq[String]): Seq[Seq[Long]] =
    texts.toDF("text")
      .select(GraftFunctions.blocklist_counts(col("text"), terms).as("c"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq

  test("greedy non-overlap, cross-term overlap, substrings, phrases, edges") {
    val terms = Seq("aa", "ab", "ba", "batch batch", "a", "zzz")
    val texts = Seq(
      "aaaa",                    // aa → 2 (greedy), a → 4
      "aaa",                     // aa → 1
      "abab",                    // ab → 2, ba → 1 (independent overlap)
      "batch batch batch",       // phrase self-overlap → 1
      "",                        // all zeros
      "zz",                      // prefix of zzz only → 0
      "xbatch batchy ab")        // phrase mid-string + trailing term
    val got = run(texts, terms)
    texts.zip(got).foreach { case (tx, row) =>
      terms.zip(row).foreach { case (term, cnt) =>
        assert(cnt == refCount(tx, term), s"text '$tx' term '$term'")
      }
    }
    assert(got(0) == Seq(2L, 0L, 0L, 0L, 4L, 0L))
    assert(got(3) == Seq(0L, 0L, 3L, 1L, 3L, 0L)) // 'ba'/'a' hit inside 'batch'
  }

  test("duplicated dictionary terms each report the full count") {
    // A duplicate term shares the trie path to one end state; every
    // copy must report the same count as a lone occurrence of the
    // term (earlier builds kept only the LAST index — earlier copies
    // silently read 0).
    val terms = Seq("ab", "a", "ab", "ab")
    val got = run(Seq("abab xab", "", "b"), terms)
    assert(got(0) == Seq(3L, 3L, 3L, 3L))
    assert(got(1) == Seq(0L, 0L, 0L, 0L))
    assert(got(2) == Seq(0L, 0L, 0L, 0L))
  }

  test("SQL registration rejects NULL terms arrays and NULL elements clearly") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT blocklist_counts('x', CAST(NULL AS ARRAY<STRING>))").collect()
    }
    assert(e1.getMessage.contains("must not be NULL"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT blocklist_counts('x', array('a', NULL))").collect()
    }
    assert(e2.getMessage.contains("must not contain NULL"), e2.getMessage)
  }

  test("unicode payloads: byte-level matching equals char-level on valid UTF-8") {
    val terms = Seq("é", "naïve", "da", "ta")
    val texts = Seq("café café", "naïve naïveté", "données data данные", "日本語 da ta")
    run(texts, terms).zip(texts).foreach { case (row, tx) =>
      terms.zip(row).foreach { case (term, cnt) =>
        assert(cnt == refCount(tx, term), s"text '$tx' term '$term'")
      }
    }
  }

  test("perf A/B one-pass AC vs per-term replace chain (GRAFT_PERF=1 to run)") {
    assume(sys.env.get("GRAFT_PERF").contains("1"))
    // 40-term dictionary — the regime where O(|text|+matches) vs
    // O(|text|·|terms|) shows; both forms stay in codegen, so the
    // delta is pure algorithmic.
    val terms = (0 until 40).map(k => s"w${k * 25 % 997} w${(k * 25 + 7) % 997}")
    val big = spark.range(20000).select(
      concat_ws(" ", (0 until 200).map(k =>
        concat(lit("w"), pmod(col("id") * 7 + k, lit(997)))): _*).as("text"))
      .cache()
    big.count()
    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      big.select(c.as("v")).agg(sum("v")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val ac = GraftFunctions.blocklist_counts(col("text"), terms)
    val acTotal = aggregate(ac, lit(0L), (a, x) => a + x)
    val chainTotal = terms.map(t =>
      (length(col("text")) - length(regexp_replace(col("text"), lit(java.util.regex.Pattern.quote(t)), lit("")))) / t.length)
      .reduce(_ + _).cast("long")
    val (as, cs) = (Array.fill(4)(0.0), Array.fill(4)(0.0))
    for (r <- 0 until 4) { as(r) = time(acTotal); cs(r) = time(chainTotal) }
    info(f"AC min ${as.min}%.3f s, replace-chain min ${cs.min}%.3f s over 20k docs x 200 toks x 40 terms")
    big.unpersist()
  }

  test("SQL registry form matches the Column API") {
    Graft.registerFunctions(spark)
    val viaSql = spark.sql(
      "SELECT blocklist_counts('batch batch batch', array('batch batch', 'a')) AS c")
      .collect().head.getSeq[Long](0).toSeq
    assert(viaSql == Seq(1L, 3L))
    intercept[Exception] {
      spark.sql("SELECT blocklist_counts('x')").collect()
    }
  }

  test("null text → null; randomized agreement with the scalar reference") {
    val r = Seq[(String)](null).toDF("text")
      .select(GraftFunctions.blocklist_counts(col("text"), Seq("x")).as("c"))
      .collect().head
    assert(r.isNullAt(0))
    val rnd = new scala.util.Random(7)
    val alpha = "abc "
    val terms = Seq("a", "ab", "bc", "abc", "cab", "b c", "aa")
    val texts = (0 until 50).map(_ =>
      (0 until rnd.nextInt(60)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    run(texts, terms).zip(texts).foreach { case (row, tx) =>
      terms.zip(row).foreach { case (term, cnt) =>
        assert(cnt == refCount(tx, term), s"text '$tx' term '$term'")
      }
    }
  }
}
