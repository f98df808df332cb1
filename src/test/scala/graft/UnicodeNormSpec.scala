package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Pins the unicode-preserving normalization tier
  * (Dedup.normTextUnicode = codegen nfkc_lower + ASCII whitespace
  * collapse). This tier has NO DuckDB oracle BY DESIGN — NFKC +
  * unicode lowercase have no cross-engine-identical replay (see
  * normText's scaladoc for the divergent codepoints) — so the JVM
  * contract is pinned here instead: width folds, ligature expansion,
  * combining-mark composition, NBSP folding, casefold stability,
  * idempotence, and agreement with normText on pure-ASCII input
  * (where both tiers must coincide, keeping the certified fold the
  * ground truth for ASCII corpora).
  */
class UnicodeNormSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def norm(ss: String*): Seq[String] =
    ss.toDF("t").select(Dedup.normTextUnicode(col("t")).as("n"))
      .collect().map(_.getString(0)).toSeq

  test("NFKC folds: fullwidth, ligatures, combining marks, NBSP, compatibility digits") {
    assert(norm("Ｆｕｌｌ　ｗｉｄｔｈ") == Seq("full width")) // fullwidth + ideographic space
    assert(norm("ﬁle ﬂow") == Seq("file flow")) // ligatures expand
    assert(norm("café") == Seq("café")) // combining acute composes
    assert(norm("a b") == Seq("a b")) // NBSP -> space under NFKC
    assert(norm("①②③") == Seq("123")) // circled digits
    assert(norm("x²") == Seq("x2")) // superscript
  }

  test("unicode letters are KEPT (unlike normText's ASCII fold)") {
    assert(norm("Über die Straße") == Seq("über die straße"))
    assert(norm("Київ 東京 naïve") == Seq("київ 東京 naïve"))
    // the ASCII tier folds all of these to spaces instead
    val ascii = Seq("Über die Straße").toDF("t")
      .select(Dedup.normText(col("t"))).collect().head.getString(0)
    assert(ascii == "ber die stra e")
  }

  test("idempotent; stable casefold on the known-divergent codepoints") {
    val samples = Seq("İstanbul", "ΣΟΦΟΣ ΟΔΥΣΣΕΎΣ", "STRASSE straße",
      "Ｆｕｌｌ", "ﬁle", "café", "ĳsberg")
    val once = norm(samples: _*)
    assert(norm(once: _*) == once, "normTextUnicode must be idempotent")
    // pinned JVM behavior (documented divergence from utf8proc):
    assert(norm("İstanbul") == Seq("i̇stanbul")) // Java lower keeps the dot
    assert(norm("ΟΔΥΣΣΕΥΣ") == Seq("οδυσσευς")) // Java applies final-sigma ς
  }

  test("ASCII input: unicode tier == certified ASCII tier") {
    val ascii = Seq("  Hello   WORLD  ", "a\tb\nc", "x!~z", "")
    val uni = norm(ascii: _*)
    val fold = ascii.toDF("t").select(Dedup.normText(col("t")))
      .collect().map(_.getString(0)).toSeq
    assert(uni == fold)
  }

  test("SQL registration and null passthrough") {
    assert(spark.sql("SELECT nfkc_lower('Ｆｕｌｌ ﬁle')")
      .collect().head.getString(0) == "full file")
    val r = Seq[String](null).toDF("t")
      .select(Dedup.normTextUnicode(col("t"))).collect().head
    assert(r.isNullAt(0))
  }
}
