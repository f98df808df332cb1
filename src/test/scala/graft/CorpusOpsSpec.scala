package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CorpusOps

class CorpusOpsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "eval"),
    (2L, "a completely different sentence with no overlap at all", "train"),
    (3L, "we saw the quick brown fox yesterday morning", "train"),
    (4L, "the lazy dog slept while the quick brown fox ran", "train")
  ).toDF("doc_id", "text", "split")

  test("contamination flags exactly the docs sharing a 3-gram with the eval set") {
    val got = CorpusOps.contamination(corpus, "doc_id", "text",
        col("split") === "eval", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 3 and 4 share "the quick brown" / "quick brown fox" (and 4
    // also "the lazy dog"); doc 2 shares nothing; doc 1 is eval.
    assert(got == Map(3L -> 2L, 4L -> 3L))
  }

  test("shared-gram pairs count distinct common n-grams exactly") {
    val got = CorpusOps.sharedGramPairs(corpus, "doc_id", "text", n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute-force expectation over distinct 3-gram sets
    def grams(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val docs = corpus.collect().map(r => r.getLong(0) -> grams(r.getString(1)))
    val expect = (for {
      (ia, ga) <- docs; (ib, gb) <- docs if ia < ib
      n = (ga & gb).size if n > 0
    } yield (ia, ib) -> n.toLong).toMap
    assert(got == expect)
    assert(got.nonEmpty)
    // hot-gram cap drops the boilerplate bucket
    val capped = CorpusOps.sharedGramPairs(corpus, "doc_id", "text", n = 3,
      cap = Some(1)).count()
    assert(capped <= got.size)
  }

  test("attributed contamination also counts the eval docs hit") {
    val withEval2 = corpus.union(
      Seq((5L, "the lazy dog sat on the mat", "eval"))
        .toDF("doc_id", "text", "split"))
    val got = CorpusOps.contaminationAttributed(withEval2, "doc_id", "text",
        col("split") === "eval", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(3L) == (2L, 1L))   // only eval doc 1 shares with 3
    assert(got(4L) == (3L, 2L))   // doc 4 hits "the lazy dog" in both
  }

  test("duplicated spans merge overlapping dup 3-grams into maximal ranges") {
    val spanDocs = Seq(
      (1L, "a b c d e f g h i j"),       // shares a..g 3-grams with doc 2
      (2L, "x y a b c d e f g z"),
      (3L, "m n o p m n o p m n o"),     // self-repeating → full-doc span
      (4L, "q r s t u v w"),             // unique → no spans
      (5L, "a b c q d e f"),             // dup starts {1,3,5}: gaps of 2
      (6L, "x a b c x"),                 //   overlap at n=3 → ONE span
      (7L, "y c q d y")
    ).toDF("doc_id", "text")
    val got = CorpusOps.duplicatedSpans(spanDocs, "doc_id", "text",
        n = 3, minOcc = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // doc1: dup gram starts p1..p5 → tokens [1, 5+3-1=7]
    // doc2: dup gram starts p3..p7 → tokens [3, 9]
    // doc3: every gram repeats (period 4) → [1, 11] = whole doc
    // doc5: starts {1,3,5} are pairwise gap-2 (≤ n−1) → single
    //   non-overlapping span [1, 7], NOT three token-sharing spans
    assert(got == Set((1L, 1L, 7L, 7L), (2L, 3L, 9L, 7L), (3L, 1L, 11L, 11L),
      (5L, 1L, 7L, 7L), (6L, 2L, 4L, 3L), (7L, 2L, 4L, 3L)))
  }

  test("duplicated spans equal a brute-force reference on random corpora") {
    val rnd = new scala.util.Random(11)
    val n = 3
    val rndDocs = (0L until 30L).map { i =>
      val len = n + rnd.nextInt(15)
      (i, Seq.fill(len)(('a' + rnd.nextInt(3)).toChar.toString).mkString(" "))
    }
    val got = CorpusOps.duplicatedSpans(rndDocs.toDF("doc_id", "text"),
        "doc_id", "text", n = n, minOcc = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // reference: count grams globally, mark dup positions, merge runs
    val toks = rndDocs.map { case (i, t) => i -> t.split(" ").toSeq }
    val counts = toks.flatMap(_._2.sliding(n).map(_.mkString(" ")))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val expect = toks.flatMap { case (id, ts) =>
      val dupPos = ts.sliding(n).zipWithIndex.collect {
        case (g, p) if counts(g.mkString(" ")) >= 2 => p + 1
      }.toSeq
      // merge OVERLAPPING starts (gap <= n-1) into islands
      val islands = dupPos.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p - e <= n - 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.reverse
      islands.map { case (s, e) =>
        (id, s.toLong, (e + n - 1).toLong, (e + n - 1 - s + 1).toLong)
      }
    }.toSet
    assert(got == expect)
    assert(expect.nonEmpty)
  }

  test("fuzzy decontamination flags the near-duplicate of an eval doc") {
    val fc = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "eval"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "train"),
      (3L, "one two three four five six seven eight nine ten", "train")
    ).toDF("doc_id", "text", "split")
    val got = CorpusOps.fuzzyContamination(fc, "doc_id", "text",
        col("split") === "eval", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 2 is an exact dup of eval doc 1 (J = 1.0, every band
    // collides); doc 3 shares nothing.
    assert(got == Map(2L -> ((1L, 1.0))))
  }

  test("vocab growth counts novel bigrams per bucket with a running total") {
    import graft.operators.TextStats
    val vg = Seq(
      (0L, "a b c"),    // bucket 2 (docs 0-1): "a b", "b c", "b d" novel
      (1L, "a b d"),
      (2L, "c a b"),    // bucket 4 (docs 2-3): "c a" novel
      (3L, "a b c d"),  // … and "c d"
      (4L, "z"),        // <2 tokens: no bigram, bucket 6 must NOT appear
      (5L, "")          // empty doc likewise
    ).toDF("doc_id", "text")
    val got = TextStats.vocabGrowth(vg, "doc_id", "text", bucket = 2)
      .orderBy("bucket_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((2L, 3L, 3L), (4L, 2L, 5L)))
  }

  test("span cut removes exactly the duplicated spans and keeps the rest") {
    val cs = Seq(
      (0L, "a b c d e f g"),     // shared 5-gram at p=1 → span [1,5], keep "f g"
      (1L, "x a b c d e y"),     // same gram at p=2 → span [2,6], keep "x y"
      (2L, "q r s"),             // <5 tokens: untouched
      (3L, "m n o p q"),         // full-doc duplicate pair → everything cut
      (4L, "m n o p q")
    ).toDF("doc_id", "text")
    val got = CorpusOps.cutSpans(cs, "doc_id", "text", n = 5, minOcc = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got == Map(
      0L -> ((7L, 5L, "f g")),
      1L -> ((7L, 5L, "x y")),
      2L -> ((3L, 0L, "q r s")),
      3L -> ((5L, 5L, "")),
      4L -> ((5L, 5L, ""))))
  }

  test("phrase fuse equals a sequential greedy word2phrase scan") {
    // dense 3-letter alphabet → candidate runs exercise the
    // islands+parity factoring against the real sequential scan
    val rnd = new scala.util.Random(7)
    val pf = (0L until 40L).map { i =>
      val n = 5 + rnd.nextInt(20)
      (i, Seq.fill(n)(('a' + rnd.nextInt(3)).toChar.toString).mkString(" "))
    }
    val got = CorpusOps.phraseFuse(pf.toDF("doc_id", "text"), "doc_id", "text",
        topPhrases = 2, minCount = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val toksMap = pf.map { case (i, t) => i -> t.split(" ").toSeq }
    val counts = toksMap.flatMap { case (_, ts) => ts.zip(ts.tail) }
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val phrases = counts.toSeq
      .sortBy { case ((w1, w2), c) => (-c, w1, w2) }.take(2).map(_._1).toSet
    toksMap.foreach { case (id, ts) =>
      var i = 0; var fused = 0
      while (i < ts.length - 1) {
        if (phrases((ts(i), ts(i + 1)))) { fused += 1; i += 2 } else i += 1
      }
      assert(got(id) == ((ts.length.toLong, fused.toLong,
        (ts.length - fused).toLong)), s"doc $id")
    }
  }

  test("source profile counts in-source dups and flags the deviant source") {
    // 5 sources of 2 docs: four with ~4-token docs, one with 40-token
    // docs (the broken crawl); src0 carries an exact duplicate pair
    // source means 4, 4.5, 5, 6, 40 → med 5, MAD 1: src4 is the
    // deviant crawl, the rest are within 2 robust SDs
    val prof = Seq(
      (1L, "a b c d", "src0"), (2L, "a b c d", "src0"),         // dup pair
      (3L, "e f g h", "src1"), (4L, "i j k l m", "src1"),
      (5L, "n o p q", "src2"), (6L, "r s t u v w", "src2"),
      (7L, "w x y z", "src3"), (8L, "a c e g i k m o", "src3"),
      (9L, ("tok " * 40).trim, "src4"), (10L, ("tok " * 40).trim, "src4")
    ).toDF("doc_id", "text", "source")
    val got = CorpusOps.sourceProfile(prof, "doc_id", "text", "source")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getBoolean(6)))).toMap
    assert(got("src0") == ((2L, 1L, false)))   // one dup doc, normal length
    assert(got("src4")._2 == 1L)               // identical 40-token docs dup too
    assert(got("src4")._3, "deviant-length source not flagged")
    assert(Seq("src1", "src2", "src3").forall(s => !got(s)._3))
  }

  test("edit-distance pairs verify with exact Levenshtein inside blocks") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.{col, lit}
    val df = Seq(
      (1L, "kitten in the yard", "en", 18L),
      (2L, "sitting in the yard", "en", 19L),     // distance 3 from doc 1
      (3L, "completely unrelated text here", "en", 30L),
      (4L, "kitten in the yard", "fr", 18L)       // other block → never paired
    ).toDF("doc_id", "text", "lang", "n_chars")
    val got = Dedup.editDistancePairs(df, "doc_id", "text",
        Seq(col("lang")), col("n_chars"), prefixLen = 80, maxDist = 5, lenTol = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 3)))
  }

  test("winnow fingerprints equal a brute-force reference on random token arrays") {
    import spark.implicits._
    import org.apache.spark.sql.graftx.SimHash64
    val rnd = new scala.util.Random(7)
    val docsW = (0 until 40).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))("w" + rnd.nextInt(12)))
    }
    val got = docsW.toDF("id", "toks")
      .select($"id", graft.functions.GraftFunctions
        .winnow_fingerprints($"toks", 3, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    def ref(toks: Seq[String], n: Int, w: Int): Seq[Long] = {
      val grams =
        if (toks.length < n) Seq(toks.mkString(" "))
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val hs = grams.map(g => SimHash64.tokenHash(g.getBytes("UTF-8")))
      val wins = if (hs.length < w) Seq(hs) else hs.sliding(w).toSeq
      wins.map(_.min).distinct.sorted
    }
    docsW.foreach { case (id, toks) =>
      assert(got(id) == ref(toks, 3, 4), s"doc $id: ${toks.mkString(" ")}")
    }
  }

  test("winnowing guarantee: a shared >= n+w-1 token run yields a common fingerprint") {
    import spark.implicits._
    // two docs share an 8-token run (n=3, w=4 → guarantee at 6) in
    // otherwise disjoint vocabulary
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val a = s"one two three $shared four five"
    val b = s"uno dos $shared tres quatro cinco seis"
    val fps = Seq((1L, a), (2L, b)).toDF("id", "text")
      .select($"id", graft.functions.GraftFunctions
        .winnow_fingerprints(graft.operators.Dedup.tokens($"text"), 3, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty)
  }

  test("token entropy: 0 for constant doc, ln(n) for all-distinct doc") {
    import graft.operators.TextStats
    val df = Seq(
      (1L, "a a a a a a"),
      (2L, "one two three four"),
      (3L, "x x y y")
    ).toDF("doc_id", "text")
    val got = TextStats.tokenEntropy(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Double]("entropy") == 0.0)
    assert(math.abs(got(1).getAs[Double]("entropy") - math.log(4.0)) < 1e-3)
    assert(math.abs(got(2).getAs[Double]("entropy") - math.log(2.0)) < 1e-3)
    assert(got.map(_.getAs[Long]("n_tokens")).toSeq == Seq(6L, 4L, 4L))
  }

  test("repetition signals: degenerate doc maxes out, distinct doc zeroes out") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "one two three four five six")
    ).toDF("doc_id", "text")
    val got = CorpusOps.repetitionSignals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(1L)._1 > 0.8)            // 5/6 duplicate tokens
    assert(got(1L)._2 == 1.0)           // the only bigram is "spam spam"
    assert(got(1L)._3 == 1.0)           // every trigram repeats
    assert(got(2L) == ((0.0, 0.2, 0.0)))// all distinct; 1-of-5 bigram share
  }

  test("chunking with stride == chunkSize partitions the token stream exactly") {
    val df = Seq((1L, (1 to 70).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = CorpusOps.chunk(df, "doc_id", "text", chunkSize = 32, stride = 32)
      .orderBy("chunk_id").collect()
    assert(chunks.map(_.getAs[Int]("chunk_toks")).toSeq == Seq(32, 32, 6))
    val rebuilt = chunks.map(_.getAs[String]("chunk_text")).mkString(" ")
    assert(rebuilt == (1 to 70).map(i => s"w$i").mkString(" "))
  }

  test("overlapping chunks advance by the stride") {
    val df = Seq((1L, (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = CorpusOps.chunk(df, "doc_id", "text", chunkSize = 32, stride = 16)
      .orderBy("chunk_id").collect()
    assert(chunks.length == 3)          // starts 1, 17, 33
    assert(chunks(1).getAs[String]("chunk_text").startsWith("w17 "))
    assert(chunks(2).getAs[Int]("chunk_toks") == 8)
  }

  test("packing lays streams head-to-tail with coherent block spans") {
    val df = Seq(
      (1L, (1 to 300).map(_ => "x").mkString(" "), "a"),
      (2L, (1 to 300).map(_ => "x").mkString(" "), "a"),
      (3L, (1 to 100).map(_ => "x").mkString(" "), "b")
    ).toDF("doc_id", "text", "lang")
    val got = CorpusOps.pack(df, "doc_id", "text", col("lang"), capacity = 512)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("block_offset"), r.getAs[Long]("first_block"),
          r.getAs[Long]("last_block"))).toMap
    assert(got(1L) == ((0L, 0L, 0L)))     // tokens 0-299 in block 0
    assert(got(2L) == ((300L, 0L, 1L)))   // 300-599 straddles the boundary
    assert(got(3L) == ((0L, 0L, 0L)))     // stream b packs independently
  }
}
