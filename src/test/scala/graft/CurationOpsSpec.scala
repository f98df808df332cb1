package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusOps, Sampling, TextStats}

/** Round-4 curation operators: PII redaction, bigram-LM scoring,
  * duplicated-gram fraction, mixture resampling.
  */
class CurationOpsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("redactColumns masks emails, IPv4s, and digit runs in order, with counts") {
    val df = Seq(
      (1L, "contact bob@example.com or 10.0.0.1 room 42"),
      (2L, "no pii here at all"),
      (3L, "a.b-c_d%e+f@sub.domain.org wrote 2 mails to x@y.io"),
      (4L, "ip 192.168.254.3 port 8080")
    ).toDF("id", "text")
    val cols = TextStats.redactColumns(col("text"))
    val got = df.select(col("id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((1L, 1L, 1L, "contact <EMAIL> or <IP> room <NUM>")))
    assert(got(2L) == ((0L, 0L, 0L, "no pii here at all")))
    assert(got(3L) == ((2L, 0L, 1L, "<EMAIL> wrote <NUM> mails to <EMAIL>")))
    assert(got(4L) == ((0L, 1L, 1L, "ip <IP> port <NUM>")))
  }

  test("lmCrossEntropy is 0 for fully predictable text, positive when contexts branch") {
    // corpus: "a b" always follows a->b (predictable), but c branches
    // to d and e with equal counts, so docs 3/4 pay ln(2) per c-bigram.
    val df = Seq(
      (1L, "a b a b a b"),
      (2L, "a b"),
      (3L, "c d c d"),
      (4L, "c e c e")
    ).toDF("doc_id", "text")
    val got = TextStats.lmCrossEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc 1: bigrams (a,b)x3? no: "a b a b a b" -> ab, ba, ab, ba, ab.
    // p(b|a)=1, p(a|b)=1 -> xent 0. doc 2: one bigram, p=1 -> 0.
    assert(got(1L) == ((5L, 0.0)))
    assert(got(2L) == ((1L, 0.0)))
    // docs 3/4: bigrams cd/dc/cd resp ce/ec/ce. p(d|c)=p(e|c)=1/2,
    // p(c|d)=p(c|e)=1. xent = (2*ln2 + 0)/3 rounded half-up at 4dp.
    val ln2term = BigDecimal(math.round(math.log(2) * 1e6)) / 1e6
    val exp = ((ln2term * 2 * 10000 / 3).setScale(0, BigDecimal.RoundingMode.HALF_UP) / 10000).toDouble
    assert(got(3L) == ((3L, exp)))
    assert(got(4L) == ((3L, exp)))
  }

  test("dupGramFraction scores verbatim overlap exposure per doc") {
    val df = Seq(
      (1L, "one two three four five six"),
      (2L, "zz one two three four yy"),       // shares "one two three four"
      (3L, "totally unrelated words only here")
    ).toDF("doc_id", "text")
    val got = CorpusOps.dupGramFraction(df, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc1 grams: {1234, 2345, 3456}; doc2: {z123, 1234, 234y};
    // shared gram: "one two three four" only.
    assert(got(1L) == ((3L, 1L, 0.3333)))
    assert(got(2L) == ((3L, 1L, 0.3333)))
    assert(got(3L) == ((2L, 0L, 0.0)))
  }

  test("Bpe.train learns hand-computable merges; encode applies them") {
    import graft.operators.Bpe
    val df = Seq((1L, "abc abc abd")).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", merges = 3)
    // round 1: (a,b) seen 3x beats (b,c) 2x and (b,d) 1x;
    // round 2: (ab,c) 2x; round 3: (ab,d) 1x.
    assert(merges == Seq((1, "a", "b", 3L), (2, "ab", "c", 2L), (3, "ab", "d", 1L)))
    // with only 2 merges applied, abc -> [abc] (1), abd -> [ab, d] (2)
    val enc = Bpe.encode(df, "doc_id", "text", merges.take(2).map(m => (m._2, m._3)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.toSeq == Seq((1L, 3L, 1L + 1L + 2L)))
  }

  test("Bpe merge fuse is greedy left-to-right (BPE convention)") {
    import graft.operators.Bpe
    val df = Seq((1L, "aaa")).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", merges = 2)
    // '|a||a||a|' has pair (a,a) twice; after fusing left-to-right the
    // word is [aa, a] (NOT [a, aa]), so round 2 merges (aa, a).
    assert(merges == Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("Bpe.train matches an independent in-memory BPE on random corpora") {
    import graft.operators.Bpe
    // straightforward reference: explicit symbol vectors + greedy fuse
    def refBpe(words: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
      var vocab = words.toVector.map { case (w, n) => (w.map(_.toString).toVector, n) }
      val out = Vector.newBuilder[(Int, String, String, Long)]
      var stop = false
      for (round <- 1 to k if !stop) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        vocab.foreach { case (syms, n) =>
          syms.sliding(2).filter(_.size == 2).foreach { p =>
            counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
          }
        }
        if (counts.isEmpty) stop = true
        else {
          val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
          out += ((round, l, r, n))
          vocab = vocab.map { case (syms, cnt) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += syms(i); i += 1 }
            }
            (b.result(), cnt)
          }
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val lexicon = Vector.fill(12)((1 to (2 + rnd.nextInt(5)))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
      val text = (1 to 60).map(_ => lexicon(rnd.nextInt(lexicon.size))).mkString(" ")
      val df = Seq((trial.toLong, text)).toDF("doc_id", "text")
      val words = text.split(" ").groupBy(identity).map { case (w, a) => w -> a.length.toLong }
      val got = graft.operators.Bpe.train(df, "text", merges = 6)
      assert(got == refBpe(words, 6), s"trial $trial corpus: $text")
    }
  }

  test("Bpe.train forced distributed rounds equal the local finish") {
    import graft.operators.Bpe
    val rnd = new scala.util.Random(11)
    val lexicon = Vector.fill(10)((1 to (2 + rnd.nextInt(4)))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val text = (1 to 50).map(_ => lexicon(rnd.nextInt(lexicon.size))).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val local = Bpe.train(df, "text", merges = 5)
    val dist = Bpe.train(df, "text", merges = 5, localFinishWords = 0L)
    assert(local == dist)
  }

  test("mixtureSample thins rich strata toward target weights and keeps poor ones whole") {
    val rows = (1L to 900L).map(i => (i, "en")) ++ (901L to 1000L).map(i => (i, "zh"))
    val df = rows.toDF("doc_id", "lang")
    val kept = Sampling.mixtureSample(df, "doc_id", "lang",
        Map("en" -> 0.5, "zh" -> 0.5), targetN = 200L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // zh: rate = min(1, 100/100) = 1 -> all 100 kept.
    assert(kept("zh") == 100L)
    // en: rate = 100/900 -> hash thinning lands near 100 of 900.
    assert(kept("en") > 50L && kept("en") < 150L)
    // deterministic: same call, same kept set.
    val again = Sampling.mixtureSample(df, "doc_id", "lang",
        Map("en" -> 0.5, "zh" -> 0.5), targetN = 200L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("lineDedup: first corpus occurrence survives, docs reassemble from survivors") {
    import graft.operators.Dedup
    val df = Seq(
      (1L, "alpha one\ncookie banner\nbody text a"),
      (2L, "cookie banner\nbody text b\n\n  \nalpha one"), // dups of doc1 lines + empties
      (3L, "cookie banner"),                               // fully boilerplate
      (4L, ""),                                            // empty doc
      (5L, "COOKIE   banner\r\nfresh line")                // CRLF + case/space variant
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc1: all three lines first occurrences
    assert(got(1L) == ((3L, 0L, m("alpha one\ncookie banner\nbody text a"))))
    // doc2: 'cookie banner' and 'alpha one' already seen in doc1
    assert(got(2L) == ((3L, 2L, m("body text b"))))
    // doc3: its only line is boilerplate -> empty reassembly
    assert(got(3L) == ((1L, 1L, m(""))))
    // doc4: no lines at all
    assert(got(4L) == ((0L, 0L, m(""))))
    // doc5: normText folds CRLF/case/space -> 'cookie banner' dups too
    assert(got(5L) == ((2L, 1L, m("fresh line"))))
  }

  test("paragraphDedup: blank-line units, reflow-invariant hashes, first occurrence wins") {
    import graft.operators.Dedup
    val df = Seq(
      (1L, "intro para one\n\nshared cookie banner\n\nbody a"),
      // extra blank lines tolerated ("\n{2,}"); banner dups doc1's;
      // REFLOWED copy of 'intro para one' (internal newline) dups too
      (2L, "shared cookie banner\n\n\n\nintro\npara   ONE\n\nbody b"),
      (3L, "shared cookie banner"), // fully boilerplate
      (4L, "")                      // empty doc
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == ((3L, 0L, m("intro para one\n\nshared cookie banner\n\nbody a"))))
    assert(got(2L) == ((3L, 2L, m("body b"))))
    assert(got(3L) == ((1L, 1L, m(""))))
    assert(got(4L) == ((0L, 0L, m(""))))
    // reassembly form agrees with the digest form
    val txt = Dedup.paragraphDedupText(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(txt(2L) == "body b" && txt(3L) == "" && txt(4L) == "")
  }

  test("pseudonymizeEmails: surrogates are stable across docs, raw emails vanish, equality survives") {
    import graft.operators.TextStats
    val df = Seq(
      (1L, "write to alice.w@example.org or bob@corp.io"),
      (2L, "alice.w@example.org again"), // same address -> same surrogate
      (3L, "no addresses here 1.2.3.4"),
      (4L, "a@b.co and a@b.co twice")).toDF("id", "t")
    val out = df.select(col("id"),
        TextStats.pseudonymizeEmails(col("t")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def sur(s: String): Seq[String] = "user_\\d+".r.findAllIn(s).toSeq
    // the ORIGINAL addresses are gone (surrogates themselves keep an
    // email SHAPE by design — user_N@redacted.example — so equality
    // and email-bearing stats still behave downstream)
    assert(!out(1).contains("alice.w@") && !out(1).contains("bob@corp.io"))
    assert(sur(out(1)).size == 2 && sur(out(1)).distinct.size == 2)
    // stability: the same address maps to the same surrogate in
    // another document (the join-preservation contract)
    assert(sur(out(2)).size == 1)
    assert(sur(out(1)).contains(sur(out(2)).head))
    // untouched text passes through verbatim
    assert(out(3) == "no addresses here 1.2.3.4")
    // repeated address in one doc: one surrogate, both occurrences
    assert(sur(out(4)).size == 2 && sur(out(4)).distinct.size == 1)
  }

  test("pseudonymizeEmails: a substring address cannot corrupt a longer one (longest-first fold)") {
    import graft.operators.TextStats
    // alice@x.com is a strict substring of malice@x.com and occurs
    // FIRST in the text — a match-order fold would rewrite the tail
    // of malice@x.com into 'm' + alice's surrogate. Longest-first
    // replaces malice@x.com before alice@x.com can touch it.
    val out = Seq((1L, "alice@x.com wrote to malice@x.com"))
      .toDF("id", "t")
      .select(TextStats.pseudonymizeEmails(col("t")).as("p"))
      .collect().head.getString(0)
    val sur = "user_\\d+@redacted\\.example".r.findAllIn(out).toSeq
    assert(sur.size == 2, s"expected two intact surrogates in: $out")
    assert(sur.distinct.size == 2, "distinct addresses must get distinct surrogates")
    assert(!out.contains("alice@x.com") && !out.contains("malice@x.com"))
    // no corruption residue: every '@' in the output belongs to a
    // well-formed surrogate, so the text is exactly the two
    // surrogates joined by the original connective
    assert(out == s"${sur(0)} wrote to ${sur(1)}" ||
      out == s"${sur(1)} wrote to ${sur(0)}")
  }

  test("perGroupCap keeps at most k per group, deterministically, prefix-consistent in k") {
    val df = ((1L to 30L).map(i => (i, "big")) ++ (31L to 33L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    def kept(k: Int): Map[String, Seq[Long]] =
      Sampling.perGroupCap(df, "doc_id", "source", k)
        .orderBy("source", "rk").collect()
        .map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSeq).toMap
    val k5 = kept(5)
    assert(k5("big").size == 5 && k5("small").size == 3)
    // deterministic: identical second run.
    assert(kept(5) == k5)
    // prefix-consistent: the k=2 selection is the head of the k=5 one.
    assert(kept(2)("big") == k5("big").take(2))
  }

  test("perGroupCapAgg (bounded heap) == perGroupCap (ranked window), incl. dup ids") {
    val base = ((1L to 30L).map(i => (i, "big")) ++ (31L to 33L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    // duplicate-id rows (the fuzz contract): multiset semantics must
    // match — the window emits BOTH copies with consecutive ranks.
    val df = base.union(Seq((7L, "big"), (31L, "small")).toDF("doc_id", "source"))
    def triples(d: org.apache.spark.sql.DataFrame) =
      d.select("source", "rk", "doc_id").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    for (k <- Seq(2, 5, 40)) {
      val win = triples(Sampling.perGroupCap(df, "doc_id", "source", k))
      val agg = triples(Sampling.perGroupCapAgg(df, "doc_id", "source", k))
      assert(agg == win, s"k=$k")
    }
    // the agg form plans no Window
    val plan = Sampling.perGroupCapAgg(df, "doc_id", "source", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("perGroupCap forms agree on null ids: both exclude them") {
    val df = ((1L to 10L).map(i => (java.lang.Long.valueOf(i), "big")) ++
      Seq((null.asInstanceOf[java.lang.Long], "big"),
        (null.asInstanceOf[java.lang.Long], "only_nulls")))
      .toDF("doc_id", "source")
    def triples(d: org.apache.spark.sql.DataFrame) =
      d.select("source", "rk", "doc_id").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val win = triples(Sampling.perGroupCap(df, "doc_id", "source", 5))
    val agg = triples(Sampling.perGroupCapAgg(df, "doc_id", "source", 5))
    assert(win == agg)
    // null-id rows carry no portable identity: excluded, and a group
    // of only nulls vanishes rather than emitting null selections.
    assert(!win.exists(_._1 == "only_nulls"))
    assert(win.count(_._1 == "big") == 5)
  }

  test("sourceOverlap: hand-computed pairwise gram Jaccard, sources paired lexicographically") {
    // s1 grams: {a b c, b c d}; s2: {a b c, b c e};
    // s3: {x y z, y z w} ∪ {a b c, b c d} (two docs).
    val df = Seq(
      (1L, "a b c d", "s1"),
      (2L, "a b c e", "s2"),
      (3L, "x y z w", "s3"),
      (4L, "a b c d", "s3")
    ).toDF("doc_id", "text", "source")
    val got = CorpusOps.sourceOverlap(df, "doc_id", "text", "source", n = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // s1-s2: ∩=1 {abc}, ∪=3 → 0.3333; s1-s3: ∩=2, ∪=4 → 0.5;
    // s2-s3: ∩=1, ∪=5 → 0.2.
    assert(got(("s1", "s2")) == ((1L, 2L, 2L, 0.3333)))
    assert(got(("s1", "s3")) == ((2L, 2L, 4L, 0.5)))
    assert(got(("s2", "s3")) == ((1L, 2L, 4L, 0.2)))
    assert(got.size == 3)
  }

  test("sourceOverlap bitmask path: the corpus aggregation is a primitive HashAggregate, not set state") {
    val df = Seq((1L, "a b c d", "s1"), (2L, "a b c e", "s2")).toDF("doc_id", "text", "source")
    val plan = CorpusOps.sourceOverlap(df, "doc_id", "text", "source", n = 3)
      .queryExecution.executedPlan.toString
    // bit_or over a LONG rides the codegen HashAggregate; the
    // ObjectHashAggregate (collect_set) must only appear on the
    // > 64-source fallback.
    assert(plan.contains("bit_or") || plan.toLowerCase.contains("bitor"))
    assert(!plan.contains("collect_set"))
  }

  test("sourceOverlap >64-source fallback (set path) produces the same pair semantics") {
    // 65 sources sharing one identical doc → every pair has
    // inter = n_a = n_b = 1 → Jaccard 1.0; forces the collect_set
    // fallback (bitmask path caps at 64).
    val df = (1 to 65).map(i => (i.toLong, "w x y z", f"s$i%02d")).toDF("doc_id", "text", "source")
    val got = CorpusOps.sourceOverlap(df, "doc_id", "text", "source", n = 3).collect()
    assert(got.length == 65 * 64 / 2)
    got.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)) == ((2L, 2L, 2L, 1.0)))
    }
  }

  test("gopherColumns: each rule trips on its crafted violator and passes the clean doc") {
    // 60 words of the/and/of filler → passes everything.
    val clean = (("the and of that have with be to " * 8).trim)
    val docs = Seq(
      (1L, clean),                                   // all rules pass
      (2L, "the and of short"),                      // r_len: 4 words < 50
      (3L, ("a " * 60).trim),                        // r_wordlen: mean 1 < 3; r_stop: 1 hit
      (4L, clean + " " + ("#" * 20)),                // r_symbol: 20 hashes vs 61 words
      (5L, "- b one\n- b two\n* b3\n• b4\n- b5\n- b6\n- b7\n- b8\n- b9\n- b10\nthe"),
                                                     // r_bullet: 10/11 > 90%
      (6L, "trailing...\nalso trailing...\nthe and"),// r_ellipsis: 2/3 > 30%
      (7L, clean.replace("the", "123").replace("and", "456")
        .replace("of", "789")),                      // r_alpha: 3/8 words digits-only
      (8L, "")                                       // degenerate empty doc
    ).toDF("doc_id", "text")
    val cols = TextStats.gopherColumns(col("text"))
    val got = docs.select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, name: String): Int =
      got(id).getInt(got(id).fieldIndex(name))
    assert(flag(1L, "keep") == 1)
    assert(flag(2L, "r_len") == 0 && flag(2L, "r_stop") == 1)
    assert(flag(3L, "r_wordlen") == 0 && flag(3L, "r_stop") == 0)
    assert(flag(4L, "r_symbol") == 0 && flag(4L, "r_len") == 1)
    assert(flag(5L, "r_bullet") == 0)
    assert(flag(6L, "r_ellipsis") == 0)
    assert(flag(7L, "r_alpha") == 0 && flag(7L, "r_stop") == 1)
    assert(flag(8L, "keep") == 0)
    // ratio sanity: doc 5 bullet_frac = 10/11 half-up at 4dp = 0.9091
    // (Rae et al. §A1.1 keeps bullet fractions up to 90%).
    val r5 = got(5L)
    assert(r5.getDouble(r5.fieldIndex("bullet_frac")) == 0.9091)
  }

  test("containmentPairs: directed containment; cap drops only boilerplate-hot candidates") {
    // Doc 2 is doc 1 quoted inside extra prose (containment 1.0 for
    // the 1→2 direction); docs 3..6 all share one hot boilerplate
    // 3-gram ("all rights reserved") and nothing else.
    val body = "alpha bravo charlie delta echo foxtrot golf hotel"
    val corpus = Seq(
      (1L, body),
      (2L, s"intro text here $body closing remarks follow now"),
      (3L, "all rights reserved doc three unique words one"),
      (4L, "all rights reserved doc four unique words two"),
      (5L, "all rights reserved doc five unique words three"),
      (6L, "all rights reserved doc six unique words four")
    ).toDF("doc_id", "text")
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.select("contained_id", "container_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = CorpusOps.containmentPairs(corpus, "doc_id", "text",
      n = 3, threshPct = 90, cap = None)
    val exactKeys = keyset(exact)
    assert(exactKeys.contains((1L, 2L)), "quoted doc not caught as contained")
    assert(!exactKeys.contains((2L, 1L)), "container wrongly marked contained")
    val r12 = exact.filter(col("contained_id") === 1L).collect().head
    assert(r12.getDouble(r12.fieldIndex("containment")) == 1.0)
    spark.catalog.clearCache()

    // cap=3: the "all rights reserved" gram sits in 4 docs → pruned
    // from the index. Docs 3..6 share nothing else, so their candidate
    // pairs vanish; the genuine 1↔2 containment must survive (its
    // shared grams live in exactly 2 docs).
    val capped = CorpusOps.containmentPairs(corpus, "doc_id", "text",
      n = 3, threshPct = 90, cap = Some(3))
    val cappedKeys = keyset(capped)
    assert(cappedKeys.subsetOf(exactKeys), "cap invented pairs")
    assert(cappedKeys.contains((1L, 2L)), "cap dropped a non-hot containment")
    assert(!cappedKeys.exists { case (a, b) => a >= 3L && b >= 3L },
      "boilerplate-only pairs survived the cap")
    spark.catalog.clearCache()

    // Hot-gram-free corpus (docs 1,2 only): capped == exact.
    val clean = corpus.filter(col("doc_id") <= 2L)
    val cleanExact = keyset(CorpusOps.containmentPairs(clean, "doc_id", "text",
      n = 3, threshPct = 90, cap = None))
    spark.catalog.clearCache()
    val cleanCapped = keyset(CorpusOps.containmentPairs(clean, "doc_id", "text",
      n = 3, threshPct = 90, cap = Some(3)))
    assert(cleanExact == cleanCapped && cleanExact.nonEmpty)
    spark.catalog.clearCache()
  }
}
