package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a pretraining data pipeline runs
  * after dedup and before tokenizer sharding (SURVEY.md §2.3):
  * benchmark decontamination, repetition signals, fixed-window
  * chunking, and concat-and-chunk sequence packing.
  *
  * Scale design (100 TB): decontamination is an equi-join on gram
  * hashes where the eval side is tiny (benchmarks are MBs, corpora
  * are TBs) and therefore broadcast — the corpus never shuffles.
  * Repetition signals shuffle each doc's grams once, keyed on
  * (doc, gram). Chunking is a pure narrow posexplode. Packing uses a
  * per-stream running sum, so streams (here: languages) pack
  * independently — the window never sees more than one stream's
  * rows in a partition.
  */
object CorpusOps {

  import Dedup.{tokens, shingles}

  /** Benchmark decontamination: flag corpus documents sharing any
    * word n-gram with an eval/benchmark document. Returns one row per
    * contaminated corpus doc with the count of distinct shared grams.
    *
    * Scale shape: the DISTINCT eval gram set (benchmarks are MBs) is
    * broadcast and the corpus side is a LEFT SEMI probe — each corpus
    * (doc, gram) row survives at most once, so the cost is linear in
    * corpus grams no matter how hot a gram is. (An inner join keyed on
    * gram that attributes WHICH eval docs were hit multiplies every
    * corpus row by the eval docs sharing that gram — quadratic on hot
    * boilerplate grams; see [[contaminationAttributed]].)
    * Grams travel as 64-bit hashes: the corpus side never shuffles
    * strings, and with the broadcast it never shuffles at all before
    * the final per-doc count.
    */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    isEval: Column, n: Int): DataFrame = {
    val ex = explodedGrams(docs, idCol, textCol, isEval, n)
    val evalGrams = ex.filter(col("is_eval")).select("g").distinct()
    ex.filter(!col("is_eval"))
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Exact shared-n-gram pair mining — the signal behind exact-
    * substring dedup (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better"): pairs of documents sharing ≥
    * `minShared` distinct word n-grams, with the shared-gram count.
    * Unlike Jaccard near-dedup (d02/d06) this scores ABSOLUTE verbatim
    * overlap, so a short boilerplate block inside two long unrelated
    * documents still surfaces.
    *
    * Shape: one codegen pass per doc to the distinct gram-hash set
    * (`ngram_hashes`), explode, then a gram-keyed self-join — grams
    * travel as 64-bit hashes, never strings. Bucket fan-out is B² per
    * gram: at word n-grams of n≥4, natural-language buckets are tiny
    * (only verbatim repeats collide); `cap` drops grams hotter than
    * cap docs (boilerplate headers) when exactness isn't required —
    * None (default) preserves the exact count.
    */
  def sharedGramPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 4, minShared: Long = 1,
                      cap: Option[Int] = None): DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
        explode(graft.functions.GraftFunctions
          .ngram_hashes(tokens(col(textCol)), n)).as("g"))
      // Both sides of the self-join reuse this lineage. Not unpersisted
      // here (the lazy result must outlive the call): loop callers
      // should clearCache between actions as Verify/Bench do, else
      // LRU block eviction bounds the cache.
      .persist()
    val pruned = cap match {
      case Some(c) =>
        val hot = grams.groupBy("g").agg(count(lit(1)).as("nd"))
          .filter(col("nd") > c).select("g")
        grams.join(broadcast(hot), Seq("g"), "left_anti")
      case None => grams
    }
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** L65 — asymmetric containment near-dup (Broder 1997's
    * |A∩B|/|A|): catches a document QUOTED/EMBEDDED inside a larger
    * one, which symmetric Jaccard misses because the union is
    * dominated by the container. Candidates come from the shared-
    * n-gram inverted index ([[sharedGramPairs]] — size-based blocking
    * is unusable here by definition: containee and container differ
    * in size); the verify step is one sorted-long multiset merge per
    * pair; the keep test is integer cross-multiplied
    * (100·inter ≥ threshPct·|src|). Directed output: both
    * orientations of a candidate pair are tested.
    *
    * GOVERNANCE AT SCALE: with `cap = None` the candidate index is
    * EXACT but a boilerplate n-gram shared by B documents fans out
    * B² pairs — at 100 TB a single hot 4-gram (license header, nav
    * bar) makes the index quadratic. Production runs MUST pass
    * `cap = Some(c)` (same hot-bucket contract as d03's LSH bucket
    * cap / s09's hot-cell cap): grams in more than c documents are
    * dropped from the index, which can only LOSE candidate pairs
    * whose every shared gram is boilerplate-hot — exactly the pairs
    * a dedup pass doesn't want anyway. The oracle-exact d26 query
    * uses cap = None because exactness is the contract there;
    * CurationOpsSpec pins capped ⊆ uncapped and equality on a
    * hot-gram-free corpus.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 4, threshPct: Int = 90,
                       cap: Option[Int] = None): DataFrame = {
    import graft.functions.GraftFunctions
    val pairs = sharedGramPairs(docs, idCol, textCol, n = n, cap = cap)
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"))
    val toks = docs.select(col(idCol).cast("long").as("id"),
      sort_array(array_distinct(
        transform(tokens(col(textCol)), t => xxhash64(t)))).as("tk"))
    val j = pairs
      .join(toks.select(col("id").as("id_a"), col("tk").as("ta")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("tk").as("tb")), "id_b")
      .withColumn("inter",
        GraftFunctions.sorted_long_intersect_size(col("ta"), col("tb")))
    val d1 = j.select(col("id_a").as("contained_id"),
      col("id_b").as("container_id"), col("inter"), size(col("ta")).as("n_src"))
    val d2 = j.select(col("id_b").as("contained_id"),
      col("id_a").as("container_id"), col("inter"), size(col("tb")).as("n_src"))
    d1.unionByName(d2)
      .filter(col("inter").cast("long") * lit(100L) >=
        col("n_src").cast("long") * lit(threshPct.toLong))
      .select(col("contained_id"), col("container_id"),
        col("inter").cast("long").as("inter"),
        col("n_src").cast("long").as("n_src"),
        round(col("inter").cast("double") / col("n_src").cast("double"), 3)
          .as("containment"))
  }

  /** Decontamination with eval-doc attribution (which/how many eval
    * docs each corpus doc collides with). The gram-keyed inner join
    * multiplies hot grams by their eval-doc frequency — use on
    * blocked/filtered corpora, not raw 100 TB.
    */
  def contaminationAttributed(docs: DataFrame, idCol: String,
                              textCol: String, isEval: Column,
                              n: Int): DataFrame = {
    val ex = explodedGrams(docs, idCol, textCol, isEval, n)
    val evalGrams = ex.filter(col("is_eval"))
      .select(col("g"), col("id").as("eval_id")).distinct()
    ex.filter(!col("is_eval"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("id").as("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared_grams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }

  private def explodedGrams(docs: DataFrame, idCol: String,
                            textCol: String, isEval: Column,
                            n: Int): DataFrame =
    docs.select(col(idCol).as("id"), isEval.as("is_eval"),
        graft.functions.GraftFunctions
          .ngram_hashes(tokens(col(textCol)), n).as("grams"))
      .select(col("id"), col("is_eval"), explode(col("grams")).as("g"))

  /** L35 — per-document duplicated-gram fraction: of a doc's DISTINCT
    * word n-grams, what share also appears in at least one other
    * document. This is the exact-substring-dedup DIAGNOSTIC (Lee et
    * al. 2022): d11 mines the offending pairs, this scores each doc's
    * verbatim-overlap exposure so a pipeline can rank/threshold docs
    * before cutting. Shape: per-doc distinct gram hashes (one codegen
    * pass), one groupBy(gram) to find grams in ≥2 docs, a semi-join
    * back, one per-doc count — all linear shuffles on gram/doc keys;
    * grams travel as 64-bit hashes, never strings.
    *
    * CACHING: persists the exploded gram table (read by three
    * downstream plans) for the returned lazy result; callers
    * `spark.catalog.clearCache()` between materialized actions.
    */
  def dupGramFraction(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 4): DataFrame = {
    // One linear chain: explode → df window on the gram key → one
    // doc-keyed aggregate. (The previous form aggregated the gram
    // counts, semi-joined them BACK onto the exploded table, and
    // joined a separate per-doc total — three shuffles and a persist
    // where two shuffles and none suffice. Grams are distinct per
    // doc, so the window count IS the doc frequency.)
    docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.GraftFunctions
          .ngram_hashes(tokens(col(textCol)), n)).as("g"))
      .withColumn("nd", count(lit(1)).over(Window.partitionBy("g")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_grams").cast("double"), 4))
  }

  /** L42 — maximal duplicated-span extraction: the POSITIONAL form of
    * exact-substring dedup (Lee et al. 2022) — where d11/t18 score
    * WHICH docs overlap and HOW MUCH, this reports WHERE: for each
    * document, the maximal token ranges covered by word n-grams that
    * occur ≥ `minOcc` times corpus-wide (including same-doc repeats).
    * A cutting pass can then drop exactly these spans instead of the
    * whole document — the surgical variant of substring dedup.
    *
    * Method: positional gram hashes (one codegen pass, order
    * preserved), one groupBy(gram) to find duplicated grams, a
    * semi-join back to keep duplicated positions, then islands over
    * the OVERLAP relation: gram starts p and q (p < q) cover
    * overlapping token ranges iff q − p ≤ n − 1, so an island breaks
    * exactly where the start gap exceeds n − 1 (a running sum of
    * break flags via lag — NOT the consecutive-only pos − row_number
    * trick, which would emit two "maximal" spans sharing tokens for
    * starts 1 and 3 at n = 3). A merged run p1..p2 covers tokens
    * [p1, p2+n−1]; output spans never overlap.
    *
    * Scale shape: two linear shuffles (gram key, then doc key); grams
    * travel as 64-bit hashes. The islands window partitions by doc —
    * never a global sort. Docs with < n tokens are excluded (they
    * have no n-gram positions).
    *
    * CACHING: persists the positional gram table (read by the
    * dup-gram count and the semi-join); callers
    * `spark.catalog.clearCache()` between materialized actions.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 5, minOcc: Long = 2): DataFrame = {
    // df attach via window on the gram key (one shuffle) instead of a
    // groupBy + semi-join back (two on the same key + a persist).
    val grams = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        posexplode(graft.functions.GraftFunctions
          .ngram_hashes(col("toks"), n, dedupSort = false)).as(Seq("p0", "g")))
    val w = Window.partitionBy("doc_id").orderBy("p")
    grams
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("cnt") >= minOcc)
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"))
      .withColumn("brk",
        when(col("p") - lag("p", 1).over(w) <= n - 1, 0L).otherwise(1L))
      .withColumn("grp", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "grp")
      .agg(min("p").as("span_start"), (max("p") + n - 1).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_toks"))
  }

  /** L52 — surgical span-cut application: the EMIT half of positional
    * substring dedup. [[duplicatedSpans]] produces the cut list (the
    * maximal corpus-duplicated token ranges); this operator applies
    * it — every document is re-emitted with exactly those token
    * ranges removed, plus kept/cut counts. Together they are the full
    * Lee et al. 2022 exact-substring dedup: find WHERE the corpus
    * repeats itself, then cut those spans instead of dropping whole
    * documents.
    *
    * Shape: spans aggregate to one slim array per affected doc (docs
    * with no duplicated span carry NULL and pass through untouched),
    * joined back on doc_id — one linear shuffle. The cut itself is a
    * narrow codegen'd `filter(toks, (tok, i) -> …)` over the token
    * array (span lists per doc are short — bounded by n_tokens/n),
    * and the re-emitted text is a deterministic order-preserving
    * concat. Output: (doc_id, n_tokens, n_cut, cut_text), text in
    * normalized token form.
    */
  def cutSpans(docs: DataFrame, idCol: String, textCol: String,
               n: Int = 5, minOcc: Long = 2): DataFrame = {
    val spans = duplicatedSpans(docs, idCol, textCol, n, minOcc)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("kept",
        when(col("spans").isNull, col("toks")).otherwise(expr(
          """filter(toks, (tok, i) ->
            |  NOT exists(spans, sp ->
            |    i + 1 >= sp.span_start AND i + 1 <= sp.span_end))"""
            .stripMargin)))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_cut"),
        concat_ws(" ", col("kept")).as("cut_text"))
  }

  /** L43 — FUZZY benchmark decontamination: where [[contamination]]
    * flags exact n-gram overlap, this catches paraphrased / lightly
    * edited benchmark leakage via MinHash-LSH banding between the
    * corpus and the eval set, verified with exact Jaccard on distinct
    * token sets. Returns a per-corpus-doc verdict: how many eval docs
    * it matches at `threshold`, and the best (max) Jaccard.
    *
    * Scale shape: signatures are one codegen pass per doc; the eval
    * side of the (band, bucket) join is benchmark-sized and
    * BROADCAST, so the corpus never shuffles — candidates fan out at
    * most |eval ∩ bucket| per corpus row, bounded by the eval set.
    * The verify join ships slim sorted hash arrays for candidates
    * only. Same LSH parameters/selectivity reasoning as
    * [[Dedup.minhashLshPairs]] (d03).
    *
    * CACHING: persists the signature table (read by the band explode
    * and both verify joins); callers `spark.catalog.clearCache()`
    * between materialized actions.
    */
  def fuzzyContamination(docs: DataFrame, idCol: String, textCol: String,
                         isEval: Column, threshold: Double,
                         numHashes: Int = 64, bands: Int = 8): DataFrame = {
    import graft.functions.GraftFunctions
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val base = docs
      .select(col(idCol).as("id"), isEval.as("is_eval"),
        array_distinct(tokens(col(textCol))).as("sh"))
      .withColumn("mh", GraftFunctions.minhash_signature(col("sh"), numHashes))
      .withColumn("nt", size(col("sh")))
      // read by the band explode (twice: eval + corpus sides) and the
      // verify joins; callers clearCache between actions.
      .persist()
    val banded = base.select(
        col("id"), col("is_eval"), col("nt"),
        posexplode(array((0 until bands).map(b =>
          GraftFunctions.mix_hash(
            (lit(b.toLong) +: (0 until r).map(j =>
              element_at(col("mh"), b * r + j + 1))): _*)): _*)))
      .toDF("id", "is_eval", "nt", "band", "bucket")
    val ev = banded.filter(col("is_eval"))
      .select(col("band"), col("bucket"), col("id").as("eval_id"), col("nt").as("nt_e"))
    // size-ratio prune (lossless under the final J ≥ t filter:
    // J(A,B) ≤ min/max of the set sizes).
    val tPermille = (threshold * 1000).toLong
    val candidates = banded.filter(!col("is_eval"))
      .join(broadcast(ev), Seq("band", "bucket"))
      // 1000L: the int token count times 1000 overflows IntegerType
      // past ~2.1M distinct tokens/doc (ANSI-fatal); long math first.
      .filter(least(col("nt"), col("nt_e")) * lit(1000L) >=
        greatest(col("nt"), col("nt_e")) * tPermille)
      .select(col("id").as("doc_id"), col("eval_id"))
      .distinct()
    // Split the verify-side sets by eval flag BEFORE the joins: only
    // the eval sets broadcast (benchmark-suite-sized by definition) —
    // broadcasting the unfiltered table would ship the whole CORPUS's
    // token-hash arrays to every executor, which cannot work at 100 TB.
    val sets = base.select(col("id"), col("is_eval"),
      sort_array(transform(col("sh"), t => xxhash64(t))).as("hs"))
    candidates
      .join(sets.filter(!col("is_eval")).select(col("id").as("doc_id"),
        col("hs").as("hs_a")), Seq("doc_id"))
      .join(broadcast(sets.filter(col("is_eval")).select(col("id").as("eval_id"),
        col("hs").as("hs_b"))), Seq("eval_id"))
      .withColumn("inter", graft.functions.GraftFunctions
        .sorted_long_intersect_size(col("hs_a"), col("hs_b")))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("hs_a")) + size(col("hs_b")) - col("inter")).cast("double"))
      .filter(col("jac") >= threshold)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_matches"),
        round(max(col("jac")), 3).as("best_jaccard"))
  }

  /** L49 — phrase mining + greedy fuse (word2phrase, Mikolov et al.
    * 2013): learn the top-`topPhrases` bigram collocations (by count,
    * deterministic (cnt desc, w1, w2) tie-break), then fuse their
    * occurrences in every document with the greedy LEFT-TO-RIGHT scan
    * the original tool uses — a token consumed by a fuse can't start
    * the next one ("a a a" with phrase (a,a) fuses once).
    *
    * The greedy scan is inherently sequential per doc, but it
    * factors exactly: candidate positions form runs (gaps-and-
    * islands), and within a run starting at s the applied fuses are
    * s, s+2, s+4, … — so "applied" = even offset from the island
    * start. That turns the sequential scan into two windows over the
    * candidate stream (islands, then min-per-island), all integer
    * logic — engine-replayable bit-for-bit.
    *
    * Shape: one positional bigram pass (corpus-linear), a vocabulary-
    * sized phrase table broadcast back, windows partitioned by doc.
    * Returns per-doc (n_tokens, n_fused, n_after).
    *
    * CACHING: persists the tokenized corpus (read by the bigram pass
    * and the final size join); callers `spark.catalog.clearCache()`
    * between materialized actions.
    */
  def phraseFuse(docs: DataFrame, idCol: String, textCol: String,
                 topPhrases: Int = 5, minCount: Long = 10): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      // read by the bigram pass and the final size join; callers
      // clearCache between actions (Verify/Bench contract).
      .persist()
    val bg = toks.filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        posexplode(Dedup.bigramZip(col("toks"))).as(Seq("p0", "z")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"),
        col("z.w1").as("w1"), col("z.w2").as("w2"))
    val phrases = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(topPhrases)
      .select("w1", "w2")
    val wIsl = Window.partitionBy("doc_id").orderBy("p")
    val cand = bg.join(broadcast(phrases), Seq("w1", "w2"))
      .select(col("doc_id"), col("p"))
      .withColumn("grp", col("p") - row_number().over(wIsl))
    val wGrp = Window.partitionBy("doc_id", "grp")
    val fused = cand
      .withColumn("applied", (col("p") - min("p").over(wGrp)) % 2 === 0)
      .groupBy("doc_id")
      .agg(sum(when(col("applied"), 1L).otherwise(0L)).as("n_fused"))
    toks.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(fused, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_fused"), lit(0L)).as("n_fused"))
      .withColumn("n_after", col("n_tokens") - col("n_fused"))
  }

  /** L50 — per-source curation profile: the "which crawl went bad"
    * dashboard. Per source: doc count, token mass, exact-duplicate
    * docs (content-hash collisions within the source), mean document
    * length, and a ROBUST z-score of that mean against the
    * across-source distribution (median/MAD, the same rSD ≈
    * 1.4826·MAD convention as F12's channel stats) — sources whose
    * length profile deviates hard are flagged for review (truncated
    * crawls, boilerplate floods, parser breakage).
    *
    * Shape: one corpus pass to per-source aggregates (linear shuffle
    * on source), then median/MAD/z over the SOURCE table — group-
    * cardinality rows, broadcast everywhere. The corpus is touched
    * exactly once.
    *
    * CACHING: persists the source-level aggregate (group-cardinality
    * rows, read by the median/MAD/projection passes); callers
    * `spark.catalog.clearCache()` between materialized actions.
    */
  def sourceProfile(docs: DataFrame, idCol: String, textCol: String,
                    srcCol: String): DataFrame = {
    val per = docs.select(col(srcCol).as("source"),
      size(tokens(col(textCol))).cast("long").as("n_tok"),
      md5(Dedup.normText(col(textCol))).as("h"))
    val src = per.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        countDistinct(col("h")).as("n_distinct"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_docs") - col("n_distinct")).as("dup_docs"),
        (col("n_tokens").cast("double") / col("n_docs").cast("double"))
          .as("mean_tok"))
      // the source table is read by the median, the MAD, and the
      // final projection; callers clearCache between actions.
      .persist()
    val med = src.agg(percentile(col("mean_tok"), lit(0.5)).as("med"))
    val cuts = src.crossJoin(broadcast(med))
      .agg(max("med").as("med"),
        percentile(abs(col("mean_tok") - col("med")), lit(0.5)).as("mad"))
    // mad == 0 (over half the sources share one mean) would divide by
    // zero — ANSI-fatal. Convention: zero spread → any deviation is
    // significant; rz = ±9999 sentinel (0 when dev is 0 too), the
    // same CASE both engines replay.
    src.crossJoin(broadcast(cuts))
      .withColumn("dev", col("mean_tok") - col("med"))
      .withColumn("rz",
        when(col("mad") > 0, col("dev") / (lit(1.4826) * col("mad")))
          .when(col("dev") === 0, lit(0.0))
          .otherwise(signum(col("dev")) * lit(9999.0)))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("dup_docs"),
        round(col("mean_tok"), 4).as("mean_tok"),
        round(col("rz"), 4).as("tok_robust_z"),
        (abs(col("rz")) > 2).as("outlier"))
  }

  /** Repetition signals (the Gopher-style quality heuristics):
    * duplicate-token fraction, most-frequent-bigram share, and the
    * fraction of trigram occurrences that are repeats. High values
    * mark boilerplate / degenerate generations.
    *
    * The token fraction is narrow; the gram shares explode once and
    * aggregate keyed on (doc, gram) — linear shuffle, map-side
    * partial counts.
    */
  def repetitionSignals(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks"))
    val word = base.select(col("doc_id"),
      round(lit(1.0) - size(array_distinct(col("toks"))).cast("double") /
        size(col("toks")).cast("double"), 4).as("dup_word_frac"))
    def gramShare(n: Int, out: String, dupShare: Boolean): DataFrame =
      base.select(col("doc_id"),
          explode(graft.functions.GraftFunctions
            .ngram_hashes(col("toks"), n, dedupSort = false)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id")
        .agg(round((if (dupShare)
            sum(when(col("cnt") > 1, col("cnt")).otherwise(lit(0)))
          else max(col("cnt"))).cast("double") /
          sum(col("cnt")).cast("double"), 4).as(out))
    word
      .join(gramShare(2, "top_bigram_frac", dupShare = false), Seq("doc_id"))
      .join(gramShare(3, "dup_trigram_frac", dupShare = true), Seq("doc_id"))
  }

  /** Fixed-window chunking with stride: every document becomes
    * ⌈|toks|/stride⌉ windows of up to `chunkSize` tokens starting at
    * 1, 1+stride, 2·stride+1, … Purely narrow (posexplode over the
    * start offsets) — chunking 100 TB is a map job.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, stride: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(1), size(col("toks")), lit(stride)))
          .as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ", slice(col("toks"), col("start"), lit(chunkSize)))
          .as("chunk_text"),
        least(size(col("toks")) - col("start") + 1, lit(chunkSize))
          .as("chunk_toks"))

  /** Concat-and-chunk sequence packing: within each stream (partition
    * key), documents are laid head-to-tail in `orderCol` order into
    * fixed `capacity`-token blocks; a document knows its block span
    * and offset. This is the GPT-style packing layout — the running
    * sum is per-stream, so 100 TB packs as thousands of independent
    * streams, never one global window.
    */
  def pack(docs: DataFrame, idCol: String, textCol: String,
           streamCol: Column, capacity: Int): DataFrame = {
    val w = Window.partitionBy("stream").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    docs.select(col(idCol).as("doc_id"), streamCol.as("stream"),
        size(tokens(col(textCol))).as("n_toks"))
      .withColumn("cum_before",
        coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .select(col("stream"), col("doc_id"), col("n_toks"),
        (col("cum_before") % capacity).as("block_offset"),
        expr(s"cum_before div $capacity").as("first_block"),
        expr(s"(cum_before + n_toks - 1) div $capacity").as("last_block"))
  }

  /** L54 — cross-source n-gram overlap matrix: pairwise Jaccard of
    * distinct word-n-gram sets between sources (which crawls/dumps
    * duplicate each other — the inter-snapshot dedup dashboard).
    *
    * Shape: one linear shuffle to distinct (source, gram), then
    * gram → sorted source SET. The set is bounded by the number of
    * sources (dump-level, small), so the per-gram pair expansion is
    * ≤ S²/2 rows however hot the gram — never a per-gram doc×doc
    * blowup — and the final aggregation is S²-sized. Per-source
    * distinct-gram counts ride in on a broadcast (S rows); Jaccard
    * denominators come from inclusion–exclusion.
    *
    * Jaccard is reported half-up at 4 dp in integer space
    * (floor((20000·∩ + ∪)/(2∪))/10⁴) — exact in both engines.
    */
  def sourceOverlap(docs: DataFrame, idCol: String, textCol: String,
                    srcCol: String, n: Int = 3): DataFrame = {
    // Grams travel as xxhash64 LONGS — the vocabulary is corpus-sized
    // and an 8-byte key beats a ~25-byte string through the shuffle;
    // hash-equality ≡ string-equality is the d03/d11-established
    // contract (collision odds ~n²/2⁶⁴). The fused native
    // `ngram_hashes` (one array scan: gram → hash → dedup) replaces
    // a transform-over-shingles lambda chain whose inlined tokenize
    // re-evaluated per element (the d08/t25 lesson; measured 17 s →
    // sub-second for the gram stage at sf0.1).
    val grams = docs.select(col(srcCol).as("source"),
      explode(graft.functions.GraftFunctions
        .ngram_hashes(tokens(col(textCol)), n)).as("gm"))
    val srcs = docs.select(col(srcCol).as("source")).distinct()
    if (srcs.count() <= 64) sourceOverlapBitmask(grams, srcs)
    else sourceOverlapSets(grams)
  }

  /** Fast path (≤ 64 sources, the dump-level norm): each gram's
    * source SET is a LONG BITMASK built by `bit_or` — a fully
    * codegen'd primitive aggregate, no per-group set state — and
    * grams sharing a mask COLLAPSE before any expansion
    * (`groupBy(mask).count`, ≤ 2^S but in practice a handful of
    * rows), so per-source counts and pair counts are computed over
    * mask-cardinality rows, never gram-cardinality. Measured at
    * sf0.1: 12.3 s (string sets) → ~2 s. Bit index = lexicographic
    * source rank, so pair order matches the set path exactly.
    */
  private def sourceOverlapBitmask(grams: DataFrame, srcs: DataFrame): DataFrame = {
    val w = Window.orderBy("source")
    // global window over the source DIM (≤ 64 rows) — driver-small.
    val srcIdx = srcs.withColumn("idx", row_number().over(w) - 1)
    val masks = grams.join(broadcast(srcIdx), "source")
      .groupBy("gm")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), idx))").as("mask"))
    val mc = masks.groupBy("mask").agg(count(lit(1)).as("cnt"))
      .withColumn("bits",
        expr("filter(sequence(0, 63), i -> (mask & shiftleft(CAST(1 AS BIGINT), i)) != 0)"))
      .persist() // mask-cardinality rows; callers clearCache (library contract)
    val ns = mc.select(explode(col("bits")).as("idx"), col("cnt"))
      .groupBy("idx").agg(sum("cnt").as("n"))
    val pairs = mc.filter(size(col("bits")) >= 2)
      .select(col("cnt"), explode(flatten(transform(col("bits"), (x, i) =>
        transform(slice(col("bits"), i + lit(2), size(col("bits"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("ia"), col("p.b").as("ib"))
      .agg(sum("cnt").as("inter"))
    val named = pairs
      .join(broadcast(srcIdx.select(col("idx").as("ia"), col("source").as("src_a"))), "ia")
      .join(broadcast(srcIdx.select(col("idx").as("ib"), col("source").as("src_b"))), "ib")
      .join(broadcast(ns.select(col("idx").as("ia"), col("n").as("n_a"))), "ia")
      .join(broadcast(ns.select(col("idx").as("ib"), col("n").as("n_b"))), "ib")
    finishOverlap(named)
  }

  /** Fallback (> 64 sources): gram → sorted distinct source set via
    * ONE collect_set aggregation (it absorbs the (source, gram)
    * dedup); per-source counts re-derived from the persisted set
    * relation, not a second corpus pass.
    */
  private def sourceOverlapSets(grams: DataFrame): DataFrame = {
    val sets = grams.groupBy("gm")
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .persist() // callers clearCache (library contract)
    val ns = sets.select(explode(col("ss")).as("source"))
      .groupBy("source").agg(count(lit(1)).as("n"))
    val pairs = sets
      .filter(size(col("ss")) >= 2)
      .select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + lit(2), size(col("ss"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("src_a"), col("p.b").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    val named = pairs
      .join(broadcast(ns.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(ns.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
    finishOverlap(named)
  }

  /** Common tail: inclusion–exclusion union + half-up 4dp Jaccard.
    * The half-up floor runs as DECIMAL(38,0) integral division (as
    * f16's fit does), exact at any count magnitude — a double-space
    * floor would lose integer exactness once 20000·inter + u crosses
    * 2^53 (~4.5e11 shared grams), well inside 100 TB-corpus range.
    */
  private def finishOverlap(named: DataFrame): DataFrame =
    named
      .withColumn("u", col("n_a") + col("n_b") - col("inter"))
      .select(col("src_a"), col("src_b"), col("inter"), col("n_a"), col("n_b"),
        (expr("(CAST(inter AS DECIMAL(38,0)) * 20000 + u) div " +
            "(CAST(u AS DECIMAL(38,0)) * 2)").cast("double")
          / lit(10000.0)).as("jaccard"))

  /** L122 — SFT CHAT-TEMPLATE rendering with LOSS-MASK offsets (the
    * formatting step every supervised-fine-tuning corpus goes
    * through: interleaved turns are flattened into ONE training
    * string under a template — `<|role|>content<|end|>` here, the
    * shape of ChatML/Llama templates — and the trainer needs the
    * CHARACTER span of each assistant turn's content, because loss is
    * computed only there; prompt/user tokens are masked out). Per
    * conversation (`userCol`), turns order by (`tsCol`, `idCol`)
    * null-safely, cap at `maxTurns`, alternate user/assistant roles;
    * offsets come from a running sum of rendered-piece lengths over
    * the SAME window (one shuffle on the conversation key, rows
    * emitted per turn — the downstream shard writer reassembles with
    * concat_ws, which is why content preservation is exact). Mask
    * arithmetic: the span starts after the role header and ends
    * before the end sentinel — [mask_start, mask_end) indexes into
    * the concatenated conversation string. At 100 TB this is one
    * window per conversation — linear, partition-friendly, no
    * collect anywhere.
    */
  def chatRender(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, typeCol: String, valCol: String,
                 maxTurns: Int = 6): DataFrame = {
    val w = Window.partitionBy(userCol)
      .orderBy(coalesce(unix_micros(col(tsCol)), lit(Long.MinValue)),
        col(idCol))
    val turns = events
      .filter(col(userCol).isNotNull && col(idCol).isNotNull)
      .withColumn("turn", row_number().over(w))
      .filter(col("turn") <= maxTurns)
      .withColumn("role",
        when(pmod(col("turn"), lit(2)) === 1, "user").otherwise("assistant"))
      .withColumn("content",
        concat(coalesce(col(typeCol), lit("?")), lit(":"),
          floor(coalesce(col(valCol), lit(0.0))).cast("long")))
      .withColumn("piece",
        concat(lit("<|"), col("role"), lit("|>"), col("content"),
          lit("<|end|>")))
    val w2 = Window.partitionBy(userCol)
      .orderBy(coalesce(unix_micros(col(tsCol)), lit(Long.MinValue)),
        col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    turns
      .withColumn("start_off",
        coalesce(sum(length(col("piece")).cast("long")).over(w2), lit(0L)))
      .select(col(userCol).cast("long").as("user_id"),
        col("turn").cast("long").as("turn"), col("role"), col("piece"),
        col("start_off"),
        (col("start_off") + length(col("role")).cast("long") + lit(4L))
          .as("mask_start"),
        (col("start_off") + length(col("piece")).cast("long") - lit(7L))
          .as("mask_end"),
        when(col("role") === "assistant", 1L).otherwise(0L).as("masked"))
  }
}
