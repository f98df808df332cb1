package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.functions.GraftFunctions
import graft.operators.{Dedup, TextStats}

/** LLM-training-data text pipeline — SURVEY.md §2.3 (L1–L4, L8–L11)
  * over the `documents` table.
  *
  * The DuckDB oracle mirrors the normalization
  * (`lower`→`trim`→collapse-whitespace) and every ratio's operation
  * order exactly; rows-only operators (minhash LSH, simhash) get
  * invariant specs instead.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "documents")

  /** Shared SQL fragments so Spark and oracle can't drift: the one
    * DuckDB replay of Dedup.normText (ASCII-fold — see its doc).
    */
  private[queries] val normSql = PortableHashSql.norm("text")
  private[queries] def stopFilterSql(toksExpr: String, words: Seq[String]): String =
    s"len(list_filter($toksExpr, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** TextStats.safeRatio replay: a/b as doubles, 0.0 when b = 0. */
  private[queries] def safeDivSql(num: String, den: String): String =
    s"(CASE WHEN ($den) = 0 THEN 0.0 ELSE CAST($num AS DOUBLE) / CAST($den AS DOUBLE) END)"

  /** TextStats.halfUp4 replay: floor(x·10⁴ + ½)/10⁴ in pure double
    * arithmetic — engine-identical, unlike round(x, 4) (Spark rounds
    * the shortest decimal repr, DuckDB the binary value).
    */
  private def hup4Sql(x: String): String =
    s"(floor(($x) * 10000.0 + 0.5) / 10000.0)"

  /** The d15 curation chain (quality score → threshold → exact dedup
    * → 5-gram decontamination → mixture resample → per-lang manifest)
    * over any corpus relation with (doc_id, lang, source, text) —
    * d15 runs it on the raw snapshot, d30 on the line-deduped corpus,
    * d31 on the blocklist-gated corpus. ONE body, so the compositions
    * cannot drift (the Spark-side analogue of [[manifestChainSql]],
    * which plays the same role for their oracles).
    */
  private def manifestChain(d: DataFrame): DataFrame = {
    import graft.operators.{CorpusOps, Sampling}
    val norm = Dedup.normText(col("text"))
    val toks = Dedup.tokens(col("text"))
    val feat = d.select(col("doc_id"), col("lang"), col("source"),
      norm.as("norm"), size(toks).as("n_tokens"),
      length(norm).as("n_chars"),
      length(regexp_replace(norm, "[^a-z]", "")).as("alpha"),
      TextStats.stopwordCount(toks, TextStats.stopwords.flatMap(_._2))
        .as("allstop"))
    val nTok = col("n_tokens").cast("double")
    val quality = least(nTok / lit(50.0), lit(1.0)) * lit(0.4) +
      TextStats.safeRatio(col("allstop"), col("n_tokens")) * lit(0.3) +
      TextStats.safeRatio(col("alpha"), col("n_chars")) * lit(0.3)
    val qk = feat.filter(quality >= 0.52)
    val wDedup = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("norm")))
    val dd = qk.withColumn("keep_id", min("doc_id").over(wDedup))
      .filter(col("doc_id") === col("keep_id"))
    // 5-grams, not d08's 3-grams: decontamination conventionally uses
    // longer n-grams, and on this tiny-vocabulary corpus 3-gram
    // collisions flag ~85% of docs (an empty-corpus pipeline).
    val contaminated = CorpusOps.contamination(d, "doc_id", "text",
      col("source").isin("src0", "src1"), n = 5).select("doc_id")
    val clean = dd.filter(!col("source").isin("src0", "src1"))
      .join(contaminated, Seq("doc_id"), "left_anti")
    Sampling.mixtureSample(clean, "doc_id", "lang",
        Map("en" -> 0.4, "zh" -> 0.25, "de" -> 0.15,
          "es" -> 0.1, "fr" -> 0.1), targetN = 150L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").cast("long").as("n_tokens"))
      .orderBy("lang")
  }

  /** Deterministic synthetic HTML page around a document (t38/d36 —
    * the m05 pattern: synthesize → run the kernel → the oracle
    * replays the grammar). The page exercises every extractor
    * semantic: head metadata, raw-text script/style with markup
    * payloads, a comment, a quoted-'>' attribute, inline-vs-block
    * elements, literal entities, <br/>, ragged indentation. Payload
    * text is entity-encoded (&, <, > — the encode half of the decode
    * the kernel certifies), so ANY document round-trips verbatim.
    */
  private[queries] def synthHtml(id: Column, text: Column): Column = {
    def enc(c: Column): Column =
      replace(replace(replace(c, lit("&"), lit("&amp;")),
        lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
    val body = enc(coalesce(text, lit("")))
    val fw = enc(element_at(split(coalesce(text, lit("")), " "), 1))
    concat(
      lit("<!doctype html>\n<html>\n <head>\n  <title>Doc "), id,
      lit("</title>\n  <style type=\"text/css\">.nav > li { color: #fff } " +
        "/* <p>sneak</p> */</style>\n  <script type=\"text/javascript\">" +
        "if (1 < 2 && n > 0) { document.write(\"<p>sneak</p>\"); }" +
        "</script>\n </head>\n <body>\n  <!-- synthesized page <p>sneak</p> -->\n" +
        "  <nav>Home | <a href=\"/about?x=1&amp;y>2\" title='q>r'>About</a>" +
        " | Contact</nav>\n  <h1><b>"),
      fw, lit("</b>   heads this page</h1>\n  <p>"),
      body, lit("</p>\n  <p>Q &amp;   A &lt;section   "), id,
      lit("&gt; ends</p>\n  <p>lineA "), id,
      lit("<br/>lineB</p>\n  <footer>Copyright 2026 Example Corp</footer>\n" +
        " </body>\n</html>"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L1: exact dedup — md5 of normalized text, keep min id.
    "d01_dedup_exact" -> ((s, dir) => {
      Dedup.exactDedup(docs(s, dir), "doc_id", "text")
        .orderBy("keep_id")
        .select("content_hash", "keep_id", "n_copies")
    }),

    // L2: blocked exact-Jaccard near-dup pairs.
    "d02_dedup_jaccard" -> ((s, dir) => {
      Dedup.jaccardPairs(docs(s, dir), "doc_id", "text",
          Seq(col("lang"), expr("CAST(n_chars AS BIGINT) div 100")), threshold = 0.9)
        .orderBy("id_a", "id_b")
    }),

    // L2b: word-3-gram Jaccard near-dup — ORDER-SENSITIVE sequence
    // similarity (reordered bags of words no longer collide). Prefix
    // filtering makes the Spark side linear-shuffle; the oracle is the
    // brute-force all-pairs join the filter provably equals.
    "d06_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
          n = 3, Seq(col("lang")), threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),

    // L16: dup-pair graph → connected components → canonical doc id.
    // The clustering step after any pairwise detector: every doc in a
    // component gets the component's min id (the kept representative).
    // Oracle replays the min-label fixpoint as a recursive CTE.
    "d07_dup_clusters" -> ((s, dir) => {
      import graft.operators.ConnectedComponents
      val pairs = Dedup.jaccardPairs(docs(s, dir), "doc_id", "text",
        Seq(col("lang"), expr("CAST(n_chars AS BIGINT) div 100")), threshold = 0.9)
      val cc = ConnectedComponents.minLabel(pairs.select("id_a", "id_b"))
      val sizes = cc.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
      cc.join(sizes, "cluster")
        .select(col("id").as("doc_id"), col("cluster").as("cluster_id"),
          col("cluster_size"))
        .orderBy("cluster_id", "doc_id")
    }),

    // L94/d32: dup-cluster size histogram — the dedup-SAVINGS
    // dashboard (what fraction of the corpus is removable, and
    // whether duplication is a few mega-clusters or a long tail of
    // pairs — the number that sizes d03's cap and justifies the
    // whole dedup spend): d07's pairs→CC clusters reduced to a
    // (cluster_size → n_clusters, n_docs, docs_removed) profile,
    // singletons counted by an anti-join against the clustered id
    // set so the histogram covers the WHOLE corpus. Histogram
    // cardinality is bounded by max cluster size — a dashboard
    // relation, not data.
    "d32_cluster_histogram" -> ((s, dir) => {
      import graft.operators.ConnectedComponents
      val d = docs(s, dir)
      val pairs = Dedup.jaccardPairs(d, "doc_id", "text",
        Seq(col("lang"), expr("CAST(n_chars AS BIGINT) div 100")), threshold = 0.9)
      val cc = ConnectedComponents.minLabel(pairs.select("id_a", "id_b"))
      val multi = cc.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      val singles = d.filter(col("doc_id").isNotNull)
        .select(col("doc_id")).distinct()
        .join(cc.select(col("id").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_clusters"))
        .select(lit(1L).as("cluster_size"), col("n_clusters"))
      multi.unionByName(singles)
        .filter(col("n_clusters") > 0)
        .select(col("cluster_size"), col("n_clusters"),
          (col("cluster_size") * col("n_clusters")).as("n_docs"),
          ((col("cluster_size") - 1L) * col("n_clusters")).as("docs_removed"))
        .orderBy("cluster_size")
    }),

    // L99/d34: EFFECTIVE token mass per source — the "how much data
    // do we actually have" dashboard (raw token counts overstate a
    // crawl: duplicated content trains like one copy; Kaplan-style
    // budget math needs the DEDUPED mass): raw per-source doc/token
    // counts next to the post-exact-dedup mass, where each distinct
    // content (md5 of norm) counts ONCE globally and attributes to
    // its keeper's source (min (doc_id, source, nt) — d01's keeper
    // convention made a total order). Two map-side-combined
    // aggregates, no window — a hot content hash reduces
    // per-partition before it travels (the d28 discipline).
    "d34_effective_tokens" -> ((s, dir) => {
      val d = docs(s, dir).select(
        coalesce(col("source"), lit("?")).as("source"),
        md5(Dedup.normText(col("text"))).as("h"),
        coalesce(col("doc_id").cast("long"), lit(-1L)).as("did"),
        size(Dedup.tokens(col("text"))).cast("long").as("nt"))
      val raw = d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("raw_tokens"))
      val uniq = d.groupBy("h")
        .agg(min(struct(col("did"), col("source"), col("nt"))).as("k"))
        .select(col("k.source").as("source"), col("k.nt").as("nt"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_unique_docs"), sum("nt").as("effective_tokens"))
      raw.join(uniq, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("raw_tokens"),
          coalesce(col("n_unique_docs"), lit(0L)).as("n_unique_docs"),
          coalesce(col("effective_tokens"), lit(0L)).as("effective_tokens"))
        .orderBy("source")
    }),

    // L23: canonicalization end step — every doc maps to the
    // HIGHEST-QUALITY member of its dup cluster (tie: min doc_id),
    // composing pair mining → connected components → quality scoring.
    // Singletons (no dup edges) keep themselves.
    "d09_keep_best" -> ((s, dir) => {
      import graft.operators.ConnectedComponents
      val d = docs(s, dir)
      val pairs = Dedup.jaccardPairs(d, "doc_id", "text",
        Seq(col("lang"), expr("CAST(n_chars AS BIGINT) div 100")), threshold = 0.9)
      val cc = ConnectedComponents.minLabel(pairs.select("id_a", "id_b"))
      val norm = Dedup.normText(col("text"))
      val toks = Dedup.tokens(col("text"))
      val qual = d.select(col("doc_id"),
        TextStats.qualityColumns(norm, toks).toMap.apply("quality").as("quality"))
      val labeled = qual.join(cc, qual("doc_id") === cc("id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster_id"),
          col("quality"))
      // keep_id = argmax(quality, tie: min doc_id) per cluster, as ONE
      // window pass (first over the quality-ordered frame) — no
      // self-join, so the pair-mining lineage above runs exactly once.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster_id").orderBy(col("quality").desc, col("doc_id"))
      labeled
        .withColumn("keep_id", first(col("doc_id")).over(w))
        .select(col("doc_id"), col("cluster_id"), col("keep_id"))
        .orderBy("doc_id")
    }),

    // L3: MinHash+LSH near-dup (rows-only; recall/precision in spec).
    // shingleN=1: minhash the token set itself so the LSH estimates
    // the same token-set Jaccard the verification step filters on
    // (word n-grams would estimate sequence similarity instead —
    // right for prose, wrong for this bag-of-words corpus).
    // r=8 rows/band: this corpus has heavy background similarity
    // (tiny shared vocab), so short bands collide into giant buckets
    // that the hot-bucket cap would drop; 8-way agreement keeps
    // buckets selective while P(candidate | j≥0.9) ≈ 0.99.
    "d03_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
          threshold = 0.9, numHashes = 64, bands = 8, shingleN = 1, cap = 500)
        .orderBy("id_a", "id_b")
    }),

    // L4: SimHash Hamming-band near-dup (rows-only; spec).
    "d04_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxDist = 3)
        .orderBy("id_a", "id_b")
    }),

    // L8: language ID by stopword profile.
    "t01_langid" -> ((s, dir) => {
      val toks = Dedup.tokens(col("text"))
      val scores = TextStats.langScores(toks)
      docs(s, dir).select(
          (col("doc_id") +: scores.map { case (n, c) => c.as(n) }) :+
            TextStats.langPredict(scores).as("predicted"): _*)
        .orderBy("doc_id")
    }),

    // L9: quality scoring.
    "t02_quality" -> ((s, dir) => {
      val norm = Dedup.normText(col("text"))
      val toks = Dedup.tokens(col("text"))
      val cols = TextStats.qualityColumns(norm, toks)
      docs(s, dir).select(
          col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id")
    }),

    // L10: token counting (whitespace / wordish regex / BPE-ish).
    "t03_tokens" -> ((s, dir) => {
      val cols = TextStats.tokenCountColumns(col("text"))
      docs(s, dir).select(
          col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id")
    }),

    // L11: document fingerprint — md5 (oracle) …
    "t04_fingerprint" -> ((s, dir) => {
      docs(s, dir).select(
          col("doc_id"),
          md5(Dedup.normText(col("text"))).as("fp_md5"))
        .orderBy("doc_id")
    }),

    // Deterministic corpus split + stratified sampling (rows-only —
    // xxhash64 isn't DuckDB-expressible; invariants in spec).
    "t06_hash_split" -> ((s, dir) => {
      import graft.operators.Sampling
      docs(s, dir)
        .withColumn("bucket", Sampling.hashBucket(col("doc_id")))
        .withColumn("split", when(col("bucket") < 80, "train").otherwise("heldout"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "split")
    }),

    // L9b: TF-IDF top terms per language — term frequency over the
    // corpus, document frequency, ln((N+1)/(df+1)) idf. Ranked by
    // (tf desc, word) so the rank path is integer-deterministic; the
    // float score is a rounded output column only.
    "t07_tfidf" -> ((s, dir) => {
      val words = docs(s, dir).select(col("lang"), col("doc_id"),
        explode(Dedup.tokens(col("text"))).as("word"))
      val stats = words.groupBy("lang", "word")
        .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
      val nd = docs(s, dir).groupBy("lang").agg(countDistinct("doc_id").as("nd"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("tf").desc, col("word"))
      stats.join(nd, Seq("lang"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 20)
        .select(col("lang"), col("rnk"), col("word"), col("tf"), col("df"),
          round(col("tf") * log((col("nd") + 1.0) / (col("df") + 1.0)), 4).as("tfidf"))
        .orderBy("lang", "rnk")
    }),

    // L13b: stratified sampling — per-language keep fractions over the
    // portable hash bucket, so the sample is reproducible anywhere.
    "t08_stratified" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.stratifiedSample(docs(s, dir), "doc_id", "lang",
          Map("en" -> 0.5, "fr" -> 0.25, "de" -> 0.1))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // L24: Sequential Poisson weighted sampling — length-weighted
    // top-m corpus subsample. Priorities are engine-portable (power-
    // of-two + one correctly-rounded division over the fmix64 hash),
    // so the oracle reproduces every priority bit-for-bit; the plan is
    // TakeOrderedAndProject (per-partition heap, no global sort).
    "d10_weighted_sample" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.weightedSample(
        docs(s, dir).select("doc_id", "n_chars"), "doc_id", "n_chars", m = 200)
    }),

    // L25: bigram collocation "lift" — n_xy·N / (n_x·n_y), the
    // log-free PMI variant (Math.log differs in the last ulp across
    // engines; a fixed-shape mul/div chain is bit-identical). The
    // unigram vocab is broadcast to both probe sides; the bigram table
    // is persisted because the total-count branch reuses it (cache
    // freed by the drivers' per-query clearCache, not here — the
    // result is lazy and must outlive this builder).
    "t13_bigram_lift" -> ((s, dir) => {
      val toks = docs(s, dir).select(Dedup.tokens(col("text")).as("toks"))
      // guard: a doc with <2 tokens has no bigrams, and slice() with a
      // negative length (size-1 when size=0) is a runtime error — the
      // oracle's list ops tolerate empties, so crash-vs-result is the
      // only way the engines could diverge here
      val bi = toks.filter(size(col("toks")) >= 2)
        .select(explode(Dedup.bigramZip(col("toks"))).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("n_xy"))
        .persist()
      val uni = toks.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n_w"))
      val tot = bi.agg(sum("n_xy").cast("double").as("n_tot"))
      bi
        // no broadcast HINT on the unigram table: vocabulary is
        // corpus-bounded, not fixed-size — at 100 TB it can be 100M+
        // words and a forced broadcast would ship it to every
        // executor twice. Unhinted, AQE broadcasts it while it is
        // small and falls back to a shuffle join when it is not.
        .join(uni.select(col("w").as("w1"), col("n_w").as("n_x")), "w1")
        .join(uni.select(col("w").as("w2"), col("n_w").as("n_y")), "w2")
        .crossJoin(broadcast(tot))
        .withColumn("lift", round((col("n_xy").cast("double") * col("n_tot")) /
          (col("n_x").cast("double") * col("n_y").cast("double")), 4))
        .select("w1", "w2", "n_xy", "n_x", "n_y", "lift")
        .orderBy(desc("n_xy"), col("w1"), col("w2"))
        .limit(50)
    }),

    // … and the custom rolling-hash / simhash expressions, verified
    // bit-for-bit by the PortableHashSql oracle.
    "t05_rollhash" -> ((s, dir) => {
      docs(s, dir).select(
          col("doc_id"),
          GraftFunctions.rolling_hash(Dedup.normText(col("text"))).as("fp_roll"),
          GraftFunctions.simhash64(Dedup.tokens(col("text"))).as("fp_sim"))
        .orderBy("doc_id")
    }),

    // L17: benchmark decontamination — corpus docs sharing any word
    // 3-gram with the "eval set" (sources src0/src1 stand in for the
    // benchmark suite). Eval grams broadcast; corpus never shuffles.
    "d08_contamination" -> ((s, dir) => {
      import graft.operators.CorpusOps
      CorpusOps.contamination(docs(s, dir), "doc_id", "text",
          col("source").isin("src0", "src1"), n = 3)
        .orderBy("doc_id")
    }),

    // L30: blocked edit-distance fuzzy join — record-linkage pairing
    // with exact Levenshtein verification on normalized 80-char
    // prefixes; both engines implement textbook Levenshtein, so the
    // distances oracle exactly.
    "d13_edit_pairs" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.editDistancePairs(d, "doc_id", "text",
          Seq(col("lang"), expr("CAST(n_chars AS BIGINT) div 100")), col("n_chars"))
        .orderBy("id_a", "id_b")
    }),

    // L27: exact shared-4-gram pairs — verbatim-overlap dedup signal
    // (absolute shared-gram count, not Jaccard). Gram buckets on this
    // corpus max out at 4 docs, so the gram-keyed self-join is linear.
    "d11_shared_grams" -> ((s, dir) => {
      import graft.operators.CorpusOps
      CorpusOps.sharedGramPairs(docs(s, dir), "doc_id", "text", n = 4)
        .orderBy("id_a", "id_b")
    }),

    // L28: unigram token entropy — the cheap complexity filter
    // (ln-derived, rounded to 4 like t07's idf; summation-order dust
    // is ~1e-13, far below the rounding grain).
    "t14_entropy" -> ((s, dir) => {
      import graft.operators.TextStats
      TextStats.tokenEntropy(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // L31: corpus heavy hitters in ONE sketch aggregate (Misra-Gries
    // family, FreqItemsAgg): top-20 tokens with counts, no full-vocab
    // shuffle — partials are O(maxMapSize) and tree-merge. maxMapSize
    // 2^15 exceeds this corpus's vocabulary, so every count is exact
    // (no counter eviction) and the plain GROUP BY oracle matches
    // bit-for-bit; at real scale the same plan degrades gracefully to
    // ±n/maxMapSize error bounds instead of blowing up the shuffle.
    "t15_heavy_hitters" -> ((s, dir) => {
      import graft.functions.GraftFunctions
      docs(s, dir)
        .select(explode(Dedup.tokens(col("text"))).as("tok"))
        .agg(GraftFunctions.freq_items(col("tok"), 1 << 15, 20).as("top"))
        .select(posexplode(col("top")))
        .select((col("pos") + 1).cast("long").as("rnk"),
          col("col.item").as("token"), col("col.est").as("n"))
        .orderBy("rnk")
    }),

    // L32: MOSS winnowing fingerprints — per-doc sorted distinct
    // window-minima of positional portable 3-gram hashes (window 4):
    // any shared run of >= 6 tokens across docs is guaranteed a
    // common fingerprint. One fused codegen pass per doc
    // (WinnowFingerprints: gram hash + monotonic-deque minima); the
    // oracle replays the identical fmix64∘rollingHash kernel in SQL.
    "t16_winnow" -> ((s, dir) => {
      import graft.functions.GraftFunctions
      docs(s, dir)
        .select(col("doc_id"),
          explode(GraftFunctions.winnow_fingerprints(
            Dedup.tokens(col("text")), 3, 4)).as("fp"))
        .orderBy("doc_id", "fp")
    }),

    // L33: corpus-trained bigram-LM cross-entropy — the perplexity-
    // style fluency score. Per-term 6-dp rounding + DECIMAL sums make
    // the per-doc fold order-independent, so the oracle reproduces it
    // exactly (see TextStats.lmCrossEntropy).
    "t17_lm_score" -> ((s, dir) => {
      TextStats.lmCrossEntropy(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // L92: HELD-OUT bigram cross-entropy — the CCNet direction: the
    // LM trains on the reference split (doc_id ≢ 0 mod 5) and scores
    // ONLY the crawl split; Laplace add-one keeps unseen bigrams/
    // contexts integer-exact. Model tables broadcast; the crawl
    // stream is the only corpus-sized side.
    "t34_heldout_ppl" -> ((s, dir) => {
      TextStats.lmHeldoutXent(docs(s, dir), "doc_id", "text",
          pmod(col("doc_id").cast("long"), lit(5)) =!= 0)
        .orderBy("doc_id")
    }),

    // L108/d38: CCNet head/middle/tail perplexity buckets (Wenzek
    // 2020 §4.3 — the production quality triage that decides which
    // crawl slice trains, which is held for review, which is cut):
    // t34's held-out LM scores (shared lmHeldoutXent body — the
    // scorer and its consumer cannot drift), lang joined back, then
    // per-language TERTILES over the deterministic total order
    // (xent ASC, doc_id) — ntile(3), identical rank semantics both
    // engines — rolled up per (lang, bucket). min/max xent are
    // order-free; the summed quality measure is the exact micro-nat
    // INTEGER (xent·10⁴ rounds back to the integer the scorer
    // divided out — no float-sum drift at any partitioning). Scale:
    // scoring is t34's map-plus-fold; the window runs on the scored
    // heldout slice partitioned by language — doc-cardinality rows,
    // bounded width; the rollup is bucket-cardinality.
    "d38_ccnet_buckets" -> ((s, dir) => {
      val d0 = docs(s, dir)
      val scored = TextStats.lmHeldoutXent(d0, "doc_id", "text",
          pmod(col("doc_id").cast("long"), lit(5)) =!= 0)
        .join(d0.select(col("doc_id").cast("long").as("doc_id"),
            coalesce(col("lang"), lit("?")).as("lang")).distinct(),
          Seq("doc_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("xent"), col("doc_id"))
      scored.withColumn("t", ntile(3).over(w))
        .withColumn("bucket", when(col("t") === 1, "head")
          .when(col("t") === 2, "middle").otherwise("tail"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_bigrams").cast("long").as("n_bigrams"),
          min("xent").as("min_xent"), max("xent").as("max_xent"),
          sum(expr("CAST(round(xent * 10000) AS BIGINT)")).cast("long")
            .as("sum_uxent"))
        .orderBy("lang", "bucket")
    }),

    // L119/t42: Zipf rank-frequency exponent per language — the
    // corpus-health statistic (natural language sits near s ≈ 1;
    // template/boilerplate-heavy or synthetic corpora bend the
    // curve): least-squares slope of ln(freq) on ln(rank) over each
    // language's top-100 unigrams, reported as the POSITIVE exponent
    // s = −slope (nonnegative by Chebyshev's sum inequality: y is
    // non-increasing in rank by construction). Exactness: ln values
    // quantize to the 10⁻⁶ grid immediately (floor(ln·10⁶ + ½) on
    // integer arguments — engine-identical), so every regression sum
    // is a BIGINT and the final division is f21's half-up
    // DECIMAL(38,0)/HUGEINT pattern; ranks are the deterministic
    // (count DESC, token) order. Shape: one (lang, token) count
    // aggregate, a lang-partitioned top-100 window, then a
    // 100-rows-per-lang fold — the window input is vocabulary-sized,
    // never corpus-sized.
    "t42_zipf_slope" -> ((s, dir) => {
      val tk = docs(s, dir).select(coalesce(col("lang"), lit("?")).as("lang"),
          explode(Dedup.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("cnt").desc, col("tok"))
      tk.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 100)
        .select(col("lang"),
          floor(log(col("rk").cast("double")) * lit(1000000.0) + lit(0.5))
            .cast("long").as("xi"),
          floor(log(col("cnt").cast("double")) * lit(1000000.0) + lit(0.5))
            .cast("long").as("yi"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_ranks"),
          sum("xi").as("sx"), sum("yi").as("sy"),
          sum(col("xi") * col("yi")).as("sxy"),
          sum(col("xi") * col("xi")).as("sxx"))
        .select(col("lang"), col("n_ranks"),
          expr("""CASE WHEN n_ranks * sxx - sx * sx > 0 THEN
            CAST((2000000 * CAST(sx * sy - n_ranks * sxy AS DECIMAL(38,0))
                  + CAST(n_ranks * sxx - sx * sx AS DECIMAL(38,0)))
              div (2 * CAST(n_ranks * sxx - sx * sx AS DECIMAL(38,0)))
              AS BIGINT) END""").as("zipf_micro"))
        .orderBy("lang")
    }),

    // L117/d40: INCREMENTAL DSIR — d39's selector in the d27/s15
    // recrawl shape (the 100 TB production form: the reference/raw
    // distributions train ONCE over the standing corpus and persist
    // as a model store; every new crawl batch scores against the
    // frozen model with ZERO corpus rescans — the batch explode +
    // one broadcast grid join is the whole plan). Train split =
    // doc_id ≢ 2 mod 3 (target = ≡ 0 mod 7 within it); the "new
    // crawl" batch is the held-out third. Unseen buckets LEFT-join
    // to a 0 term but still count toward the per-token constant —
    // the Laplace semantics the incremental setting forces. kept =
    // uw > 0 (more reference-like than raw) — the threshold-free
    // sign selection. Oracle retrains the grid from the train split
    // and rescores the batch by the same algebra.
    "d40_dsir_incremental" -> ((s, dir) => {
      val d0 = docs(s, dir)
      val third = pmod(col("doc_id").cast("long"), lit(3L))
      val storePath = graft.sources.TidyIO.scratchDir("g_dsir")
      val prefix = storePath.stripPrefix("/tmp/")
      TextStats.writeDsirModel(d0.filter(third =!= 2L), "doc_id", "text",
        pmod(col("doc_id"), lit(7L)) === 0L, 4096, prefix,
        path = Some(storePath))
      TextStats.dsirScoreStored(d0.filter(third === 2L), "doc_id", "text",
          prefix)
        .orderBy("doc_id")
    }),

    // L115/t41: quality-scorer ROC-AUC — the calibration dashboard
    // over the pipeline's own filters: does the cheap composite
    // quality score (t02/d24's gate input) actually predict the
    // expensive Gopher rule battery's keep decision (t27's gate)?
    // Exact Mann–Whitney AUC per source with midrank ties, all in
    // integer space (doubled average ranks; half-up micro units) —
    // a float-free statistic both engines reproduce bit-for-bit.
    // Score and label are computed on the SAME row in one narrow
    // projection (no join — duplicate doc_ids cannot fan out), then
    // two source-partitioned windows + one per-source fold.
    "t41_quality_auc" -> ((s, dir) => {
      val norm = Dedup.normText(col("text"))
      val toks = Dedup.tokens(col("text"))
      val q = TextStats.qualityColumns(norm, toks).toMap.apply("quality")
      val keep = TextStats.gopherColumns(col("text")).toMap.apply("keep")
      val scored = docs(s, dir).select(col("source"),
        q.as("score"), keep.cast("long").as("label"))
      TextStats.scoreAuc(scored, "source", "score", "label")
        .orderBy("source")
    }),

    // L114/d39: DSIR importance resampling (Xie et al. 2023 — the
    // production domain-matching selector: "pick crawl documents
    // that look like the reference corpus"): hashed-unigram bag
    // likelihood ratio between the TARGET distribution (the
    // reference split, doc_id ≡ 0 mod 7) and the RAW distribution
    // (everything else), Laplace add-one, 6-dp DECIMAL terms (the
    // t17 ln discipline) summed to an exact integer micro-nat
    // weight, then the per-source top-1/4 by (uw DESC, doc_id) —
    // the paper's balanced per-domain variant through d24's gate
    // shape. The model is two ≤4096-row broadcast aggregates;
    // scoring is explode + broadcast join + per-doc fold; a wrong
    // hash, count, smoothing constant, or rank boundary is a value
    // diff on uw/rk.
    "d39_dsir_select" -> ((s, dir) => {
      TextStats.dsirWeights(docs(s, dir), "doc_id", "text", "source",
          pmod(col("doc_id"), lit(7L)) === 0L, numBuckets = 4096,
          fracNum = 1, fracDen = 4)
        .orderBy("source", "rk")
    }),

    // L95/t35: boilerplate-line mining — the DISCOVERY dashboard that
    // justifies d28's line dedup (which lines are the nav/footer
    // templates, per source): normalized lines hashed with the
    // portable fmix∘roll kernel, (source, line) counts map-side
    // combined, then the per-source top-3 via the BOUNDED top-k heap
    // aggregate (TopKPairsAgg on (−cnt, hash) — O(k) state, Window-
    // free: a hot source never sorts its distinct-line table), hashes
    // joined back to representative text (min per hash). The tie rule
    // (cnt DESC, hash ASC) is the heap's own order, mirrored in the
    // oracle's ranked window.
    "t35_boilerplate" -> ((s, dir) => {
      val ln = docs(s, dir)
        .select(coalesce(col("source"), lit("?")).as("source"),
          explode(split(col("text"), "\n")).as("l"))
        .select(col("source"), Dedup.normText(col("l")).as("nline"))
        .filter(col("nline") =!= "")
      val c = ln
        .withColumn("lh",
          GraftFunctions.fmix64(GraftFunctions.rolling_hash(col("nline"))))
        .groupBy("source", "lh")
        .agg(min("nline").as("line"), count(lit(1)).as("cnt"))
      val top = c.groupBy("source")
        .agg(GraftFunctions.top_k_pairs(-col("cnt"), col("lh"), 3).as("tk"))
        .select(col("source"), posexplode(col("tk")).as(Seq("p", "e")))
        .select(col("source"), (col("p") + 1).cast("long").as("rank"),
          (-col("e.ord")).as("cnt"), col("e.id").as("lh"))
      top.join(c.select("source", "lh", "line"), Seq("source", "lh"))
        .select(col("source"), col("rank"), col("line"), col("cnt"))
        .orderBy("source", "rank")
    }),

    // L35: per-doc duplicated-4-gram fraction — the exact-substring-
    // dedup diagnostic: how much of each doc is verbatim-shared with
    // the rest of the corpus (d11 finds the pairs; this ranks docs).
    "t18_dupfrac" -> ((s, dir) => {
      import graft.operators.CorpusOps
      CorpusOps.dupGramFraction(docs(s, dir), "doc_id", "text", n = 4)
        .orderBy("doc_id")
    }),

    // L34: PII redaction over the events props payload — sequential
    // email → IPv4 → digit-run masking with per-class counts (this
    // corpus's props carry numeric ids; the email/IP classes are
    // exercised on crafted rows in CurationOpsSpec). Narrow regex
    // projection, zero shuffle.
    "t19_redact" -> ((s, dir) => {
      val cols = TextStats.redactColumns(col("props"))
      Graft.table(s, dir, "events")
        .select(col("event_id") +: cols.map { case (n, c) => c.as(n) }: _*)
        .orderBy("event_id")
    }),

    // L110/t39: PSEUDONYMIZATION — the governance tier between t19's
    // destructive redaction and keeping raw PII: every email becomes
    // a STABLE keyed surrogate (portable fmix∘roll of the address,
    // mod 10^6), so identity joins/sessionization/dedup still work
    // over the anonymized corpus while the identifier itself is
    // gone. Emails are synthesized deterministically per document
    // (the t32 URL pattern — the kernel under test is the
    // extract-and-fold, the oracle replays the grammar AND the hash
    // arithmetic), and any email already in the raw text (fuzz
    // corpora carry some) is pseudonymized by the same pass. The
    // full rewritten text is a compared column — a regex drift, a
    // fold-order bug or a hash mismatch is a value diff. Narrow
    // per-row projection, zero shuffle.
    "t39_pseudonymize" -> ((s, dir) => {
      val tx = concat(coalesce(col("text"), lit("")), lit(" contact "),
        regexp_replace(coalesce(col("source"), lit("s")), "[^a-z0-9]", ""),
        lit("_"), col("doc_id").cast("long"),
        lit("@mail-"),
        regexp_replace(coalesce(col("lang"), lit("x")), "[^a-z0-9]", ""),
        lit(".example"))
      docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), tx.as("tx"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("tx"), lit(TextStats.emailPat), lit(0)))
            .cast("long").as("n_emails"),
          TextStats.pseudonymizeEmails(col("tx")).as("ptext"))
        .orderBy("doc_id")
    }),

    // L120/t43: MOJIBAKE detection + repair — ftfy's
    // highest-frequency fix class (UTF-8 bytes mis-decoded as cp1252:
    // "é" renders "Ã©", "’" renders "â€™" — the double-encoding
    // corruption every web crawl carries): each doc's text gets a
    // deterministic accented suffix, is CORRUPTED through the forward
    // map (the textual simulation of the double-encode), then
    // detected and repaired through the inverse chain — the full
    // repaired text is a compared column, so the repair must
    // round-trip byte-exactly back to the pre-corruption text (any
    // naturally-occurring digraphs in the raw corpus repair
    // identically on both sides). The chains are exact `replace`
    // folds over ONE shared pair table (Spark and the oracle render
    // from the same Scala source — the t39 can't-drift convention),
    // not regexes. Narrow per-row projection, zero shuffle — folds
    // into the ingest scan at 100 TB.
    "t43_mojibake" -> ((s, dir) => {
      val good = concat(coalesce(col("text"), lit("")),
        lit(" café “naïve” entrée’s piñata"))
      docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          TextStats.mojibakeCorrupt(good).as("moji"))
        .select(col("doc_id"),
          TextStats.mojibakeCount(col("moji")).as("n_bad"),
          TextStats.mojibakeRepair(col("moji")).as("repaired"))
        .orderBy("doc_id")
    }),

    // L121/t44: FIM (fill-in-middle) transform — Bavarian et al.
    // 2022's code-corpus augmentation: move the middle third to the
    // end under sentinel tokens (<fim_prefix>P<fim_suffix>S
    // <fim_middle>M) so the model learns to infill. Deterministic
    // ⌊n/3⌋/⌊2n/3⌋ codepoint split points; content-preserving by
    // construction (every codepoint lands exactly once), so the
    // reassembled text and the three span lengths are oracle-exact
    // via the same substr arithmetic in DuckDB. Narrow per-row
    // substring projection, zero shuffle.
    "t44_fim" -> ((s, dir) => {
      val cols = TextStats.fimColumns(col("tx"))
      docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          coalesce(col("text"), lit("")).as("tx"))
        .select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id")
    }),

    // L122/t45: SFT CHAT-TEMPLATE rendering + LOSS-MASK offsets — the
    // formatting step every supervised-fine-tuning corpus goes
    // through: a conversation's turns flatten into ONE training
    // string under a template (`<|role|>content<|end|>`, the
    // ChatML/Llama shape) and the trainer needs the character span of
    // each ASSISTANT turn's content because loss is computed only
    // there. Events stand in as turns (user_id = conversation, ts +
    // event_id = the null-safe turn order, roles alternate); offsets
    // are a running sum of rendered-piece lengths over the same
    // window. Oracle replays the template, the alternation, and the
    // cumsum offset arithmetic — an off-by-one in a mask boundary is
    // a value diff on every assistant turn. One window per
    // conversation key: linear, no collect, 100 TB-partitionable.
    "t45_chat_masks" -> ((s, dir) => {
      import graft.operators.CorpusOps
      CorpusOps.chatRender(Graft.table(s, dir, "events"),
          "user_id", "ts", "event_id", "event_type", "value", maxTurns = 6)
        .orderBy("user_id", "turn")
    }),

    // L100/t37: per-stream PII-density profile — the compliance
    // dashboard over t19's redaction counts ("which event streams
    // leak identifiers, and how much"): the sequential email→IP→
    // digit-run counting per event, rolled up per event_type with an
    // any-PII event count. Purely narrow scan + one keyed aggregate;
    // null props count as clean (both engines' CASE-over-NULL → 0).
    "t37_pii_profile" -> ((s, dir) => {
      val cols = TextStats.redactColumns(col("props"))
        .filter(_._1 != "redacted")
      Graft.table(s, dir, "events")
        .select(coalesce(col("event_type"), lit("?")).as("event_type") +:
          cols.map { case (n, c) => c.as(n) }: _*)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum("n_emails").as("n_emails"), sum("n_ips").as("n_ips"),
          sum("n_nums").as("n_nums"),
          sum(when(col("n_emails") + col("n_ips") + col("n_nums") > 0, 1L)
            .otherwise(0L)).as("n_dirty"))
        .orderBy("event_type")
    }),

    // L36: mixture resampling to target LANGUAGE weights — keep rates
    // computed from observed stratum counts (min(1, targetN·w/n)),
    // applied via the portable id-hash filter, so the exact kept-row
    // set replays on any engine.
    "d14_mixture" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.mixtureSample(docs(s, dir), "doc_id", "lang",
          Map("en" -> 0.4, "zh" -> 0.25, "de" -> 0.15,
            "es" -> 0.1, "fr" -> 0.1), targetN = 250L)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // L123/d41: TEMPERATURE-scaled source mixing — the mT5/UniMax
    // α-sampling rule (keep stratum i ∝ n_i^α, α = 1/T = 0.5):
    // proportional sampling lets one giant crawl dominate and uniform
    // sampling over-trains tiny sources; √n is the standard middle.
    // α is fixed at 0.5 because sqrt is the one power IEEE guarantees
    // correctly rounded, so the keep-rate doubles replay bit-exactly
    // in DuckDB when the op order (and the normalizer's left-fold
    // summation order, sorted by stratum) matches — which the oracle
    // does. The kept set itself rides the d14 portable id-hash
    // filter: deterministic across engines, reruns, repartitions.
    "d41_temperature_mix" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.temperatureSample(docs(s, dir), "doc_id", "source",
          targetN = 300L)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    }),

    // L124/d42: EPOCH-RECIPE upsampling — the data-recipe
    // materializer behind every LLM mixture table (LLaMA/Gopher-style
    // "epochs" column): one corpus worth of units redistributed
    // EQUALLY across sources converts to per-source epoch counts
    // (whole copies replicated, fractional remainder hash-sampled,
    // capped at 4 epochs), so small sources upsample and the giant
    // one downsamples. Exact integer micro-epoch arithmetic + the
    // portable hash filter make the MATERIALIZED corpus — row counts
    // AND unit sums per source — replay bit-for-bit in the oracle; a
    // wrong cap, a drifting fractional boundary, or a lost copy is a
    // value diff.
    "d42_epoch_recipe" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.epochUpsample(docs(s, dir), "doc_id", "source", "n_chars")
        .groupBy(coalesce(col("source"), lit("?")).as("source"))
        .agg(max("epochs6").as("epochs6"),
          count(lit(1)).as("n_materialized"),
          sum(coalesce(col("n_chars").cast("long"), lit(0L)))
            .as("sum_chars"))
        .orderBy("source")
    }),

    // L126 — DETERMINISTIC DATALOADER ORDER (the reproducibility
    // primitive under every training run: "epoch e, shard s, position
    // p" must resolve to the same document on every rerun, any
    // engine, any cluster size — a cluster-local shuffle or RNG makes
    // runs unrepeatable and elasticity-hostile). Per epoch, each doc
    // takes a PORTABLE order key fmix64(fmix64(epoch+1) ⊕ doc_id),
    // shards by pmod(key, shards) where the shard count SCALES with
    // the corpus — ceil(corpus / targetShardRows), the
    // Sampling.epochShardCount rule, so per-shard sort volume stays
    // ≈ the target at ANY corpus size (a fixed count would sort
    // corpus/k rows in one task at 100 TB; the oracle replays the
    // same integer arithmetic) — and ranks within its shard by
    // (key, doc_id). The output is the per-(epoch, shard)
    // composition with an ORDER-SENSITIVE checksum —
    // sum(rank·(key mod 10⁶)) — so any drift in the permutation (not
    // just membership) is a value diff. Two epochs certify that the
    // seed changes the order. Shape: one footer-cheap count, one
    // narrow codegen scan + a window PARTITIONED by (epoch, shard) —
    // each partition ≈ targetShardRows, rank is a linear in-partition
    // pass; nothing global.
    "d43_epoch_order" -> ((s, dir) => {
      import graft.operators.Sampling
      val base = docs(s, dir).filter(col("doc_id").isNotNull)
      val shards = Sampling.epochShardCount(base.count(), d43TargetShardRows)
      Sampling.epochOrder(base, "doc_id", Seq(0L, 1L), shards)
        .groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("rank") * pmod(col("hkey"), lit(1000000L)))
            .as("order_checksum"))
        .orderBy("epoch", "shard")
    }),

    // L127 — PREFERENCE-PAIR construction (RLHF/DPO data prep: per
    // prompt group, pair the best-scored candidate with the worst as
    // (chosen, rejected) — the reduction every preference-tuning
    // pipeline runs over scored generations). Groups are
    // (source, lang); the score is the deterministic length signal
    // (n_chars) with doc_id as the total tiebreak, so the argmax /
    // argmin are engine-exact; singleton groups drop (no pair), and
    // chosen == rejected never emits. ONE aggregation via
    // max_by/min_by over the (score, id) struct — map-side combined,
    // no window, no self-join; at corpus scale this is a single
    // linear shuffle on the group key.
    "t46_pref_pairs" -> ((s, dir) => {
      val d = docs(s, dir).filter(col("doc_id").isNotNull)
        .select(coalesce(col("source"), lit("?")).as("src"),
          coalesce(col("lang"), lit("?")).as("lng"),
          col("doc_id"),
          coalesce(col("n_chars").cast("long"), lit(0L)).as("score"))
      d.groupBy("src", "lng")
        .agg(count(lit(1)).as("n_cands"),
          max(struct(col("score"), col("doc_id"))).as("best"),
          min(struct(col("score"), col("doc_id"))).as("worst"))
        .filter(col("n_cands") >= 2L)
        .select(col("src"), col("lng"),
          col("best.doc_id").as("chosen_id"),
          col("worst.doc_id").as("rejected_id"),
          (col("best.score") - col("worst.score")).as("margin"),
          col("n_cands"))
        .orderBy("src", "lng")
    }),

    // L128 — CONTEXT-LENGTH FIT audit (the report behind every
    // max_len decision: at a candidate context length, how much of
    // each source fits whole, how many documents truncate, and what
    // fraction of the token mass the cut loses — the number that
    // says whether 2k/4k/8k is worth the quadratic attention cost
    // for THIS corpus). Tokens are t03's whitespace rule; per source
    // × candidate length: docs, over-length docs, token mass, kept
    // mass sum(min(tokens, L)), and the integer loss in basis points
    // ((total−kept)·10⁴ div total — exact BIGINT arithmetic, engine-
    // replayable). ONE narrow scan exploded over the 3-length
    // candidate grid (a 3× row multiplier on doc COUNTS, not text),
    // then a keyed aggregate — linear at any corpus size.
    "t47_context_fit" -> ((s, dir) => {
      val lens = Seq(64L, 256L, 1024L)
      val d = docs(s, dir).filter(col("doc_id").isNotNull)
        .select(coalesce(col("source"), lit("?")).as("src"),
          size(Dedup.tokens(col("text"))).cast("long").as("toks"))
      d.select(col("src"), col("toks"),
          explode(array(lens.map(lit): _*)).as("max_len"))
        .groupBy("src", "max_len")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("toks") > col("max_len"), 1L).otherwise(0L))
            .as("n_truncated"),
          sum(col("toks")).as("tokens_total"),
          sum(least(col("toks"), col("max_len"))).as("tokens_kept"))
        .withColumn("loss_bp",
          when(col("tokens_total") > 0L,
            expr("((tokens_total - tokens_kept) * 10000) div tokens_total"))
            .otherwise(lit(0L)))
        .orderBy("src", "max_len")
    }),

    // L37: PER-GROUP heavy hitters — one frequent-items sketch per
    // language in a single keyed aggregation (mergeable O(maxMapSize)
    // state per group, map-side partials; the per-group analogue of
    // t15's corpus-wide sketch). Exact regime here (capacity >
    // per-lang vocabulary) so the plain grouped-count oracle matches;
    // at real scale the same plan degrades to ±n/maxMapSize bounds
    // instead of a full (lang, token) shuffle.
    "t20_group_hh" -> ((s, dir) => {
      docs(s, dir)
        .select(col("lang"), explode(Dedup.tokens(col("text"))).as("tok"))
        .groupBy("lang")
        .agg(GraftFunctions.freq_items(col("tok"), 1 << 15, 5).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.item").as("token"), col("col.est").as("n"))
        .orderBy("lang", "rnk")
    }),

    // L38: BPE tokenizer training — 8 merge rounds learned from the
    // corpus word-frequency table (pair-count shuffle + 1-row argmax
    // + narrow fuse per round; see operators/Bpe.scala). The oracle
    // replays all 8 rounds as chained CTEs with the same
    // delimiter-unambiguous replace semantics.
    "t21_bpe" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Bpe
      Bpe.train(docs(s, dir), "text", merges = 8)
        .toDF("round", "lft", "rgt", "pair_count")
        .select(col("round").cast("long").as("round"), col("lft"),
          col("rgt"), col("pair_count"))
        .orderBy("round")
    }),

    // L39: subword encoding with the learned merges — the same
    // replace chain training used, applied per document token (narrow,
    // zero shuffle beyond the per-doc count); cross-validates the
    // apply path against the oracle's trained vocabulary.
    "t22_bpe_encode" -> ((s, dir) => {
      import graft.operators.Bpe
      val merges = Bpe.train(docs(s, dir), "text", merges = 8)
        .map(m => (m._2, m._3))
      Bpe.encode(docs(s, dir), "doc_id", "text", merges)
        .orderBy("doc_id")
    }),

    // L40: the END-TO-END curation pipeline in one composed plan —
    // quality filter → exact dedup → decontamination → mixture
    // resample → corpus manifest. Every stage is one of the library's
    // operators; the oracle replays the whole chain. The quality
    // score stays UNROUNDED for the filter (identical double ops on
    // both engines → identical keep decisions; rounding is only ever
    // for output columns).
    "d15_corpus_manifest" -> ((s, dir) => manifestChain(docs(s, dir))),

    // L88/d31: blocklist-gated curation — the policy/safety pass
    // FIRST (t33's AC gate as the narrow `exists` filter: any hit on
    // the phrase dictionary drops the doc at ingest, before any
    // scoring work is spent on it), then the IDENTICAL d15 chain over
    // the surviving corpus via manifestChain — the d30 composition
    // pattern with the gate as the front stage. The oracle prepends a
    // strpos-filtered `cd` CTE (absence of every term ⇔ the AC gate's
    // all-zero counts) to the shared manifestChainSql, so the full
    // composition replays.
    "d31_blocklist_curated" -> ((s, dir) => {
      val terms = Seq("batch batch", "big table", "fast join", "slow query")
      manifestChain(docs(s, dir).filter(!exists(
        GraftFunctions.blocklist_counts(coalesce(col("text"), lit("")), terms),
        c => c > lit(0L))))
    }),

    // L40b/d30: the d15 curation chain in RefinedWeb ORDER — line
    // dedup FIRST (boilerplate lines distort quality ratios and
    // content hashes; removing them BEFORE doc-level quality/dedup is
    // the CCNet/RefinedWeb sequencing), then the identical
    // quality → exact-dedup → decontamination → mixture → manifest
    // chain over the CLEANED text. Line dedup runs over the whole
    // table (the d28 pass), so the eval sources' boilerplate is
    // removed before their 5-grams are mined too. The oracle replays
    // the full composition: d28's line chain feeding d15's chain.
    "d30_line_curated" -> ((s, dir) => {
      val d0 = docs(s, dir)
      manifestChain(d0
        .select(col("doc_id").cast("long").as("doc_id"),
          col("lang"), col("source"))
        .join(Dedup.lineDedupText(d0, "doc_id", "text"), Seq("doc_id"))
        .withColumnRenamed("clean_text", "text"))
    }),

    // L102/t38: HTML → visible-text extraction (the WET step — the
    // stage every crawl-curation lineage runs FIRST: CommonCrawl WET,
    // CCNet §3.1, RefinedWeb §3.2 all start from tag-stripped text).
    // The m05 certification pattern: each document is wrapped in a
    // deterministic HTML page (title/nav/h1/paragraphs/footer, a
    // script and style with markup-looking payloads, a quoted-'>'
    // attribute, literal entities, ragged indentation) and the kernel
    // under test is html_text — the one-pass codegen extractor. The
    // oracle never parses HTML: it replays the GRAMMAR, rebuilding
    // the expected visible lines from the raw text with DuckDB string
    // functions, so a tag-scanner bug, a raw-text-element leak, an
    // entity-decode bug or a whitespace-collapse drift is a hash
    // mismatch. Extraction is a pure projection — at 100 TB the WET
    // step is a map job with zero shuffle; the only pass over the
    // payload bytes is this kernel.
    "t38_html_extract" -> ((s, dir) => {
      val d = docs(s, dir)
      d.select(col("doc_id").cast("long").as("doc_id"),
          GraftFunctions.html_text(
            synthHtml(col("doc_id").cast("long"), col("text"))).as("visible"))
        .withColumn("n_lines", size(split(col("visible"), "\n")).cast("long"))
        .withColumn("n_bytes", octet_length(col("visible")).cast("long"))
        .orderBy("doc_id")
    }),

    // L103/d36: the full crawl-ingest composition — synthesize HTML
    // (the corpus as a crawler sees it), extract visible text with
    // t38's kernel, then run the EXISTING d30 RefinedWeb sequencing
    // (line dedup first — the extracted nav/footer/button lines are
    // exactly the boilerplate line dedup exists to strip — then the
    // shared d15 quality → dedup → decontamination → mixture chain).
    // One chain body (manifestChain + Dedup.lineDedupText) shared
    // with d15/d30/d31, so the four orderings cannot drift; the
    // oracle prepends the grammar-replay `wet` CTE to the SAME
    // lineChainSql + manifestChainSql text d30 uses.
    "d36_wet_curated" -> ((s, dir) => {
      val wet = docs(s, dir).select(
        col("doc_id").cast("long").as("doc_id"), col("lang"), col("source"),
        GraftFunctions.html_text(
          synthHtml(col("doc_id").cast("long"), col("text"))).as("text"))
      manifestChain(wet
        .select(col("doc_id"), col("lang"), col("source"))
        .join(Dedup.lineDedupText(wet, "doc_id", "text"), Seq("doc_id"))
        .withColumnRenamed("clean_text", "text"))
    }),

    // L42: maximal duplicated-span extraction — WHERE each doc is
    // verbatim-shared: runs of corpus-duplicated word 5-grams merged
    // into maximal token ranges (gaps-and-islands), the surgical
    // substring-dedup cut list. Two linear shuffles + a per-doc
    // window; all-integer output → hash-exact oracle.
    "d16_dup_spans" -> ((s, dir) => {
      import graft.operators.CorpusOps
      CorpusOps.duplicatedSpans(docs(s, dir), "doc_id", "text",
          n = 5, minOcc = 2)
        .orderBy("doc_id", "span_start")
    }),

    // L52: surgical span-cut application — d16's cut list APPLIED:
    // every doc re-emitted with its corpus-duplicated 5-gram spans
    // removed (token-positional filter + order-preserving concat),
    // plus kept/cut counts. The emit half of exact-substring dedup.
    "d19_span_cut" -> ((s, dir) => {
      import graft.operators.CorpusOps
      CorpusOps.cutSpans(docs(s, dir), "doc_id", "text", n = 5, minOcc = 2)
        .orderBy("doc_id")
    }),

    // L43: FUZZY decontamination — MinHash-LSH banding between the
    // corpus and the eval sources (src0/src1 again stand in for the
    // benchmark suite), exact-Jaccard verified at 0.9; catches the
    // paraphrased leakage d08's exact gram probe misses. The eval
    // side broadcasts; the oracle replays the full portable-hash LSH
    // pipeline like d03.
    "d17_fuzzy_decontam" -> ((s, dir) => {
      import graft.operators.CorpusOps
      CorpusOps.fuzzyContamination(docs(s, dir), "doc_id", "text",
          col("source").isin("src0", "src1"), threshold = 0.9,
          numHashes = 64, bands = 8)
        .orderBy("doc_id")
    }),

    // L44: BM25 ranked retrieval for a 3-term query mixing one rare
    // term ('dup', df≈5%) with two common ones — the targeted-subset
    // extraction primitive. Per-term 6-dp rounding + DECIMAL sums
    // keep the score order-independent and oracle-exact.
    "t23_bm25" -> ((s, dir) => {
      TextStats.bm25(docs(s, dir), "doc_id", "text",
          terms = Seq("dup", "spark", "merge"))
        .orderBy("doc_id")
    }),

    // L45: TextRank keyword centrality over the word co-occurrence
    // graph — 5 damped power-iteration rounds in scaled fixed-point
    // INTEGER arithmetic (floor division), so the ranks are
    // bit-identical on any engine; the oracle replays the rounds as
    // chained CTEs.
    "t24_textrank" -> ((s, dir) => {
      import graft.operators.TextRank
      TextRank.textRank(docs(s, dir), "text", iters = 5)
        .orderBy(col("rank").desc, col("w"))
    }),

    // L47: Heaps'-law vocabulary growth — novel bigrams per 50-doc
    // ingest bucket with cumulative vocabulary; gram-hash min-agg
    // inverts the sequential scan into one linear shuffle.
    "t25_vocab_growth" -> ((s, dir) => {
      TextStats.vocabGrowth(docs(s, dir), "doc_id", "text", bucket = 50)
        .orderBy("bucket_end")
    }),

    // L49: word2phrase — learn top-5 bigram collocations, fuse their
    // occurrences per doc with the greedy left-to-right scan,
    // factored into gaps-and-islands + even-offset parity (all
    // integer logic → bit-exact oracle replay).
    "t26_phrase_fuse" -> ((s, dir) => {
      import graft.operators.CorpusOps
      CorpusOps.phraseFuse(docs(s, dir), "doc_id", "text",
          topPhrases = 5, minCount = 10)
        .orderBy("doc_id")
    }),

    // L57: MinHash estimator calibration — every LSH candidate pair
    // with its signature estimate (matches/64) NEXT TO the exact
    // token-set Jaccard: the K/band adequacy dashboard
    // (Dedup.minhashCalibration; same banding+cap as d03).
    "d21_minhash_calib" -> ((s, dir) => {
      Dedup.minhashCalibration(docs(s, dir), "doc_id", "text")
        .orderBy("id_a", "id_b")
    }),

    // L60: corpus snapshot delta (recrawl CDC). Snapshot A = the
    // documents table; snapshot B is derived from it by a DETERMINISTIC
    // perturbation both engines replay literally: docs with
    // pmod(doc_id, 11) = 3 are dropped (→ removed), pmod(doc_id, 7) = 2
    // get ' rev2' appended (→ changed), and fresh ids doc_id + 10^7
    // appear for pmod(doc_id, 13) = 5 (→ added). The operator itself
    // never sees the perturbation — it full-outer joins (id, md5) pairs.
    "d22_snapshot_delta" -> ((s, dir) => {
      val a = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        col("text"))
      val b = a.filter(pmod(col("doc_id"), lit(11L)) =!= 3L)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(7L)) === 2L, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
        .unionByName(a.filter(pmod(col("doc_id"), lit(13L)) === 5L)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat(lit("fresh crawl "), col("text")).as("text")))
      Dedup.snapshotDelta(a, b, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // L61: leakage-safe corpus split — the WebText/GPT-2 lesson:
    // train/valid/test assignment must be constant across each
    // near-dup CLUSTER, or held-out docs leak into training via their
    // duplicates. Composes d07's pair mining + connected components
    // with t06's portable hash split, keyed on the cluster
    // REPRESENTATIVE (min doc_id; singletons key on themselves):
    // 90/5/5 by fmix64(rep_id) % 100. One window-free projection after
    // the CC fixpoint; the leakage invariant (1 split per cluster) is
    // structural — split is a function of rep_id.
    "d23_cluster_split" -> ((s, dir) => {
      import graft.operators.{ConnectedComponents, Sampling}
      val d = docs(s, dir)
      val pairs = Dedup.jaccardPairs(d, "doc_id", "text",
        Seq(col("lang"), expr("CAST(n_chars AS BIGINT) div 100")), threshold = 0.9)
      val cc = ConnectedComponents.minLabel(pairs.select("id_a", "id_b"))
      val bucket = Sampling.hashBucket(col("rep_id"))
      d.select(col("doc_id")).join(cc, d("doc_id") === cc("id"), "left")
        .select(col("doc_id").cast("long").as("doc_id"),
          coalesce(col("cluster"), col("doc_id")).cast("long").as("rep_id"))
        .withColumn("split",
          when(bucket < 90, "train").when(bucket < 95, "valid").otherwise("test"))
        .orderBy("doc_id")
    }),

    // L62: RELATIVE per-source quality gate (the FineWeb lesson:
    // percentile cuts per source, not one absolute threshold) — keep
    // the top 30% of each source by t02's proven quality score,
    // ⌈0.3·n⌉ per group, ties broken by doc_id. One window pass per
    // source; the 100 TB path swaps the exact rank for a per-source
    // KLL threshold (see Sampling.topFractionByScore).
    "d24_quality_topp" -> ((s, dir) => {
      import graft.operators.Sampling
      val norm = Dedup.normText(col("text"))
      val toks = Dedup.tokens(col("text"))
      val q = TextStats.qualityColumns(norm, toks).toMap.apply("quality")
      val scored = docs(s, dir).select(col("source"),
        col("doc_id").cast("long").as("doc_id"), q.as("quality"))
      Sampling.topFractionByScore(scored, "doc_id", "source", "quality", 3, 10)
        .select(col("source"), col("rk").cast("long").as("rk"),
          col("doc_id"), col("quality"), col("n_group"))
        .orderBy("source", "rk")
    }),

    // L64: incremental curation end-to-end — the 100 TB recrawl flow
    // the round's pieces compose into: d22's snapshot delta marks
    // added ∪ changed docs, ONLY those are re-scored (t02's quality),
    // d24's relative per-source gate keeps the top 30% of the new
    // material, and the output is the per-source ingest report
    // (n_ingested, n_kept, kept-quality micro sum). The full corpus
    // is never rescanned — the work set is delta-sized, which is the
    // entire point of the CDC primitive.
    "d25_incremental_curation" -> ((s, dir) => {
      import graft.operators.Sampling
      val a = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        col("source"), col("text"))
      val b = a.filter(pmod(col("doc_id"), lit(11L)) =!= 3L)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(7L)) === 2L, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
        .unionByName(a.filter(pmod(col("doc_id"), lit(13L)) === 5L)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("source"),
            concat(lit("fresh crawl "), col("text")).as("text")))
      val delta = Dedup.snapshotDelta(a.select("doc_id", "text"),
          b.select("doc_id", "text"), "doc_id", "text")
        .filter(col("status").isin("added", "changed"))
        .select("doc_id").distinct()
      val norm = Dedup.normText(col("text"))
      val toks = Dedup.tokens(col("text"))
      val qcol = TextStats.qualityColumns(norm, toks).toMap.apply("quality")
      val work = b.join(delta, Seq("doc_id"))
        .select(col("doc_id"), col("source"), qcol.as("quality"))
      val kept = Sampling.topFractionByScore(work, "doc_id", "source",
        "quality", 3, 10)
      val ingested = work.groupBy("source").agg(count(lit(1)).as("n_ingested"))
      val keptAgg = kept.groupBy("source").agg(count(lit(1)).as("n_kept"),
        sum(floor(col("quality") * lit(10000.0) + lit(0.5)).cast("long"))
          .as("kept_quality_micro"))
      ingested.join(keptAgg, Seq("source"), "left")
        .select(col("source"), col("n_ingested"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_quality_micro"), lit(0L)).as("kept_quality_micro"))
        .orderBy("source")
    }),

    // L65: containment near-dup (Broder's asymmetric measure
    // |A∩B|/|A| — catches a doc QUOTED/EMBEDDED inside a larger one,
    // which symmetric Jaccard misses because the union is dominated
    // by the container). Candidates come from the shared-4-gram
    // inverted index (d11's linear-shuffle blocking — size-based
    // blocking is unusable here by definition, containee and
    // container differ in size); the verify step is one sorted-long
    // multiset merge per pair; the keep test is integer
    // cross-multiplied (10·inter ≥ 9·|src|). Directed output: both
    // orientations of a candidate pair are tested.
    // L66: incremental LSH dedup — the "recrawl batch" (doc_id ≡ 0
    // mod 5) deduped against the static index built from the REST of
    // the corpus; only new↔corpus candidate pairs form, never
    // corpus×corpus (that re-mine is d03's job, run once at index
    // build). Same signature/banding/verify kernels and parameters
    // as d03; the hot-bucket cap governs the index side.
    "d27_incremental_lsh" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.minhashAgainstIndex(
          d.filter(pmod(col("doc_id"), lit(5)) === 0),
          d.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          "doc_id", "text", threshold = 0.9, numHashes = 64, bands = 8,
          shingleN = 1, cap = 500)
        .orderBy("new_id", "corpus_id")
    }),

    // L98/d33: lexical CLONE SEARCH — "find the corpus documents most
    // similar to this one" as top-k retrieval (the license-scan /
    // provenance / template-hunt query; dedup asks ≥ threshold, clone
    // search asks WHICH and HOW CLOSE): d27's batch-vs-index
    // candidate machinery at a LOW floor (0.1 — the size-ratio prune
    // stays implied, J ≤ min/max), exact Jaccard verify, then top-3
    // per query doc by (jaccard DESC, corpus_id) — a window keyed on
    // the query id, bounded by the banding/cap candidate volume.
    "d33_clone_topk" -> ((s, dir) => {
      val d = docs(s, dir)
      val scored = Dedup.minhashAgainstIndex(
        d.filter(pmod(col("doc_id"), lit(5)) === 0),
        d.filter(pmod(col("doc_id"), lit(5)) =!= 0),
        "doc_id", "text", threshold = 0.1, numHashes = 64, bands = 8,
        shingleN = 1, cap = 500)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("new_id").orderBy(col("jaccard").desc, col("corpus_id"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select("new_id", "rnk", "corpus_id", "jaccard")
        .orderBy("new_id", "rnk")
    }),

    // L71-driver: the persisted LSH index, DRIVER-VERIFIED — the
    // corpus side written ONCE as (band,bucket)- and id-bucketed
    // external tables (cap applied at build), then probed
    // Exchange-free on the index side. Identical result contract to
    // d27 (same params), so it reuses d27's oracle verbatim; what
    // this query adds is DuckDB certifying the whole write→read→probe
    // path, the q53 pattern applied to the index.
    "d29_lsh_index_probe" -> ((s, dir) => {
      val d = docs(s, dir)
      // scratchDir sweeps dead runs' /tmp/g_lshq_* leftovers; the
      // pid-suffixed table names are in-memory-catalog only (die with
      // the session) and saveAsTable overwrites within it.
      val idxPath = graft.sources.TidyIO.scratchDir("g_lshq")
      val prefix = idxPath.stripPrefix("/tmp/")
      Dedup.writeLshIndex(d.filter(pmod(col("doc_id"), lit(5)) =!= 0),
        "doc_id", "text", prefix, numHashes = 64, bands = 8,
        shingleN = 1, cap = 500, buckets = 8,
        path = Some(idxPath))
      Dedup.probeLshIndex(d.filter(pmod(col("doc_id"), lit(5)) === 0),
          "doc_id", "text", prefix, threshold = 0.9, numHashes = 64,
          bands = 8, shingleN = 1)
        .orderBy("new_id", "corpus_id")
    }),

    // L107/d37: right-to-be-forgotten purge of the persisted LSH
    // index (the deletion-propagation twin of d29: training-data
    // governance requires deletions to reach DERIVED artifacts, not
    // just the corpus). d29's index is built over the corpus split,
    // tombstones (doc_id ≡ 3 mod 17) are purged into a NEW versioned
    // snapshot (never rewrite a table being read — q63's versioning
    // discipline on the write side), and the batch probes the PURGED
    // index. The hot-bucket cap stays as applied at build (purging
    // only shrinks buckets; re-capping would resurrect build-dropped
    // rows). Oracle = d27's replay with the tombstone filter applied
    // AFTER the keep-cap join, exactly where the purge acts.
    "d37_index_purge" -> ((s, dir) => {
      val d = docs(s, dir)
      val idxPath = graft.sources.TidyIO.scratchDir("g_lshp")
      val prefix = idxPath.stripPrefix("/tmp/")
      Dedup.writeLshIndex(d.filter(pmod(col("doc_id"), lit(5)) =!= 0),
        "doc_id", "text", s"${prefix}_v1", numHashes = 64, bands = 8,
        shingleN = 1, cap = 500, buckets = 8,
        path = Some(s"$idxPath/v1"))
      Dedup.purgeLshIndex(s, s"${prefix}_v1", s"${prefix}_v2",
        d.filter(pmod(col("doc_id"), lit(17)) === 3)
          .select(col("doc_id").cast("long").as("id")),
        buckets = 8, path = Some(s"$idxPath/v2"))
      Dedup.probeLshIndex(d.filter(pmod(col("doc_id"), lit(5)) === 0),
          "doc_id", "text", s"${prefix}_v2", threshold = 0.9,
          numHashes = 64, bands = 8, shingleN = 1)
        .orderBy("new_id", "corpus_id")
    }),

    // L68b: line-level exact dedup + reassembly (the RefinedWeb
    // boilerplate-line pass) — every line keeps its first corpus
    // occurrence in (doc, position) order, docs reassemble from the
    // survivors; per-doc counts + reassembled-text md5.
    "d28_line_dedup" -> ((s, dir) => {
      Dedup.lineDedup(docs(s, dir), "doc_id", "text").orderBy("doc_id")
    }),

    // L105/d35: PARAGRAPH-granularity near-dedup — the RefinedWeb
    // middle granularity (d28 lines < paragraphs < d16/d19 token
    // spans). The corpus is re-shaped into blank-line paragraphs
    // deterministically (25-token chunks, t10's grid, joined by
    // "\n\n") so the oracle replays the split; shared near-dup docs
    // then collide on whole leading paragraphs and the corpus-first-
    // occurrence keep yields per-doc dup stats + a cleaned digest.
    // Same scale shape as d28 (shared unitMarked body): one keyed
    // shuffle, skew-safe first-occurrence aggregate — hot boilerplate
    // paragraphs reduce map-side (hotbucket fuzz exercises this).
    // L130/d44: URL CANONICALIZATION DEDUP — the crawl-frontier step
    // BEFORE any content dedup (one fetched page appears under
    // http/https, www/bare, tracking params, fragments, and trailing
    // slashes; CommonCrawl dedups the frontier on the canonical
    // form): canonicalize = https, lowercased host, `www.` stripped,
    // fragment dropped, `utm_*` tracking params dropped (other
    // params KEPT — they address different content), trailing slash
    // trimmed — then exact-dedup on the canonical URL keeping the
    // first-seen id. URL variants are synthesized deterministically
    // from the t32 grammar (docs with id%3!=0 get a second noisy
    // alias), so the oracle replays the canonicalizer verbatim.
    // Scale: one corpus scan + one hash aggregate on the canonical
    // key — the d01 shape with a string-function prelude, no joins.
    "d44_url_dedup" -> ((s, dir) => {
      val src = concat(lit("d"),
        regexp_replace(coalesce(col("source"), lit("")), "[^a-z0-9]", ""))
      val lng = concat(lit("l"),
        regexp_replace(coalesce(col("lang"), lit("")), "[^a-z0-9]", ""))
      val id = coalesce(col("doc_id").cast("long"), lit(-1L))
      val clean = concat(lit("https://www."), src, lit(".com/"),
        lng, lit("/doc/"), id.cast("string"))
      val noisy = concat(lit("HTTP://WWW."), upper(src), lit(".COM/"),
        lng, lit("/doc/"), id.cast("string"),
        lit("/?utm_source=feed&utm_campaign=x#top"))
      docs(s, dir)
        .select(id.as("id"),
          when(pmod(id, lit(3L)) === 0L, array(clean))
            .otherwise(array(clean, noisy)).as("urls"))
        .select(col("id"), explode(col("urls")).as("url"))
        .withColumn("host",
          regexp_replace(lower(expr("parse_url(url, 'HOST')")),
            "^www\\.", ""))
        .withColumn("path",
          regexp_replace(expr("parse_url(url, 'PATH')"), "/$", ""))
        .withColumn("kept_q",
          filter(split(coalesce(expr("parse_url(url, 'QUERY')"), lit("")),
              "&"),
            x => x =!= "" && !x.startsWith("utm_")))
        .withColumn("canonical", concat(lit("https://"), col("host"),
          col("path"),
          when(size(col("kept_q")) > 0,
            concat(lit("?"), array_join(col("kept_q"), "&")))
            .otherwise(lit(""))))
        .withColumn("reg_domain", substring_index(col("host"), ".", -2))
        .groupBy("reg_domain")
        .agg(count(lit(1)).as("n_raw"),
          countDistinct(col("canonical")).as("n_canonical"),
          (count(lit(1)) - countDistinct(col("canonical")))
            .as("n_removed"))
        .orderBy("reg_domain")
    }),

    "d35_paragraph_dedup" -> ((s, dir) => {
      // newlines inside tokens are flattened BEFORE chunking —
      // otherwise a raw "\n\n" inside a chunk would make the
      // blank-line re-split disagree with the chunk grid the oracle
      // replays (norm() collapses them at hash time anyway).
      val toks = split(replace(coalesce(col("text"), lit("")),
        lit("\n"), lit(" ")), " ")
      val ptext = array_join(transform(
        sequence(lit(1), size(toks), lit(25)),
        st => array_join(slice(toks, st, lit(25)), " ")), "\n\n")
      Dedup.paragraphDedup(
          docs(s, dir).select(col("doc_id"), ptext.as("ptext")),
          "doc_id", "ptext")
        .orderBy("doc_id")
    }),

    // cap = None here because the oracle hash-checks the EXACT pair
    // set; production passes cap (see containmentPairs's governance
    // scaladoc — a hot boilerplate 4-gram makes the exact index
    // quadratic at 100 TB).
    "d26_containment" -> ((s, dir) => {
      graft.operators.CorpusOps
        .containmentPairs(docs(s, dir), "doc_id", "text",
          n = 4, threshPct = 90, cap = None)
        .orderBy("contained_id", "container_id")
    }),

    // L56: per-source cap (the CCNet/Gopher per-domain cap) — keep at
    // most 10 docs per source, selected by portable-hash order so the
    // subset is a deterministic uniform k-sample any engine replays.
    // Since round 8 via the bounded top-k heap AGGREGATE
    // (Sampling.perGroupCapAgg — no per-source sort; the window form
    // stays the spec-pinned reference).
    "d20_source_cap" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.perGroupCapAgg(docs(s, dir), "doc_id", "source", k = 10)
        .select(col("source"), col("rk"), col("doc_id"))
        .orderBy("source", "rk")
    }),

    // L53: Gopher quality-rule battery (Rae et al. 2021) — the
    // standard heuristic document filter: word-count / mean-word-
    // length bounds, symbol-to-word ratio, bullet-/ellipsis-line
    // fractions, alphabetic-word fraction, required-stopword
    // presence; per-rule flags + conjunctive keep. Every threshold
    // is an integer cross-multiplication on raw counts — no rounded-
    // double comparisons anywhere (TextStats.gopherColumns).
    "t27_gopher" -> ((s, dir) => {
      val cols = TextStats.gopherColumns(col("text"))
      docs(s, dir).select(
          col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id")
    }),

    // L54: cross-source n-gram overlap matrix — pairwise Jaccard of
    // distinct word-3-gram sets between sources (which crawls/dumps
    // duplicate each other — the inter-snapshot dedup dashboard).
    // Shape: distinct (source, gram) via one linear shuffle, then
    // gram → sorted source SET (bounded by #sources, dump-level
    // small) → per-gram pair expansion ≤ S²/2 rows, final agg is
    // S²-sized. No per-gram doc×doc blowup anywhere — a hot gram in
    // every source costs 190 rows at S=20, independent of corpus
    // size. Jaccard via inclusion–exclusion on per-source distinct
    // counts (broadcast, S rows).
    "t28_source_overlap" -> ((s, dir) => {
      import graft.operators.CorpusOps
      CorpusOps.sourceOverlap(docs(s, dir), "doc_id", "text", "source", n = 3)
        .orderBy("src_a", "src_b")
    }),

    // L50: per-source curation profile — doc/token mass, in-source
    // exact-dup docs, mean length + robust z across sources
    // (median/MAD) flagging deviant crawls.
    "d18_source_profile" -> ((s, dir) => {
      import graft.operators.CorpusOps
      CorpusOps.sourceProfile(docs(s, dir), "doc_id", "text", "source")
        .orderBy("source")
    }),

    // L18: Gopher-style repetition signals (dup-token fraction, top
    // bigram share, duplicated-trigram share).
    "t09_repetition" -> ((s, dir) => {
      import graft.operators.CorpusOps
      CorpusOps.repetitionSignals(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // L19: fixed-window chunking (32-token windows, stride 16) — the
    // narrow map step before tokenizer sharding.
    "t10_chunks" -> ((s, dir) => {
      import graft.operators.CorpusOps
      CorpusOps.chunk(docs(s, dir), "doc_id", "text",
          chunkSize = 32, stride = 16)
        .orderBy("doc_id", "chunk_id")
    }),

    // L20: concat-and-chunk sequence packing into 512-token blocks,
    // one independent stream per language.
    "t11_pack" -> ((s, dir) => {
      import graft.operators.CorpusOps
      CorpusOps.pack(docs(s, dir), "doc_id", "text",
          col("lang"), capacity = 512)
        .orderBy("stream", "doc_id")
    }),

    // L21: vocabulary coverage curve — top-100 tokens by corpus
    // frequency with cumulative share. The top-k runs as a
    // TakeOrderedAndProject (per-partition heaps, 100 rows to the
    // driver-side merge) BEFORE any window — the rank/cumsum windows
    // then only ever see 100 rows, never the full vocabulary. The
    // aggregated vocab is persisted because both the top-k and the
    // grand total read it; without the persist the corpus explode+agg
    // lineage would run twice.
    // L67: hashed linear classifier application — the fastText-style
    // quality scorer run over the whole corpus. The model here is a
    // deterministic pseudo-weight table over 4096 hash buckets,
    // w(j) = (j·2654435761 + 97) mod 2001 − 1000 ∈ [−1000, 1000]
    // (integer weights: order-independent sums, oracle-replayable),
    // materialized to the 4096-long model array the fused codegen
    // scorer ships with the plan; a trained model drops in as-is.
    "t30_linear_score" -> ((s, dir) => {
      val cols = TextStats.hashedLinearScore(col("text"), 4096,
        (0 until 4096).map(j => (j * 2654435761L + 97L) % 2001L - 1000L))
      docs(s, dir)
        .select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id")
    }),

    // L81: TRAINED hashed centroid classifier (Rocchio TF form) —
    // distributed supervised training as a query: the train split
    // (doc_id ≢ 0 mod 5) builds per-lang bucket counts, the test
    // split scores against the broadcast model and argmaxes. Pure
    // integer counts + one exact division per (doc, class) → the
    // whole train+apply composition replays value-for-value.
    "t31_trained_classifier" -> ((s, dir) => {
      TextStats.rocchioClassify(docs(s, dir), "doc_id", "text", "lang",
          pmod(col("doc_id"), lit(5)) =!= 0, numBuckets = 4096)
        .orderBy("doc_id", "label")
    }),

    // L84: Aho–Corasick blocklist scan — the policy-term / safety-
    // filter pass: per-term greedy leftmost non-overlapping counts
    // for the whole dictionary in ONE pass over the document bytes
    // (gx BlocklistCounts; O(|text|) whatever the dictionary size,
    // vs O(|text|·|terms|) for per-term contains). The term list
    // exercises the semantics on purpose: 'a' hits inside words
    // (substring, not word-boundary), 'agg' overlaps it, 'batch
    // batch' self-overlaps in 'batch batch batch' (greedy counts 1),
    // 'sort merge' is a phrase, 'zzz' never matches. Corpus report =
    // explode + keyed agg over slim (term_idx, cnt) rows; the GATE
    // form is the narrow zero-shuffle filter
    // `exists(cnts, c -> c > 0)`. Oracle replays each term's count
    // with the shared replace() length formula — the same greedy
    // non-overlapping semantics by construction.
    "t33_blocklist" -> ((s, dir) => {
      val terms = Seq("a", "agg", "batch batch", "scan", "sort merge", "zzz")
      docs(s, dir)
        .select(GraftFunctions.blocklist_counts(
          coalesce(col("text"), lit("")), terms).as("cnts"))
        .select(posexplode(col("cnts")).as(Seq("ti", "cnt")))
        .withColumn("term", element_at(array(terms.map(lit): _*), col("ti") + 1))
        .groupBy("term")
        .agg(sum("cnt").as("n_occurrences"),
          count(when(col("cnt") > 0, 1)).as("n_docs"))
        .orderBy("term")
    }),

    // L90: the URL layer — host/path extraction through Spark's
    // NATIVE parse_url (the expression a user reaches for on crawl
    // metadata) + a registrable-domain reduction (last two labels —
    // the public-suffix-list heuristic at its simplest) feeding the
    // per-domain crawl-budget report (CCNet/RefinedWeb's per-domain
    // accounting; d20's cap then enforces the budget). URLs are
    // synthesized deterministically from (source, lang, doc_id) with
    // both components sanitized IDENTICALLY on both engines (the
    // codec-roundtrip certification pattern: the kernel under test is
    // parse_url vs the oracle's regexp host/path split — a parser
    // divergence is a hash mismatch). Narrow parse + one keyed agg.
    "t32_url_domains" -> ((s, dir) => {
      val src = concat(lit("d"),
        regexp_replace(coalesce(col("source"), lit("")), "[^a-z0-9]", ""))
      val lng = concat(lit("l"),
        regexp_replace(coalesce(col("lang"), lit("")), "[^a-z0-9]", ""))
      val sub = when(
        pmod(coalesce(col("doc_id").cast("long"), lit(0L)), lit(2)) === 0,
        "www").otherwise(lit("cdn"))
      val url = concat(lit("https://"), sub, lit("."), src, lit(".com/"),
        lng, lit("/doc/"),
        coalesce(col("doc_id").cast("long"), lit(-1L)).cast("string"))
      docs(s, dir).select(url.as("url"))
        .withColumn("host", expr("parse_url(url, 'HOST')"))
        .withColumn("path", expr("parse_url(url, 'PATH')"))
        .withColumn("reg_domain", substring_index(col("host"), ".", -2))
        .groupBy("reg_domain")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("host")).as("n_hosts"),
          countDistinct(col("path")).as("n_paths"))
        .orderBy("reg_domain")
    }),

    // L111/t40: domain LINK-GRAPH ranking — the crawl-accounting step
    // after t32's registrable-domain parse (the CCNet/frontier move:
    // rank domains by link authority before deciding how much of each
    // to crawl/keep). Edges are synthesized DETERMINISTICALLY from the
    // same sanitized URL grammar t32 uses: every doc links its source
    // domain d<source>.com to its language hub l<lang>.org (content→
    // topic edge), and even-numbered docs backlink hub→domain
    // (directory edge) — a cyclic directed weighted multi-community
    // graph whose weights are doc counts, replayable verbatim in SQL.
    // Ranking is op/LinkGraph's damped PageRank in scaled-integer
    // fixed point (the TextRank discipline), so the oracle replays
    // all 4 rounds as chained CTEs bit-for-bit. One corpus scan: both
    // edge directions come out of ONE explode (the TextRank shape);
    // the per-round work is domain-sized, never corpus-sized.
    "t40_domain_rank" -> ((s, dir) => {
      val d = docs(s, dir).select(
        concat(lit("d"), regexp_replace(coalesce(col("source"), lit("")),
          "[^a-z0-9]", ""), lit(".com")).as("dom"),
        concat(lit("l"), regexp_replace(coalesce(col("lang"), lit("")),
          "[^a-z0-9]", ""), lit(".org")).as("hub"),
        pmod(coalesce(col("doc_id").cast("long"), lit(0L)), lit(2L)).as("par"))
      val e0 = d.select(explode(when(col("par") === 0, array(
          struct(col("dom").as("src"), col("hub").as("dst")),
          struct(col("hub").as("src"), col("dom").as("dst"))))
        .otherwise(array(
          struct(col("dom").as("src"), col("hub").as("dst"))))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val edges = e0.groupBy("src", "dst").agg(count(lit(1)).as("wt"))
      graft.operators.LinkGraph.pageRank(edges, iters = 4)
        .select(col("w").as("domain"), col("rank").as("rank_fp"))
        .orderBy("domain")
    }),

    // L97/t36: per-language tokenizer FERTILITY (subwords per word —
    // the number that drives vocab-size and language-mix decisions
    // when one BPE vocabulary serves a multilingual corpus: a lang
    // with fertility ≫ 1 pays more sequence length per word): t21's
    // trained merges applied via t22's encoder with LANG as the
    // grouping key — row-level word streams group straight to
    // languages, no per-doc intermediate. Integer word/subword sums +
    // half-up 4 dp integer-space ratio → oracle-exact through the
    // same 8-round chained-CTE replay as t21/t22.
    "t36_bpe_fertility" -> ((s, dir) => {
      import graft.operators.Bpe
      val d = docs(s, dir).withColumn("lang", coalesce(col("lang"), lit("?")))
      val merges = Bpe.train(d, "text", merges = 8).map(m => (m._2, m._3))
      Bpe.encode(d, "lang", "text", merges)
        .select(col("doc_id").as("lang"), col("n_words"), col("n_subwords"),
          expr("CAST((20000 * n_subwords + n_words) div (2 * n_words) AS DOUBLE) / 10000.0")
            .as("fertility"))
        .orderBy("lang")
    }),

    "t12_vocab" -> ((s, dir) => {
      val vocab = docs(s, dir)
        .select(explode(Dedup.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .persist()
      val top = vocab.orderBy(col("cnt").desc, col("word")).limit(100)
      val total = vocab.agg(sum(col("cnt")).as("total"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("word"))
      top.crossJoin(broadcast(total))
        .withColumn("rnk", row_number().over(w))
        .withColumn("cum", sum(col("cnt")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
        .select(col("rnk"), col("word"), col("cnt"),
          round(col("cum").cast("double") / col("total").cast("double"), 6)
            .as("cum_share"))
        .orderBy("rnk")
    })
  )

  /** DuckDB word-n-gram shingle fragment over a `toks` list column —
    * mirrors [[graft.operators.Dedup.shingles]] exactly.
    */
  /** The d15 quality→dedup→decontaminate→mixture→manifest chain as a
    * CTE suffix over any `(doc_id, lang, source, text)` relation —
    * shared VERBATIM by d15 (src = documents) and d30 (src = the
    * line-deduped corpus), so the two compositions cannot drift.
    */
  private def manifestChainSql(src: String): String =
    s"""base AS (SELECT doc_id, lang, source, $normSql AS norm,
       |    string_split($normSql, ' ') AS toks FROM $src),
       | feat AS (SELECT doc_id, lang, source, norm, toks,
       |    len(toks) AS n_tokens, length(norm) AS n_chars,
       |    length(regexp_replace(norm, '[^a-z]', '', 'g')) AS alpha,
       |    ${stopFilterSql("toks", TextStats.stopwords.flatMap(_._2))} AS allstop
       |  FROM base),
       | q AS (SELECT *, least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
       |    + ${safeDivSql("allstop", "n_tokens")} * 0.3
       |    + ${safeDivSql("alpha", "n_chars")} * 0.3 AS quality
       |  FROM feat),
       | qk AS (SELECT * FROM q WHERE quality >= 0.52),
       | dd AS (SELECT * FROM (SELECT *,
       |     min(doc_id) OVER (PARTITION BY md5(norm)) AS keep_id FROM qk)
       |   WHERE doc_id = keep_id),
       | g AS (SELECT doc_id, source,
       |    unnest(list_distinct(${shingleSql(5)})) AS gm FROM base),
       | ev AS (SELECT DISTINCT gm FROM g WHERE source IN ('src0', 'src1')),
       | cont AS (SELECT DISTINCT g.doc_id FROM g JOIN ev USING (gm)
       |   WHERE g.source NOT IN ('src0', 'src1')),
       | clean AS (SELECT dd.* FROM dd
       |   WHERE dd.source NOT IN ('src0', 'src1')
       |     AND dd.doc_id NOT IN (SELECT doc_id FROM cont)),
       | n AS (SELECT lang, count(*) AS n_stratum FROM clean GROUP BY lang),
       | r AS (SELECT lang, least(1.0,
       |     CASE lang WHEN 'en' THEN 0.4 WHEN 'zh' THEN 0.25 WHEN 'de' THEN 0.15
       |       WHEN 'es' THEN 0.1 WHEN 'fr' THEN 0.1 ELSE 0.0 END
       |     * 150.0 / CAST(n_stratum AS DOUBLE)) AS keep_rate FROM n),
       | h AS (SELECT clean.*,
       |    ((${PortableHashSql.toSigned(PortableHashSql.fmix(PortableHashSql.toUnsigned("doc_id")))} % 10000) + 10000) % 10000 AS bucket
       |  FROM clean),
       | keep AS (SELECT h.* FROM h JOIN r USING (lang)
       |   WHERE CAST(bucket AS DOUBLE) < keep_rate * 10000.0)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |FROM keep GROUP BY lang ORDER BY lang""".stripMargin

  /** The d28 line-dedup chain as oracle CTEs over any (doc_id, lang,
    * source, text) relation, ending in `cd` — the cleaned corpus d30
    * (src=documents) and d36 (src=the grammar-replayed WET text) both
    * feed into manifestChainSql. ONE text, so the compositions'
    * oracles cannot drift (mirror of the Spark-side shared body).
    */
  private def lineChainSql(src: String): String =
    s"""base0 AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id, text FROM $src),
       | pos AS (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS idx
       |         FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM base0)),
       | lf AS (SELECT doc_id, idx, nline, md5(nline) AS h
       |        FROM (SELECT doc_id, idx, ${PortableHashSql.norm("ls[idx]")} AS nline FROM pos)
       |        WHERE nline <> ''),
       | mk AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn FROM lf),
       | cl AS (SELECT doc_id,
       |          string_agg(CASE WHEN rn = 1 THEN nline END, chr(10) ORDER BY idx) AS ctext
       |        FROM mk GROUP BY doc_id),
       | cd AS (SELECT CAST(d2.doc_id AS BIGINT) AS doc_id, d2.lang, d2.source,
       |          COALESCE(cl.ctext, '') AS text
       |        FROM $src d2 LEFT JOIN cl ON cl.doc_id = CAST(d2.doc_id AS BIGINT))""".stripMargin

  /** t38/d36 grammar replay: the EXPECTED visible text of the
    * synthesized page, rebuilt from raw `doc_id`/`text` with string
    * functions only. Mirrors [[synthHtml]] line for line: title, nav,
    * h1 (first word + fixed tail, whitespace-collapsed), the document
    * body (ASCII-whitespace-collapsed, dropped when empty), the
    * entity paragraph, the <br/>-split pair, the footer. The entity
    * encode/decode pair cancels, so raw text passes through verbatim
    * modulo the whitespace rule.
    */
  private val wsClassSql = """'[ \t\n\r\x0B\x0C]+'"""
  private def collapseSql(x: String): String =
    // NOT trim(): DuckDB's trim strips unicode spaces (NBSP) too,
    // but HTML whitespace is ASCII-only — NBSP is visible content
    // the kernel must keep. Collapse runs to one space, then strip a
    // single leading/trailing space with an anchored ASCII regex.
    s"regexp_replace(regexp_replace($x, $wsClassSql, ' ', 'g'), '^ | $$', '', 'g')"
  private[queries] val visibleSql: String =
    s"""array_to_string(list_filter([
       |   'Doc ' || CAST(doc_id AS BIGINT),
       |   'Home | About | Contact',
       |   ${collapseSql("split_part(coalesce(text, ''), ' ', 1) || ' heads this page'")},
       |   ${collapseSql("coalesce(text, '')")},
       |   'Q & A <section ' || CAST(doc_id AS BIGINT) || '> ends',
       |   'lineA ' || CAST(doc_id AS BIGINT),
       |   'lineB',
       |   'Copyright 2026 Example Corp'
       | ], x -> x <> ''), chr(10))""".stripMargin

  private def shingleSql(n: Int): String = {
    val cat = (0 until n).map(k => s"toks[i${if (k > 0) s" + $k" else ""}]")
      .mkString("concat(", ", ' ', ", ")")
    s"""CASE WHEN len(toks) < $n THEN [array_to_string(toks, ' ')]
       | ELSE list_transform(range(1, len(toks)${if (n > 2) s" - ${n - 2}" else ""}),
       |   i -> $cat) END""".stripMargin
  }

  /** DuckDB replay of the `Bpe.train(merges = k)` round chain —
    * mirrors operators/Bpe.scala round for round. Returns the WITH
    * body defining base, w0..wk, m1..mk.
    */
  private def bpeChainSql(k: Int): String = {
    val base =
      s"""base AS (SELECT word, count(*) AS n_word FROM
         |   (SELECT unnest(string_split($normSql, ' ')) AS word FROM documents)
         |   WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY word),
         | w0 AS (SELECT word, n_word,
         |   '|' || array_to_string(string_split(word, ''), '||') || '|' AS sym
         |   FROM base)""".stripMargin
    def roundCtes(i: Int): String =
      s""" m$i AS (SELECT l, r, n FROM (
         |   SELECT z[1] AS l, z[2] AS r, CAST(sum(n_word) AS BIGINT) AS n
         |   FROM (SELECT n_word, unnest(list_zip(sy[1:len(sy)-1], sy[2:len(sy)])) AS z
         |         FROM (SELECT n_word, string_split(trim(sym, '|'), '||') AS sy
         |               FROM w${i - 1}))
         |   GROUP BY 1, 2) ORDER BY n DESC, l, r LIMIT 1),
         | w$i AS (SELECT word, n_word,
         |   replace(sym, '|' || l || '||' || r || '|', '|' || l || r || '|') AS sym
         |   FROM w${i - 1} CROSS JOIN m$i)""".stripMargin
    s"$base,\n${(1 to k).map(roundCtes).mkString(",\n")}"
  }

  private def bpeOracleSql(k: Int): String = {
    val selects = (1 to k)
      .map(i => s"SELECT CAST($i AS BIGINT) AS round, l AS lft, r AS rgt, n AS pair_count FROM m$i")
      .mkString("\n UNION ALL ")
    s"WITH ${bpeChainSql(k)}\n$selects\nORDER BY round"
  }

  /** Encode oracle: after k merge rounds, every corpus word's symbol
    * string in wk IS its encoding — join doc tokens to it and count.
    */
  private def bpeEncodeOracleSql(k: Int): String =
    s"""WITH ${bpeChainSql(k)},
       | tf AS (SELECT doc_id, word FROM
       |   (SELECT doc_id, unnest(string_split($normSql, ' ')) AS word FROM documents)
       |   WHERE regexp_matches(word, '^[a-z]+$$')),
       | enc AS (SELECT doc_id,
       |   len(string_split(trim(sym, '|'), '||')) AS n_sub
       |  FROM tf JOIN w$k USING (word))
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_sub) AS BIGINT) AS n_subwords
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val langidScoreSql: Seq[(String, String)] =
    TextStats.stopwords.map { case (lang, words) =>
      lang -> stopFilterSql("toks", words)
    }

  private val langidCaseSql: String = {
    val names = TextStats.stopwords.map(_._1)
    val whens = names.init.zipWithIndex.map { case (lang, i) =>
      val conds = (i + 1 until names.length)
        .map(j => s"score_$lang >= score_${names(j)}").mkString(" AND ")
      s"WHEN $conds THEN '$lang'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${names.last}' END"
  }

  /** d27's replay (d03's signature/banding chain split into batch
    * doc_id ≡ 0 mod 5 and index sides; hot-bucket HAVING on the
    * index only, candidates batch↔index). `distinctBase = true`
    * collapses exact duplicate (doc_id, text) rows FIRST — st16's
    * streaming-ingest contract, where a re-delivered document must
    * not multiply its verify rows like the batch join does.
    */
  /** t34's held-out bigram cross-entropy replay as shared CTEs ending
    * in `xe` (doc_id, n_bigrams, xent) — t34 selects it directly,
    * d38 buckets it per language. ONE text, so the scorer and its
    * CCNet bucket consumer cannot drift.
    */
  private lazy val heldoutXentSql: String =
    s"""tk AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |     string_split($normSql, ' ') AS l FROM documents),
       | f AS (SELECT doc_id, l FROM tk WHERE len(l) >= 2),
       | b AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM
       |   (SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z FROM f)),
       | trb AS (SELECT * FROM b WHERE ((doc_id % 5) + 5) % 5 <> 0),
       | teb AS (SELECT * FROM b WHERE ((doc_id % 5) + 5) % 5 = 0),
       | bi AS (SELECT w1, w2, count(*) AS n_xy FROM trb GROUP BY 1, 2),
       | ctx AS (SELECT w1, CAST(sum(n_xy) AS BIGINT) AS n_ctx FROM bi GROUP BY 1),
       | vv AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM bi),
       | pr AS (SELECT teb.doc_id,
       |     CAST(round(ln(CAST(coalesce(n_ctx, 0) + v AS DOUBLE))
       |       - ln(CAST(coalesce(n_xy, 0) + 1 AS DOUBLE)), 6)
       |       AS DECIMAL(18,6)) AS term
       |   FROM teb LEFT JOIN bi USING (w1, w2) LEFT JOIN ctx USING (w1)
       |   CROSS JOIN vv),
       | sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, sum(term) AS s
       |   FROM pr GROUP BY doc_id),
       | xe AS (SELECT doc_id, n_bigrams,
       |   CAST((CAST(s * 1000000 AS BIGINT) + 50 * n_bigrams)
       |     // (100 * n_bigrams) AS DOUBLE) / 10000.0 AS xent
       |  FROM sc)""".stripMargin

  private[queries] def incrementalLshOracleSql(distinctBase: Boolean): String =
    incrementalLshOracleSql(distinctBase, purgeMod = None)

  /** `purgeMod = Some((m, r))` drops corpus rows with doc_id ≡ r
    * (mod m) AFTER the hot-bucket keep join — exactly where
    * Dedup.purgeLshIndex acts on the already-capped stored index
    * (d37). None replays the unpurged d27/d29 contract.
    */
  private[queries] def incrementalLshOracleSql(distinctBase: Boolean,
                                               purgeMod: Option[(Int, Int)]): String = {
    val src = if (distinctBase) "(SELECT DISTINCT doc_id, text FROM documents)"
              else "documents"
    val purge = purgeMod.map { case (m, r) =>
      s" WHERE (mbc.doc_id % $m + $m) % $m <> $r" }.getOrElse("")
    s"""WITH dn AS (SELECT doc_id, ${PortableHashSql.norm("text")} AS ntx FROM $src),
       | d AS (SELECT doc_id, list_distinct(split(ntx, ' ')) AS toks FROM dn),
       | tk AS (SELECT doc_id, unnest(toks) AS tok FROM d),
       | th AS (SELECT doc_id, ${PortableHashSql.tokenHash("tok")} AS h FROM tk),
       | mg AS (SELECT doc_id, k, min(${PortableHashSql.toSigned(PortableHashSql.permuteSql("h"))}) AS m
       |        FROM th, ${PortableHashSql.minhashCoeffValues(64)}
       |        GROUP BY doc_id, k),
       | msl AS (SELECT doc_id, k // 8 AS band,
       |           list(${PortableHashSql.toUnsigned("m")} ORDER BY k) AS ms
       |         FROM mg GROUP BY doc_id, k // 8),
       | mbk AS (SELECT doc_id, band,
       |           ${PortableHashSql.toSigned(
                      PortableHashSql.mixHashList("list_prepend(CAST(band AS HUGEINT), ms)"))} AS bucket
       |         FROM msl),
       | mbn AS (SELECT * FROM mbk WHERE (doc_id % 5 + 5) % 5 = 0),
       | mbc AS (SELECT * FROM mbk WHERE (doc_id % 5 + 5) % 5 <> 0),
       | keep AS (SELECT band, bucket FROM mbc GROUP BY band, bucket HAVING count(*) <= 500),
       | bkc AS (SELECT mbc.* FROM mbc JOIN keep USING (band, bucket)$purge),
       | cand AS (SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
       |          FROM mbn n JOIN bkc c ON n.band = c.band AND n.bucket = c.bucket),
       | v AS (SELECT new_id, corpus_id,
       |         len(list_intersect(da.toks, db.toks)) AS inter,
       |         len(da.toks) AS na, len(db.toks) AS nb
       |       FROM cand
       |       JOIN d da ON da.doc_id = new_id
       |       JOIN d db ON db.doc_id = corpus_id)
       |SELECT new_id, corpus_id,
       |  round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 3) AS jaccard
       |FROM v
       |WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.9
       |ORDER BY new_id, corpus_id""".stripMargin
  }

  /** d33: d27's chain at a 0.1 floor + rank-3 per query doc, ranked
    * on the ROUNDED jaccard with corpus_id tie-break (both sides).
    */
  private def cloneTopkOracleSql: String = {
    val base = incrementalLshOracleSql(distinctBase = false)
    val chain = base.substring(0, base.lastIndexOf("SELECT new_id"))
    s"""${chain.trim.stripSuffix(")")}),
       | scored AS (SELECT new_id, corpus_id,
       |   round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 3) AS jaccard
       | FROM v
       | WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.1),
       | rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY new_id
       |     ORDER BY jaccard DESC, corpus_id) AS BIGINT) AS rnk FROM scored)
       |SELECT new_id, rnk, corpus_id, jaccard
       |FROM rk WHERE rnk <= 3 ORDER BY new_id, rnk""".stripMargin
  }

  // d29 runs the persisted-index probe (writeLshIndex → probeLshIndex)
  // with d27's exact parameters — the RESULT contract is identical
  // (the index is d27's corpus side written once, the probe its join),
  // so its oracle is d27's verbatim.
  /** d43's target rows per dataloader shard: the shard count is
    * ceil(corpus / this) — small enough that the test corpora
    * exercise several shards, and the SAME integer rule the oracle
    * replays (at production scale the caller passes a real target,
    * e.g. 10^6 rows; Sampling.epochShardCount is the shared rule).
    * Declared ABOVE `oracle`: the eager val forces the lazy
    * oracleBase at object init, which interpolates this constant.
    */
  private final val d43TargetShardRows = 200L

  val oracle: Map[String, String] = oracleBase +
    ("d29_lsh_index_probe" -> oracleBase("d27_incremental_lsh")) +
    ("d33_clone_topk" -> cloneTopkOracleSql) +
    // d37 = d29's probe over the PURGED index: d27's replay with the
    // tombstone filter applied after the keep-cap join.
    ("d37_index_purge" ->
      incrementalLshOracleSql(distinctBase = false, purgeMod = Some((17, 3))))

  /** d43's per-epoch seed constants, precomputed in Scala (the oracle
    * replays fmix64(seed ⊕ doc_id) with the seed already mixed).
    */
  private def epochOrderSelect(e: Long): String = {
    val seed = org.apache.spark.sql.graftx.Fmix64.fmix(e + 1L)
    val hs = PortableHashSql.toSigned(PortableHashSql.fmix(
      PortableHashSql.toUnsigned(s"xor(doc_id, CAST($seed AS BIGINT))")))
    s"""SELECT CAST($e AS BIGINT) AS epoch, doc_id, $hs AS hs
       | FROM documents WHERE doc_id IS NOT NULL""".stripMargin
  }

  private lazy val oracleBase: Map[String, String] = Map(
    "d43_epoch_order" ->
      s"""WITH e AS (${epochOrderSelect(0L)} UNION ALL ${epochOrderSelect(1L)}),
         | ns AS (SELECT GREATEST(1, (count(*) + ${d43TargetShardRows - 1L})
         |      // $d43TargetShardRows) AS sc
         |   FROM documents WHERE doc_id IS NOT NULL),
         | r AS (SELECT epoch, ((hs % sc) + sc) % sc AS shard,
         |    ((hs % 1000000) + 1000000) % 1000000 AS hmod, hs, doc_id
         |  FROM e, ns),
         | rk AS (SELECT epoch, shard, hmod,
         |    row_number() OVER (PARTITION BY epoch, shard
         |      ORDER BY hs, doc_id) AS rank
         |  FROM r)
         |SELECT epoch, CAST(shard AS BIGINT) AS shard,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(rank * hmod) AS BIGINT) AS order_checksum
         |FROM rk GROUP BY epoch, shard ORDER BY epoch, shard""".stripMargin,

    // t46: argmax/argmin replayed as (score, id)-struct extremes —
    // the same total order Spark's max(struct) uses.
    "t46_pref_pairs" ->
      s"""WITH d AS (SELECT coalesce(source, '?') AS src,
         |    coalesce(lang, '?') AS lng, doc_id,
         |    CAST(coalesce(n_chars, 0) AS BIGINT) AS score
         |  FROM documents WHERE doc_id IS NOT NULL),
         | g AS (SELECT src, lng, count(*) AS n_cands,
         |    max({'score': score, 'doc_id': doc_id}) AS best,
         |    min({'score': score, 'doc_id': doc_id}) AS worst
         |  FROM d GROUP BY src, lng)
         |SELECT src, lng,
         |  CAST(best.doc_id AS BIGINT) AS chosen_id,
         |  CAST(worst.doc_id AS BIGINT) AS rejected_id,
         |  CAST(best.score - worst.score AS BIGINT) AS margin,
         |  CAST(n_cands AS BIGINT) AS n_cands
         |FROM g WHERE n_cands >= 2 ORDER BY src, lng""".stripMargin,

    // t47: the fit audit replayed with t03's whitespace token rule;
    // loss in basis points is exact integer arithmetic.
    "t47_context_fit" ->
      s"""WITH d AS (SELECT coalesce(source, '?') AS src,
         |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS toks
         |  FROM documents WHERE doc_id IS NOT NULL),
         | g AS (SELECT src, toks, CAST(l AS BIGINT) AS max_len
         |   FROM d, (VALUES (64), (256), (1024)) AS ls(l))
         |SELECT src, max_len,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN toks > max_len THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_truncated,
         |  CAST(sum(toks) AS BIGINT) AS tokens_total,
         |  CAST(sum(least(toks, max_len)) AS BIGINT) AS tokens_kept,
         |  CAST(CASE WHEN sum(toks) > 0
         |    THEN ((sum(toks) - sum(least(toks, max_len))) * 10000) // sum(toks)
         |    ELSE 0 END AS BIGINT) AS loss_bp
         |FROM g GROUP BY src, max_len ORDER BY src, max_len""".stripMargin,

    "d01_dedup_exact" ->
      s"""SELECT md5(norm) AS content_hash, min(doc_id) AS keep_id,
         | count(*) AS n_copies
         |FROM (SELECT doc_id, $normSql AS norm FROM documents)
         |GROUP BY content_hash ORDER BY keep_id""".stripMargin,

    "d02_dedup_jaccard" ->
      s"""WITH d AS (
         |  SELECT doc_id AS id, lang, CAST(n_chars AS BIGINT) // 100 AS lb,
         |    list_distinct(string_split($normSql, ' ')) AS toks
         |  FROM documents)
         |SELECT a.id AS id_a, b.id AS id_b,
         |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
         |        CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE),
         |        3) AS jaccard
         |FROM d a JOIN d b
         |  ON a.lang = b.lang AND a.lb = b.lb AND len(a.toks) = len(b.toks)
         |  AND a.id < b.id
         |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
         |      CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         |      >= 0.9
         |ORDER BY id_a, id_b""".stripMargin,

    "d07_dup_clusters" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id AS id, lang, CAST(n_chars AS BIGINT) // 100 AS lb,
         |    list_distinct(string_split($normSql, ' ')) AS toks
         |  FROM documents),
         | pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b
         |  FROM d a JOIN d b
         |    ON a.lang = b.lang AND a.lb = b.lb AND len(a.toks) = len(b.toks)
         |    AND a.id < b.id
         |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
         |        CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         |        >= 0.9),
         | edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         | reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
         | cc AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id)
         |SELECT id AS doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM cc ORDER BY cluster_id, doc_id""".stripMargin,

    // d32: d07's reachability replay reduced to the size histogram;
    // singletons = distinct ids minus clustered ids.
    "d32_cluster_histogram" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id AS id, lang, CAST(n_chars AS BIGINT) // 100 AS lb,
         |    list_distinct(string_split($normSql, ' ')) AS toks
         |  FROM documents),
         | pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b
         |  FROM d a JOIN d b
         |    ON a.lang = b.lang AND a.lb = b.lb AND len(a.toks) = len(b.toks)
         |    AND a.id < b.id
         |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
         |        CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         |        >= 0.9),
         | edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         | reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
         | cc AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         | sizes AS (SELECT cluster_id, count(*) AS sz FROM cc GROUP BY 1),
         | hist AS (SELECT sz, CAST(count(*) AS BIGINT) AS ncl FROM sizes GROUP BY sz),
         | alln AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
         | clustered AS (SELECT count(DISTINCT id) AS c FROM cc),
         | u AS (SELECT * FROM hist
         |   UNION ALL
         |   SELECT 1 AS sz, CAST(n - c AS BIGINT) AS ncl FROM alln, clustered)
         |SELECT CAST(sz AS BIGINT) AS cluster_size, ncl AS n_clusters,
         |  CAST(sz * ncl AS BIGINT) AS n_docs,
         |  CAST((sz - 1) * ncl AS BIGINT) AS docs_removed
         |FROM u WHERE ncl > 0 ORDER BY 1""".stripMargin,

    // d34: the keeper convention replayed as arg-min by the same
    // (did, source, nt) total order; raw counts straight off rows.
    "d34_effective_tokens" ->
      s"""WITH d AS (SELECT coalesce(source, '?') AS source,
         |    md5($normSql) AS h,
         |    coalesce(CAST(doc_id AS BIGINT), -1) AS did,
         |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS nt
         |  FROM documents),
         | raw AS (SELECT source, count(*) AS n_docs,
         |    CAST(sum(nt) AS BIGINT) AS raw_tokens
         |  FROM d GROUP BY source),
         | k AS (SELECT h, source, nt FROM (SELECT *,
         |    row_number() OVER (PARTITION BY h
         |      ORDER BY did, source, nt) AS rn FROM d) WHERE rn = 1),
         | uniq AS (SELECT source, CAST(count(*) AS BIGINT) AS n_unique_docs,
         |    CAST(sum(nt) AS BIGINT) AS effective_tokens
         |  FROM k GROUP BY source)
         |SELECT raw.source, n_docs, raw_tokens,
         |  coalesce(n_unique_docs, 0) AS n_unique_docs,
         |  coalesce(effective_tokens, 0) AS effective_tokens
         |FROM raw LEFT JOIN uniq ON raw.source = uniq.source
         |ORDER BY raw.source""".stripMargin,

    "d09_keep_best" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id AS id, lang, CAST(n_chars AS BIGINT) // 100 AS lb,
         |    list_distinct(string_split($normSql, ' ')) AS toks
         |  FROM documents),
         | pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b
         |  FROM d a JOIN d b
         |    ON a.lang = b.lang AND a.lb = b.lb AND len(a.toks) = len(b.toks)
         |    AND a.id < b.id
         |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
         |        CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         |        >= 0.9),
         | edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         | reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
         | cc AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         | q AS (
         |  SELECT doc_id,
         |    ${hup4Sql(
               s"""least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) * 0.4 +
         |          ${safeDivSql("allstop", "len(toks)")} * 0.3 +
         |          ${safeDivSql("alpha", "length(norm)")} * 0.3""")}
         |      AS quality
         |  FROM (SELECT doc_id, norm, toks,
         |          length(regexp_replace(norm, '[^a-z]', '', 'g')) AS alpha,
         |          ${stopFilterSql("toks", TextStats.stopwords.flatMap(_._2))} AS allstop
         |        FROM (SELECT doc_id, $normSql AS norm,
         |                string_split($normSql, ' ') AS toks FROM documents))),
         | lab AS (SELECT q.doc_id, coalesce(cc.cluster_id, q.doc_id) AS cluster_id,
         |           q.quality
         |         FROM q LEFT JOIN cc ON q.doc_id = cc.id),
         | keep AS (SELECT cluster_id, doc_id AS keep_id FROM (
         |    SELECT cluster_id, doc_id, row_number() OVER (
         |      PARTITION BY cluster_id ORDER BY quality DESC, doc_id) AS rn
         |    FROM lab) WHERE rn = 1)
         |SELECT lab.doc_id, lab.cluster_id, keep.keep_id
         |FROM lab JOIN keep USING (cluster_id) ORDER BY doc_id""".stripMargin,

    "d06_ngram_jaccard" ->
      s"""WITH d0 AS (
         |  SELECT doc_id AS id, lang, string_split($normSql, ' ') AS toks
         |  FROM documents),
         | d AS (
         |  SELECT id, lang,
         |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |      ELSE list_transform(range(1, len(toks) - 1),
         |             i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) END) AS grams
         |  FROM d0)
         |SELECT a.id AS id_a, b.id AS id_b,
         |  round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
         |        CAST(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS DOUBLE),
         |        3) AS jaccard
         |FROM d a JOIN d b
         |  ON a.lang = b.lang AND a.id < b.id
         |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
         |      CAST(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |      >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,

    "t07_tfidf" ->
      s"""WITH words AS (
         |  SELECT lang, doc_id, unnest(string_split($normSql, ' ')) AS word
         |  FROM documents),
         | stats AS (
         |  SELECT lang, word, count(*) AS tf, count(DISTINCT doc_id) AS df
         |  FROM words GROUP BY lang, word),
         | nd AS (SELECT lang, count(DISTINCT doc_id) AS n FROM documents GROUP BY lang),
         | ranked AS (
         |  SELECT stats.lang, word, tf, df, n,
         |    row_number() OVER (PARTITION BY stats.lang ORDER BY tf DESC, word) AS rnk
         |  FROM stats JOIN nd ON stats.lang = nd.lang)
         |SELECT lang, rnk, word, tf, df,
         |  round(tf * ln((n + 1.0) / (df + 1.0)), 4) AS tfidf
         |FROM ranked WHERE rnk <= 20 ORDER BY lang, rnk""".stripMargin,

    "t08_stratified" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |    ${PortableHashSql.toSigned(PortableHashSql.fmix(PortableHashSql.toUnsigned("doc_id")))} AS hs
         |  FROM documents),
         | b AS (SELECT doc_id, lang, ((hs % 10000) + 10000) % 10000 AS bucket FROM h)
         |SELECT doc_id, lang FROM b
         |WHERE CAST(bucket AS DOUBLE) <
         |  CASE lang WHEN 'en' THEN 0.5 * 10000 WHEN 'fr' THEN 0.25 * 10000
         |            WHEN 'de' THEN 0.1 * 10000 ELSE 0.0 END
         |ORDER BY doc_id""".stripMargin,

    "d10_weighted_sample" ->
      s"""WITH pri AS (SELECT doc_id, n_chars,
         |  (CAST((${PortableHashSql.fmix(PortableHashSql.toUnsigned("doc_id"))}) >> 11 AS DOUBLE)
         |     / 9007199254740992.0) / CAST(n_chars AS DOUBLE) AS priority
         | FROM documents WHERE n_chars > 0)
         |SELECT doc_id, n_chars, priority FROM pri
         |ORDER BY priority, doc_id LIMIT 200""".stripMargin,

    "t13_bigram_lift" ->
      s"""WITH tk AS (SELECT string_split($normSql, ' ') AS l FROM documents),
         | bg AS (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z FROM tk),
         | bi AS (SELECT z[1] AS w1, z[2] AS w2, count(*) AS n_xy FROM bg GROUP BY 1, 2),
         | un AS (SELECT w, count(*) AS n_w
         |   FROM (SELECT unnest(l) AS w FROM tk) GROUP BY w),
         | tot AS (SELECT CAST(sum(n_xy) AS DOUBLE) AS n_tot FROM bi)
         |SELECT w1, w2, n_xy, x.n_w AS n_x, y.n_w AS n_y,
         |  round((CAST(n_xy AS DOUBLE) * n_tot)
         |    / (CAST(x.n_w AS DOUBLE) * CAST(y.n_w AS DOUBLE)), 4) AS lift
         |FROM bi JOIN un x ON bi.w1 = x.w JOIN un y ON bi.w2 = y.w CROSS JOIN tot
         |ORDER BY n_xy DESC, w1, w2 LIMIT 50""".stripMargin,

    "t01_langid" ->
      s"""SELECT doc_id,
         | ${langidScoreSql.map { case (l, e) => s"$e AS score_$l" }.mkString(",\n ")},
         | $langidCaseSql AS predicted
         |FROM (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "t02_quality" ->
      s"""SELECT doc_id, n_chars, n_tokens,
         | ${hup4Sql(safeDivSql("n_chars - (n_tokens - 1)", "n_tokens"))} AS mean_tok_len,
         | ${hup4Sql(safeDivSql("allstop", "n_tokens"))} AS stop_ratio,
         | ${hup4Sql(safeDivSql("alpha", "n_chars"))} AS alpha_ratio,
         | ${hup4Sql(
             s"""least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4 +
         |       ${safeDivSql("allstop", "n_tokens")} * 0.3 +
         |       ${safeDivSql("alpha", "n_chars")} * 0.3""")} AS quality
         |FROM (
         |  SELECT doc_id, length(norm) AS n_chars, len(toks) AS n_tokens,
         |    length(regexp_replace(norm, '[^a-z]', '', 'g')) AS alpha,
         |    ${stopFilterSql("toks", TextStats.stopwords.flatMap(_._2))} AS allstop
         |  FROM (SELECT doc_id, $normSql AS norm,
         |          string_split($normSql, ' ') AS toks
         |        FROM documents))
         |ORDER BY doc_id""".stripMargin,

    "t03_tokens" ->
      s"""SELECT doc_id,
        | len(string_split(norm, ' ')) AS ws_tokens,
        | len(regexp_extract_all(norm, '[a-z0-9]+')) AS word_tokens,
        | CAST(coalesce(list_sum(list_transform(regexp_extract_all(norm, '[a-z0-9]+'),
        |   w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0) AS BIGINT) AS bpe_ish_tokens
        |FROM (SELECT doc_id, $normSql AS norm FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "t04_fingerprint" ->
      s"""SELECT doc_id, md5($normSql) AS fp_md5
         |FROM documents ORDER BY doc_id""".stripMargin,

    // t05: the rolling-hash + simhash fingerprints replicated
    // bit-for-bit in DuckDB via HUGEINT wrapping-arithmetic emulation
    // (PortableHashSql) — graduated from rows-only to a full oracle.
    "t05_rollhash" ->
      s"""WITH ${PortableHashSql.simhashCtes},
         | r AS (SELECT doc_id, ${PortableHashSql.roll("nt")} AS ur FROM __n)
         |SELECT r.doc_id, ${PortableHashSql.toSigned("ur")} AS fp_roll, simfp.fp_sim
         |FROM r JOIN simfp USING (doc_id) ORDER BY doc_id""".stripMargin,

    // d04: brute-force Hamming pairs over the replicated fingerprints.
    // The banded Spark plan must equal this exactly (pigeonhole, no cap).
    "d04_simhash" ->
      s"""WITH ${PortableHashSql.simhashCtes}
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.fp_sim, b.fp_sim)) AS BIGINT) AS hamming
         |FROM simfp a JOIN simfp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.fp_sim, b.fp_sim)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    // t06: fmix64 hash split replicated exactly (pmod -> ((x%n)+n)%n).
    "t06_hash_split" ->
      s"""WITH h AS (SELECT lang,
         |    ${PortableHashSql.toSigned(PortableHashSql.fmix(PortableHashSql.toUnsigned("doc_id")))} AS hs
         |  FROM documents),
         | b AS (SELECT lang, ((hs % 100) + 100) % 100 AS bucket FROM h)
         |SELECT lang, CASE WHEN bucket < 80 THEN 'train' ELSE 'heldout' END AS split,
         |  count(*) AS n
         |FROM b GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    // d03: the FULL MinHash+LSH pipeline replicated — tokenHash,
    // splitmix permutation coefficients (emitted as literals), signed
    // minima, banded mix_hash buckets, the hot-bucket cap, and exact
    // Jaccard verification on distinct token sets.
    "d03_minhash_lsh" ->
      s"""WITH dn AS (SELECT doc_id, ${PortableHashSql.norm("text")} AS ntx FROM documents),
         | d AS (SELECT doc_id, list_distinct(split(ntx, ' ')) AS toks FROM dn),
         | tk AS (SELECT doc_id, unnest(toks) AS tok FROM d),
         | th AS (SELECT doc_id, ${PortableHashSql.tokenHash("tok")} AS h FROM tk),
         | mg AS (SELECT doc_id, k, min(${PortableHashSql.toSigned(PortableHashSql.permuteSql("h"))}) AS m
         |        FROM th, ${PortableHashSql.minhashCoeffValues(64)}
         |        GROUP BY doc_id, k),
         | msl AS (SELECT doc_id, k // 8 AS band,
         |           list(${PortableHashSql.toUnsigned("m")} ORDER BY k) AS ms
         |         FROM mg GROUP BY doc_id, k // 8),
         | mbk AS (SELECT doc_id, band,
         |           ${PortableHashSql.toSigned(
                        PortableHashSql.mixHashList("list_prepend(CAST(band AS HUGEINT), ms)"))} AS bucket
         |         FROM msl),
         | keep AS (SELECT band, bucket FROM mbk GROUP BY band, bucket HAVING count(*) <= 500),
         | bk AS (SELECT mbk.* FROM mbk JOIN keep USING (band, bucket)),
         | cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |          FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |            AND a.doc_id < b.doc_id),
         | v AS (SELECT id_a, id_b,
         |         len(list_intersect(da.toks, db.toks)) AS inter,
         |         len(da.toks) AS na, len(db.toks) AS nb
         |       FROM cand
         |       JOIN d da ON da.doc_id = id_a
         |       JOIN d db ON db.doc_id = id_b)
         |SELECT id_a, id_b,
         |  round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 3) AS jaccard
         |FROM v
         |WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.9
         |ORDER BY id_a, id_b""".stripMargin,

    // d27: d03's signature/banding CTE chain, split into batch
    // (doc_id ≡ 0 mod 5) and index sides; the hot-bucket HAVING
    // applies to the index only, candidates are batch↔index.
    "d27_incremental_lsh" -> incrementalLshOracleSql(distinctBase = false),

    // t30: per-ROW replay (no GROUP BY — duplicate doc_id rows must
    // keep their multiplicity): bucket each token's portable hash mod
    // 4096 (power of two, so the unsigned residue needs no sign
    // fix-up), apply the pseudo-weight formula, list-sum. Empty
    // tokens are filtered (split('') is ['']) so an empty doc is
    // (0, 0, NULL) — mirroring hashedLinearScore's guard.
    // t32: the same synthesized URL; host/path via anchored regexp —
    // any parse_url divergence from the plain grammar hash-differs.
    // d44: the canonicalizer replayed verbatim — scheme/case/www/
    // trailing-slash/utm/fragment noise collapses, other params keep.
    "d44_url_dedup" ->
      """WITH d AS (SELECT coalesce(CAST(doc_id AS BIGINT), -1) AS id,
        |    'd' || regexp_replace(coalesce(source, ''), '[^a-z0-9]', '', 'g') AS src,
        |    'l' || regexp_replace(coalesce(lang, ''), '[^a-z0-9]', '', 'g') AS lng
        |  FROM documents),
        | u AS (
        |  SELECT id, 'https://www.' || src || '.com/' || lng || '/doc/' ||
        |    CAST(id AS VARCHAR) AS url FROM d
        |  UNION ALL
        |  SELECT id, 'HTTP://WWW.' || upper(src) || '.COM/' || lng ||
        |    '/doc/' || CAST(id AS VARCHAR) ||
        |    '/?utm_source=feed&utm_campaign=x#top'
        |  FROM d WHERE ((id % 3) + 3) % 3 <> 0),
        | p AS (SELECT
        |    regexp_replace(lower(regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1)),
        |      '^www\.', '') AS host,
        |    regexp_replace(regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1),
        |      '/$', '') AS path,
        |    coalesce(regexp_extract(url, '\?([^#]*)', 1), '') AS q
        |  FROM u),
        | c AS (SELECT host, path,
        |    list_filter(string_split(q, '&'),
        |      x -> x <> '' AND NOT starts_with(x, 'utm_')) AS kq
        |  FROM p),
        | r AS (SELECT
        |    array_to_string(string_split(host, '.')[-2:], '.') AS reg_domain,
        |    'https://' || host || path ||
        |    CASE WHEN len(kq) > 0 THEN '?' || array_to_string(kq, '&')
        |         ELSE '' END AS canonical
        |  FROM c)
        |SELECT reg_domain, CAST(count(*) AS BIGINT) AS n_raw,
        |  CAST(count(DISTINCT canonical) AS BIGINT) AS n_canonical,
        |  CAST(count(*) - count(DISTINCT canonical) AS BIGINT) AS n_removed
        |FROM r GROUP BY reg_domain ORDER BY reg_domain""".stripMargin,

    "t32_url_domains" ->
      """WITH u AS (SELECT
        |    'https://' ||
        |    CASE WHEN ((coalesce(CAST(doc_id AS BIGINT), 0) % 2) + 2) % 2 = 0
        |         THEN 'www' ELSE 'cdn' END ||
        |    '.d' || regexp_replace(coalesce(source, ''), '[^a-z0-9]', '', 'g') ||
        |    '.com/l' || regexp_replace(coalesce(lang, ''), '[^a-z0-9]', '', 'g') ||
        |    '/doc/' || CAST(coalesce(CAST(doc_id AS BIGINT), -1) AS VARCHAR) AS url
        |  FROM documents),
        | p AS (SELECT
        |    regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
        |    regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1) AS path
        |  FROM u),
        | r AS (SELECT host, path,
        |    array_to_string(string_split(host, '.')[-2:], '.') AS reg_domain
        |  FROM p)
        |SELECT reg_domain, count(*) AS n_docs,
        |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
        |  CAST(count(DISTINCT path) AS BIGINT) AS n_paths
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // t40: the full 4-round damped PageRank replayed as chained CTEs
    // — same grammar, same integer fixed-point arithmetic (// is
    // floor division; every quantity is positive so it matches
    // Spark's `div`), deg/contrib sums cast back from DuckDB's
    // HUGEINT to BIGINT at each step.
    "t40_domain_rank" ->
      """WITH d AS (SELECT
        |    'd' || regexp_replace(coalesce(source, ''), '[^a-z0-9]', '', 'g')
        |        || '.com' AS dom,
        |    'l' || regexp_replace(coalesce(lang, ''), '[^a-z0-9]', '', 'g')
        |        || '.org' AS hub,
        |    ((coalesce(CAST(doc_id AS BIGINT), 0) % 2) + 2) % 2 AS par
        |  FROM documents),
        | e0 AS (SELECT dom AS src, hub AS dst FROM d
        |        UNION ALL
        |        SELECT hub AS src, dom AS dst FROM d WHERE par = 0),
        | e AS (SELECT src, dst, count(*) AS wt FROM e0
        |       WHERE src <> dst GROUP BY 1, 2),
        | g AS (SELECT src, dst, wt,
        |        CAST(sum(wt) OVER (PARTITION BY src) AS BIGINT) AS deg FROM e),
        | nodes AS (SELECT src AS w FROM g UNION SELECT dst FROM g),
        | r0 AS (SELECT w, CAST(1000000000 AS BIGINT) AS rk FROM nodes),
        | c1 AS (SELECT g.dst, CAST(sum((r.rk * g.wt) // g.deg) AS BIGINT) AS s
        |        FROM g JOIN r0 r ON r.w = g.src GROUP BY g.dst),
        | r1 AS (SELECT n.w,
        |        CAST(150000000 + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS rk
        |        FROM nodes n LEFT JOIN c1 c ON c.dst = n.w),
        | c2 AS (SELECT g.dst, CAST(sum((r.rk * g.wt) // g.deg) AS BIGINT) AS s
        |        FROM g JOIN r1 r ON r.w = g.src GROUP BY g.dst),
        | r2 AS (SELECT n.w,
        |        CAST(150000000 + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS rk
        |        FROM nodes n LEFT JOIN c2 c ON c.dst = n.w),
        | c3 AS (SELECT g.dst, CAST(sum((r.rk * g.wt) // g.deg) AS BIGINT) AS s
        |        FROM g JOIN r2 r ON r.w = g.src GROUP BY g.dst),
        | r3 AS (SELECT n.w,
        |        CAST(150000000 + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS rk
        |        FROM nodes n LEFT JOIN c3 c ON c.dst = n.w),
        | c4 AS (SELECT g.dst, CAST(sum((r.rk * g.wt) // g.deg) AS BIGINT) AS s
        |        FROM g JOIN r3 r ON r.w = g.src GROUP BY g.dst),
        | r4 AS (SELECT n.w,
        |        CAST(150000000 + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS rk
        |        FROM nodes n LEFT JOIN c4 c ON c.dst = n.w)
        |SELECT w AS domain, rk AS rank_fp FROM r4 ORDER BY 1""".stripMargin,

    // t33: per-term greedy non-overlapping counts via the shared
    // replace() length formula — exactly the AC scan's semantics.
    "t33_blocklist" ->
      """WITH terms(term) AS (VALUES ('a'), ('agg'), ('batch batch'),
        |    ('scan'), ('sort merge'), ('zzz')),
        | d AS (SELECT coalesce(text, '') AS tx FROM documents),
        | x AS (SELECT term,
        |    (length(tx) - length(replace(tx, term, ''))) // length(term) AS cnt
        |  FROM d CROSS JOIN terms)
        |SELECT term, CAST(sum(cnt) AS BIGINT) AS n_occurrences,
        |  CAST(count(CASE WHEN cnt > 0 THEN 1 END) AS BIGINT) AS n_docs
        |FROM x GROUP BY term ORDER BY term""".stripMargin,

    "t30_linear_score" ->
      s"""WITH dn AS (SELECT doc_id, ${PortableHashSql.norm("text")} AS ntx FROM documents),
         | th AS (SELECT doc_id, list_transform(
         |          list_filter(split(ntx, ' '), tok -> tok <> ''), tok ->
         |          CAST(${PortableHashSql.tokenHash("tok")} % 4096 AS BIGINT)) AS js
         |        FROM dn),
         | sc AS (SELECT doc_id, len(js) AS n_toks,
         |          CAST(coalesce(list_aggregate(list_transform(js,
         |            j -> (j * 2654435761 + 97) % 2001 - 1000), 'sum'), 0) AS BIGINT) AS score
         |        FROM th)
         |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks, score,
         |  CASE WHEN n_toks = 0 THEN NULL
         |       ELSE round(CAST(score AS DOUBLE) / n_toks, 6) END AS score_mean
         |FROM sc ORDER BY doc_id""".stripMargin,

    // t31: full train+apply replay — per-class integer bucket counts
    // over the train split (the model), per-(doc, class) integer
    // overlap mass via the bucket join, ONE exact int/int division
    // per score, argmax by (score DESC, clabel). halfUp6 display
    // rounding (engine-stable, the t02 lesson). Null-label rows are
    // dropped identically; the skeleton cross join guarantees every
    // test doc scores every class (token-less docs predict the
    // alphabetically first class at score 0).
    "t31_trained_classifier" ->
      s"""WITH b0 AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id,
         |          lang AS label, ${PortableHashSql.norm("text")} AS ntx
         |        FROM documents WHERE lang IS NOT NULL),
         | tk AS (SELECT doc_id, label,
         |          CAST(${PortableHashSql.tokenHash("tok")} % 4096 AS BIGINT) AS j
         |        FROM (SELECT doc_id, label,
         |                unnest(list_filter(split(ntx, ' '), t -> t <> '')) AS tok
         |              FROM b0)),
         | tr AS (SELECT * FROM tk WHERE (doc_id % 5 + 5) % 5 <> 0),
         | cls AS (SELECT label AS clabel, CAST(count(*) AS BIGINT) AS t_c
         |         FROM tr GROUP BY label),
         | cnts AS (SELECT label AS clabel, j, CAST(count(*) AS BIGINT) AS c
         |          FROM tr GROUP BY label, j),
         | m0 AS (SELECT te.doc_id, cnts.clabel, CAST(sum(cnts.c) AS BIGINT) AS m
         |        FROM (SELECT doc_id, j FROM tk WHERE (doc_id % 5 + 5) % 5 = 0) te
         |        JOIN cnts ON cnts.j = te.j
         |        GROUP BY te.doc_id, cnts.clabel),
         | skel AS (SELECT DISTINCT b0.doc_id, b0.label, cls.clabel, cls.t_c
         |          FROM b0, cls WHERE (b0.doc_id % 5 + 5) % 5 = 0),
         | sc AS (SELECT skel.doc_id, skel.label, skel.clabel,
         |          CAST(coalesce(m0.m, 0) AS DOUBLE) / CAST(skel.t_c AS DOUBLE) AS score
         |        FROM skel LEFT JOIN m0
         |          ON m0.doc_id = skel.doc_id AND m0.clabel = skel.clabel),
         | rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id, label
         |          ORDER BY score DESC, clabel) AS rn FROM sc)
         |SELECT doc_id, label, clabel AS pred,
         |  floor(score * 1000000.0 + 0.5) / 1000000.0 AS score,
         |  CASE WHEN clabel = label THEN 1 ELSE 0 END AS hit
         |FROM rk WHERE rn = 1 ORDER BY doc_id, label""".stripMargin,

    // d28: per-line replay — 1-based subscripts here vs 0-based
    // posexplode there is immaterial (the index only totals the
    // first-occurrence order within each engine). row_number = 1 over
    // (hash ORDER BY doc_id, idx) ≡ Spark's min-struct window; the
    // reassembly string_agg keeps survivors in line order. Counts
    // cast to BIGINT (DuckDB sum is HUGEINT).
    "d28_line_dedup" ->
      s"""WITH base AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents),
         | pos AS (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS idx
         |         FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM base)),
         | lf AS (SELECT doc_id, idx, nline, md5(nline) AS h
         |        FROM (SELECT doc_id, idx, ${PortableHashSql.norm("ls[idx]")} AS nline FROM pos)
         |        WHERE nline <> ''),
         | mk AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn FROM lf),
         | pd AS (SELECT doc_id, count(*) AS n_lines,
         |          CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines,
         |          md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN nline END, chr(10) ORDER BY idx), ''))
         |            AS clean_md5
         |        FROM mk GROUP BY doc_id)
         |SELECT b.doc_id, COALESCE(n_lines, 0) AS n_lines,
         |  COALESCE(n_dup_lines, 0) AS n_dup_lines,
         |  COALESCE(clean_md5, md5('')) AS clean_md5
         |FROM base b LEFT JOIN pd USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // d35: the chunk grid (t10's stepped range), PortableHashSql.norm
    // per rebuilt paragraph, then d28's first-occurrence chain with a
    // blank-line joiner for the cleaned digest.
    "d35_paragraph_dedup" ->
      s"""WITH base0 AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents),
         | b2 AS (SELECT doc_id,
         |    string_split(replace(coalesce(text, ''), chr(10), ' '), ' ') AS toks
         |  FROM base0),
         | pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 25)) AS st FROM b2),
         | pr AS (SELECT doc_id, (st - 1) // 25 AS idx,
         |    ${PortableHashSql.norm("array_to_string(toks[st:st+24], ' ')")} AS npara
         |  FROM pos),
         | lf AS (SELECT doc_id, idx, npara, md5(npara) AS h FROM pr WHERE npara <> ''),
         | mk AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn FROM lf),
         | pd AS (SELECT doc_id, count(*) AS n_paras,
         |          CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras,
         |          md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN npara END,
         |            chr(10) || chr(10) ORDER BY idx), '')) AS clean_md5
         |        FROM mk GROUP BY doc_id)
         |SELECT b.doc_id, COALESCE(n_paras, 0) AS n_paras,
         |  COALESCE(n_dup_paras, 0) AS n_dup_paras,
         |  COALESCE(clean_md5, md5('')) AS clean_md5
         |FROM (SELECT DISTINCT doc_id FROM base0) b LEFT JOIN pd USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "d08_contamination" ->
      s"""WITH base AS (SELECT doc_id, source, string_split($normSql, ' ') AS toks
         |  FROM documents),
         | d AS (SELECT doc_id, source, list_distinct(${shingleSql(3)}) AS grams FROM base),
         | ex AS (SELECT doc_id, source, unnest(grams) AS g FROM d),
         | ev AS (SELECT DISTINCT g FROM ex WHERE source IN ('src0', 'src1')),
         | hits AS (SELECT e.doc_id, e.g FROM ex e JOIN ev ON e.g = ev.g
         |          WHERE e.source NOT IN ('src0', 'src1'))
         |SELECT doc_id, count(*) AS n_shared_grams
         |FROM hits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // d16: positional 5-gram duplication replayed on gram STRINGS
    // (hash vs string equality — the d11 convention), then the same
    // overlap-islands merge (break when the start gap exceeds n−1).
    "d16_dup_spans" ->
      s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         | pos AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 4)) AS p
         |         FROM base WHERE len(toks) >= 5),
         | gr AS (SELECT doc_id, p, array_to_string(toks[p:p+4], ' ') AS g FROM pos),
         | dup AS (SELECT g FROM gr GROUP BY g HAVING count(*) >= 2),
         | dp AS (SELECT doc_id, p FROM gr WHERE g IN (SELECT g FROM dup)),
         | br AS (SELECT doc_id, p, CASE WHEN
         |           p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 4
         |           THEN 0 ELSE 1 END AS brk
         |         FROM dp),
         | isl AS (SELECT doc_id, p,
         |           sum(brk) OVER (PARTITION BY doc_id ORDER BY p
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |         FROM br)
         |SELECT doc_id, min(p) AS span_start, max(p) + 4 AS span_end,
         |  max(p) + 4 - min(p) + 1 AS span_toks
         |FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin,

    // d19: d16's span CTE chain, then tokens re-emitted by positional
    // anti-range filter + ordered string_agg; docs whose every token
    // is cut (or that never had spans) come back via the LEFT join.
    "d19_span_cut" ->
      s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         | pos AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 4)) AS p
         |         FROM base WHERE len(toks) >= 5),
         | gr AS (SELECT doc_id, p, array_to_string(toks[p:p+4], ' ') AS g FROM pos),
         | dup AS (SELECT g FROM gr GROUP BY g HAVING count(*) >= 2),
         | dp AS (SELECT doc_id, p FROM gr WHERE g IN (SELECT g FROM dup)),
         | br AS (SELECT doc_id, p, CASE WHEN
         |           p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 4
         |           THEN 0 ELSE 1 END AS brk
         |         FROM dp),
         | isl AS (SELECT doc_id, p,
         |           sum(brk) OVER (PARTITION BY doc_id ORDER BY p
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |         FROM br),
         | spans AS (SELECT doc_id, min(p) AS s, max(p) + 4 AS e
         |           FROM isl GROUP BY doc_id, grp),
         | tkn AS (SELECT doc_id, unnest(toks) AS tok,
         |           unnest(generate_series(1, len(toks))) AS tp FROM base),
         | kept AS (SELECT t.doc_id, t.tok, t.tp FROM tkn t
         |          WHERE NOT EXISTS (SELECT 1 FROM spans sp
         |            WHERE sp.doc_id = t.doc_id AND t.tp >= sp.s AND t.tp <= sp.e)),
         | ag AS (SELECT doc_id, count(*) AS n_kept,
         |          string_agg(tok, ' ' ORDER BY tp) AS cut_text
         |        FROM kept GROUP BY doc_id)
         |SELECT b.doc_id, CAST(len(b.toks) AS BIGINT) AS n_tokens,
         |  CAST(len(b.toks) - coalesce(ag.n_kept, 0) AS BIGINT) AS n_cut,
         |  coalesce(ag.cut_text, '') AS cut_text
         |FROM base b LEFT JOIN ag USING (doc_id) ORDER BY b.doc_id""".stripMargin,

    // d17: the d03 portable-hash LSH pipeline with eval × corpus
    // candidate generation (no hot-bucket cap — the eval side is
    // benchmark-sized) and a per-corpus-doc verdict.
    "d17_fuzzy_decontam" ->
      s"""WITH dn AS (SELECT doc_id, source IN ('src0', 'src1') AS is_eval,
         |       ${PortableHashSql.norm("text")} AS ntx FROM documents),
         | d AS (SELECT doc_id, is_eval, list_distinct(split(ntx, ' ')) AS toks FROM dn),
         | tk AS (SELECT doc_id, unnest(toks) AS tok FROM d),
         | th AS (SELECT doc_id, ${PortableHashSql.tokenHash("tok")} AS h FROM tk),
         | mg AS (SELECT doc_id, k, min(${PortableHashSql.toSigned(PortableHashSql.permuteSql("h"))}) AS m
         |        FROM th, ${PortableHashSql.minhashCoeffValues(64)}
         |        GROUP BY doc_id, k),
         | msl AS (SELECT doc_id, k // 8 AS band,
         |           list(${PortableHashSql.toUnsigned("m")} ORDER BY k) AS ms
         |         FROM mg GROUP BY doc_id, k // 8),
         | mbk AS (SELECT doc_id, band,
         |           ${PortableHashSql.toSigned(
                        PortableHashSql.mixHashList("list_prepend(CAST(band AS HUGEINT), ms)"))} AS bucket
         |         FROM msl),
         | ebk AS (SELECT mbk.doc_id, band, bucket FROM mbk
         |         JOIN d USING (doc_id) WHERE d.is_eval),
         | cbk AS (SELECT mbk.doc_id, band, bucket FROM mbk
         |         JOIN d USING (doc_id) WHERE NOT d.is_eval),
         | cand AS (SELECT DISTINCT c.doc_id AS doc_id, e.doc_id AS eval_id
         |          FROM cbk c JOIN ebk e ON c.band = e.band AND c.bucket = e.bucket),
         | v AS (SELECT cand.doc_id, cand.eval_id,
         |         len(list_intersect(da.toks, db.toks)) AS inter,
         |         len(da.toks) AS na, len(db.toks) AS nb
         |       FROM cand
         |       JOIN d da ON da.doc_id = cand.doc_id
         |       JOIN d db ON db.doc_id = cand.eval_id),
         | vv AS (SELECT doc_id, eval_id,
         |          CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jac
         |        FROM v)
         |SELECT doc_id, count(*) AS n_eval_matches, round(max(jac), 3) AS best_jaccard
         |FROM vv WHERE jac >= 0.9 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // t23: BM25 with the EXACT same double-op association as the
    // Spark side (idf * (tf-part / denom)); 6-dp DECIMAL term sums,
    // half-up integer-space 4-dp final rounding (see t17).
    "t23_bm25" ->
      s"""WITH tk AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         | dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM tk),
         | st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
         | tf AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
         |        FROM (SELECT doc_id, unnest(toks) AS w FROM tk)
         |        WHERE w IN ('dup', 'spark', 'merge') GROUP BY doc_id, w),
         | df AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w),
         | sc AS (SELECT tf.doc_id,
         |          CAST(round(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) *
         |            ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))), 6)
         |            AS DECIMAL(18,6)) AS term
         |        FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN st),
         | ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms, sum(term) AS s
         |        FROM sc GROUP BY doc_id)
         |SELECT doc_id, n_terms,
         |  CAST((CAST(s * 1000000 AS BIGINT) + 50) // 100 AS DOUBLE) / 10000.0 AS bm25
         |FROM ag ORDER BY doc_id""".stripMargin,

    // t24: the 5 TextRank rounds replayed as chained CTEs — all
    // integer math (floor division), bit-identical by construction.
    "t24_textrank" ->
      s"""WITH tk AS (SELECT string_split($normSql, ' ') AS l FROM documents),
         | bg AS (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z FROM tk),
         | bi AS (SELECT z[1] AS w1, z[2] AS w2, count(*) AS cnt FROM bg
         |        WHERE z[1] <> z[2] GROUP BY 1, 2),
         | e0 AS (SELECT w1 AS src, w2 AS dst, cnt FROM bi
         |        UNION ALL SELECT w2, w1, cnt FROM bi),
         | e AS (SELECT src, dst, sum(cnt) AS wt FROM e0 GROUP BY 1, 2),
         | deg AS (SELECT src, sum(wt) AS deg FROM e GROUP BY 1),
         | ed AS (SELECT e.src, e.dst, e.wt, deg.deg FROM e JOIN deg USING (src)),
         | r0 AS (SELECT src AS w, CAST(1000000000 AS BIGINT) AS rank FROM deg),
         |${(1 to 5).map(i =>
             s""" r$i AS (SELECT ed.dst AS w,
                |   150000000 + (85 * sum((r${i - 1}.rank * ed.wt) // ed.deg)) // 100 AS rank
                |   FROM ed JOIN r${i - 1} ON ed.src = r${i - 1}.w GROUP BY ed.dst)""".stripMargin)
            .mkString(",\n")}
         |SELECT w, CAST(rank AS BIGINT) AS rank FROM r5
         |ORDER BY rank DESC, w""".stripMargin,

    // t25: bigram first-seen replay on gram STRINGS (hash-vs-string
    // equality, the d11 convention).
    "t25_vocab_growth" ->
      s"""WITH tk AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |            string_split($normSql, ' ') AS l FROM documents),
         | bg AS (SELECT doc_id, z[1] || ' ' || z[2] AS g FROM
         |   (SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z FROM tk)),
         | fs AS (SELECT g, min(doc_id) AS first_seen FROM bg GROUP BY g),
         | b AS (SELECT (first_seen // 50 + 1) * 50 AS bucket_end, count(*) AS new_grams
         |       FROM fs GROUP BY 1)
         |SELECT bucket_end, new_grams,
         |  CAST(sum(new_grams) OVER (ORDER BY bucket_end
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
         |FROM b ORDER BY bucket_end""".stripMargin,

    // t26: the same phrase learning (deterministic tie-break) and the
    // same islands+parity factoring of the greedy fuse.
    "t26_phrase_fuse" ->
      s"""WITH tk AS (SELECT doc_id, string_split($normSql, ' ') AS l FROM documents),
         | bg AS (SELECT doc_id, p, l[p] AS w1, l[p + 1] AS w2
         |   FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS p
         |         FROM tk WHERE len(l) >= 2)),
         | ph AS (SELECT w1, w2 FROM
         |   (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY 1, 2)
         |   WHERE cnt >= 10 ORDER BY cnt DESC, w1, w2 LIMIT 5),
         | cand AS (SELECT doc_id, p,
         |     p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
         |   FROM bg JOIN ph USING (w1, w2)),
         | ap AS (SELECT doc_id,
         |     (p - min(p) OVER (PARTITION BY doc_id, grp)) % 2 = 0 AS applied
         |   FROM cand),
         | f AS (SELECT doc_id, sum(CASE WHEN applied THEN 1 ELSE 0 END) AS n_fused
         |   FROM ap GROUP BY doc_id)
         |SELECT tk.doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(f.n_fused, 0) AS BIGINT) AS n_fused,
         |  CAST(len(l) - coalesce(f.n_fused, 0) AS BIGINT) AS n_after
         |FROM tk LEFT JOIN f ON tk.doc_id = f.doc_id
         |ORDER BY tk.doc_id""".stripMargin,

    // d21: d03's signature/band replay without the verification
    // threshold or size prune (calibration wants EVERY candidate);
    // matches counted per permutation index, est half-up 4dp in
    // integer space, exact Jaccard with d03's 3-dp rounding.
    "d21_minhash_calib" ->
      s"""WITH dn AS (SELECT doc_id, ${PortableHashSql.norm("text")} AS ntx FROM documents),
         | d AS (SELECT doc_id, list_distinct(split(ntx, ' ')) AS toks FROM dn),
         | tk AS (SELECT doc_id, unnest(toks) AS tok FROM d),
         | th AS (SELECT doc_id, ${PortableHashSql.tokenHash("tok")} AS h FROM tk),
         | mg AS (SELECT doc_id, k, min(${PortableHashSql.toSigned(PortableHashSql.permuteSql("h"))}) AS m
         |        FROM th, ${PortableHashSql.minhashCoeffValues(64)}
         |        GROUP BY doc_id, k),
         | msl AS (SELECT doc_id, k // 8 AS band,
         |           list(${PortableHashSql.toUnsigned("m")} ORDER BY k) AS ms
         |         FROM mg GROUP BY doc_id, k // 8),
         | mbk AS (SELECT doc_id, band,
         |           ${PortableHashSql.toSigned(
                        PortableHashSql.mixHashList("list_prepend(CAST(band AS HUGEINT), ms)"))} AS bucket
         |         FROM msl),
         | keep AS (SELECT band, bucket FROM mbk GROUP BY band, bucket HAVING count(*) <= 500),
         | bk AS (SELECT mbk.* FROM mbk JOIN keep USING (band, bucket)),
         | cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |          FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |            AND a.doc_id < b.doc_id),
         | mm AS (SELECT c.id_a, c.id_b,
         |          sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS matches
         |        FROM cand c JOIN mg a ON a.doc_id = c.id_a
         |                    JOIN mg b ON b.doc_id = c.id_b AND b.k = a.k
         |        GROUP BY 1, 2),
         | v AS (SELECT id_a, id_b,
         |         len(list_intersect(da.toks, db.toks)) AS inter,
         |         len(da.toks) AS na, len(db.toks) AS nb
         |       FROM cand
         |       JOIN d da ON da.doc_id = id_a
         |       JOIN d db ON db.doc_id = id_b)
         |SELECT m.id_a, m.id_b, CAST(matches AS BIGINT) AS matches,
         |  CAST((20000*matches + 64) // 128 AS DOUBLE)/10000 AS est,
         |  CAST(inter AS BIGINT) AS inter,
         |  CAST(na + nb - inter AS BIGINT) AS uni,
         |  round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 3) AS jaccard
         |FROM mm m JOIN v USING (id_a, id_b)
         |ORDER BY id_a, id_b""".stripMargin,

    // d22: the deterministic snapshot-B perturbation stated literally
    // (pmod via ((x % k) + k) % k), both sides hashed with the
    // d01-proven md5(norm) content key, full-outer joined on id.
    "d22_snapshot_delta" ->
      s"""WITH a AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents),
         | b AS (
         |   SELECT doc_id,
         |     CASE WHEN ((doc_id % 7) + 7) % 7 = 2 THEN text || ' rev2'
         |          ELSE text END AS text
         |   FROM a WHERE ((doc_id % 11) + 11) % 11 <> 3
         |   UNION ALL
         |   SELECT doc_id + 10000000, 'fresh crawl ' || text
         |   FROM a WHERE ((doc_id % 13) + 13) % 13 = 5),
         | ah AS (SELECT doc_id, md5(${PortableHashSql.norm("text")}) AS old_hash FROM a),
         | bh AS (SELECT doc_id, md5(${PortableHashSql.norm("text")}) AS new_hash FROM b),
         | j AS (SELECT COALESCE(ah.doc_id, bh.doc_id) AS doc_id, old_hash, new_hash
         |       FROM ah FULL OUTER JOIN bh ON ah.doc_id = bh.doc_id)
         |SELECT doc_id,
         |  CASE WHEN old_hash IS NULL THEN 'added'
         |       WHEN new_hash IS NULL THEN 'removed'
         |       WHEN old_hash = new_hash THEN 'unchanged'
         |       ELSE 'changed' END AS status,
         |  old_hash, new_hash
         |FROM j ORDER BY doc_id""".stripMargin,

    // d23: d07's cluster replay (same pairs + recursive min-label
    // fixpoint), representative = COALESCE(cluster, doc_id), split by
    // t06's fmix64 bucket of the representative.
    "d23_cluster_split" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id AS id, lang, CAST(n_chars AS BIGINT) // 100 AS lb,
         |    list_distinct(string_split($normSql, ' ')) AS toks
         |  FROM documents),
         | pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b
         |  FROM d a JOIN d b
         |    ON a.lang = b.lang AND a.lb = b.lb AND len(a.toks) = len(b.toks)
         |    AND a.id < b.id
         |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
         |        CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         |        >= 0.9),
         | edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         | reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
         | cc AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         | lab AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |     CAST(COALESCE(cc.cluster_id, doc_id) AS BIGINT) AS rep_id
         |   FROM documents LEFT JOIN cc ON documents.doc_id = cc.id),
         | h AS (SELECT doc_id, rep_id,
         |     ${PortableHashSql.toSigned(PortableHashSql.fmix(PortableHashSql.toUnsigned("rep_id")))} AS hs
         |   FROM lab),
         | bkt AS (SELECT doc_id, rep_id, ((hs % 100) + 100) % 100 AS bucket FROM h)
         |SELECT doc_id, rep_id,
         |  CASE WHEN bucket < 90 THEN 'train'
         |       WHEN bucket < 95 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM bkt ORDER BY doc_id""".stripMargin,

    // d25: d22's delta CTEs (status restricted to added/changed) →
    // t02's quality chain over the DELTA-sized work set → d24's
    // window gate → the per-source ingest report; kept-quality summed
    // as half-up micro BIGINTs so the sum is order-independent.
    "d25_incremental_curation" ->
      s"""WITH a AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source, text FROM documents),
         | b AS (
         |   SELECT doc_id, source,
         |     CASE WHEN ((doc_id % 7) + 7) % 7 = 2 THEN text || ' rev2'
         |          ELSE text END AS text
         |   FROM a WHERE ((doc_id % 11) + 11) % 11 <> 3
         |   UNION ALL
         |   SELECT doc_id + 10000000, source, 'fresh crawl ' || text
         |   FROM a WHERE ((doc_id % 13) + 13) % 13 = 5),
         | ah AS (SELECT doc_id, md5(${PortableHashSql.norm("text")}) AS old_hash FROM a),
         | bh AS (SELECT doc_id, md5(${PortableHashSql.norm("text")}) AS new_hash FROM b),
         | delta AS (SELECT DISTINCT COALESCE(ah.doc_id, bh.doc_id) AS doc_id
         |   FROM ah FULL OUTER JOIN bh ON ah.doc_id = bh.doc_id
         |   WHERE (ah.old_hash IS NULL AND bh.new_hash IS NOT NULL)
         |      OR (ah.old_hash IS NOT NULL AND bh.new_hash IS NOT NULL
         |          AND ah.old_hash <> bh.new_hash)),
         | work AS (SELECT b.doc_id, b.source, b.text FROM b JOIN delta USING (doc_id)),
         | q AS (
         |  SELECT doc_id, source,
         |    ${hup4Sql(
               s"""least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4 +
         |          ${safeDivSql("allstop", "n_tokens")} * 0.3 +
         |          ${safeDivSql("alpha", "n_chars")} * 0.3""")} AS quality
         |  FROM (
         |    SELECT doc_id, source,
         |      length(norm) AS n_chars, len(toks) AS n_tokens,
         |      length(regexp_replace(norm, '[^a-z]', '', 'g')) AS alpha,
         |      ${stopFilterSql("toks", TextStats.stopwords.flatMap(_._2))} AS allstop
         |    FROM (SELECT doc_id, source, $normSql AS norm,
         |            string_split($normSql, ' ') AS toks
         |          FROM work))),
         | r AS (SELECT source, doc_id, quality,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY quality DESC, doc_id) AS BIGINT) AS rk,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_group
         |  FROM q),
         | kept AS (SELECT * FROM r WHERE rk * 10 <= n_group * 3 + 9),
         | ing AS (SELECT source, count(*) AS n_ingested FROM work GROUP BY source),
         | ka AS (SELECT source, count(*) AS n_kept,
         |    CAST(sum(CAST(floor(quality * 10000.0 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS kept_quality_micro
         |  FROM kept GROUP BY source)
         |SELECT source, n_ingested,
         |  COALESCE(n_kept, 0) AS n_kept,
         |  COALESCE(kept_quality_micro, 0) AS kept_quality_micro
         |FROM ing LEFT JOIN ka USING (source)
         |ORDER BY source""".stripMargin,

    // d26: d11's shared-gram candidate replay + list_intersect
    // containment on distinct token sets, both orientations, integer
    // cross-multiplied threshold.
    "d26_containment" ->
      s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks
         |  FROM documents),
         | d AS (SELECT doc_id, list_distinct(${shingleSql(4)}) AS grams,
         |    list_distinct(toks) AS tk FROM base),
         | ex AS (SELECT doc_id, unnest(grams) AS g FROM d),
         | cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |   FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id),
         | j AS (SELECT id_a, id_b,
         |    len(list_intersect(da.tk, db.tk)) AS inter,
         |    len(da.tk) AS na, len(db.tk) AS nb
         |   FROM cand
         |   JOIN d da ON da.doc_id = id_a
         |   JOIN d db ON db.doc_id = id_b),
         | dird AS (SELECT id_a AS contained_id, id_b AS container_id, inter, na AS n_src FROM j
         |   UNION ALL
         |   SELECT id_b, id_a, inter, nb FROM j)
         |SELECT CAST(contained_id AS BIGINT) AS contained_id,
         |  CAST(container_id AS BIGINT) AS container_id,
         |  CAST(inter AS BIGINT) AS inter, CAST(n_src AS BIGINT) AS n_src,
         |  round(CAST(inter AS DOUBLE) / CAST(n_src AS DOUBLE), 3) AS containment
         |FROM dird WHERE inter * 10 >= n_src * 9
         |ORDER BY contained_id, container_id""".stripMargin,

    // d24: t02's exact quality chain + one ranked window per source;
    // the ⌈0.3n⌉ keep is the integer cross-multiplication
    // rk·10 ≤ n·3 + 9 on both engines.
    "d24_quality_topp" ->
      s"""WITH q AS (
         |  SELECT doc_id, source,
         |    ${hup4Sql(
               s"""least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4 +
         |          ${safeDivSql("allstop", "n_tokens")} * 0.3 +
         |          ${safeDivSql("alpha", "n_chars")} * 0.3""")} AS quality
         |  FROM (
         |    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
         |      length(norm) AS n_chars, len(toks) AS n_tokens,
         |      length(regexp_replace(norm, '[^a-z]', '', 'g')) AS alpha,
         |      ${stopFilterSql("toks", TextStats.stopwords.flatMap(_._2))} AS allstop
         |    FROM (SELECT doc_id, source, $normSql AS norm,
         |            string_split($normSql, ' ') AS toks
         |          FROM documents))),
         | r AS (SELECT source, doc_id, quality,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY quality DESC, doc_id) AS BIGINT) AS rk,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_group
         |  FROM q)
         |SELECT source, rk, doc_id, quality, n_group FROM r
         |WHERE rk * 10 <= n_group * 3 + 9
         |ORDER BY source, rk""".stripMargin,

    // t42: the same rank order, the same 10⁻⁶ ln grid, the same
    // integer regression sums, f21's half-up HUGEINT division.
    "t42_zipf_slope" ->
      s"""WITH tk AS (SELECT lang, tok, count(*) AS cnt
         |  FROM (SELECT coalesce(lang, '?') AS lang,
         |      unnest(list_filter(string_split($normSql, ' '), t -> t <> '')) AS tok
         |    FROM documents)
         |  GROUP BY 1, 2),
         | rx AS (SELECT lang, tok, cnt, row_number() OVER (PARTITION BY lang
         |    ORDER BY cnt DESC, tok) AS rk FROM tk),
         | q AS (SELECT lang,
         |    CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS xi,
         |    CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS yi
         |   FROM rx WHERE rk <= 100),
         | ag AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_ranks,
         |    CAST(sum(xi) AS HUGEINT) AS sx, CAST(sum(yi) AS HUGEINT) AS sy,
         |    CAST(sum(xi * yi) AS HUGEINT) AS sxy,
         |    CAST(sum(xi * xi) AS HUGEINT) AS sxx
         |   FROM q GROUP BY lang)
         |SELECT lang, n_ranks,
         |  CASE WHEN n_ranks * sxx - sx * sx > 0 THEN
         |    CAST((2000000 * (sx * sy - n_ranks * sxy)
         |          + (n_ranks * sxx - sx * sx))
         |      // (2 * (n_ranks * sxx - sx * sx)) AS BIGINT) END AS zipf_micro
         |FROM ag ORDER BY lang""".stripMargin,

    // d40: the frozen model retrained from the train split, the
    // held-out batch rescored — unseen buckets contribute 0 terms
    // but full per-token constants (LEFT join), kept = sign(uw).
    "d40_dsir_incremental" ->
      s"""WITH b0 AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id,
         |    ${PortableHashSql.norm("text")} AS ntx FROM documents
         |  WHERE (CAST(doc_id AS BIGINT) % 3 + 3) % 3 <> 2),
         | tk AS (SELECT doc_id,
         |    CAST(${PortableHashSql.tokenHash("tok")} % 4096 AS BIGINT) AS j
         |  FROM (SELECT doc_id,
         |      unnest(list_filter(split(ntx, ' '), t -> t <> '')) AS tok
         |    FROM b0)),
         | tg AS (SELECT * FROM tk WHERE (doc_id % 7 + 7) % 7 = 0),
         | rw AS (SELECT * FROM tk WHERE (doc_id % 7 + 7) % 7 <> 0),
         | tc AS (SELECT j, count(*) AS t_c FROM tg GROUP BY j),
         | rc AS (SELECT j, count(*) AS r_c FROM rw GROUP BY j),
         | grid AS (SELECT coalesce(tc.j, rc.j) AS j,
         |    CAST(round(ln(CAST(coalesce(t_c, 0) + 1 AS DOUBLE)) -
         |               ln(CAST(coalesce(r_c, 0) + 1 AS DOUBLE)), 6)
         |      AS DECIMAL(18,6)) AS term
         |  FROM tc FULL JOIN rc ON tc.j = rc.j),
         | ct AS (SELECT CAST(round(
         |      ln(CAST((SELECT count(*) FROM rw) + 4096 AS DOUBLE)) -
         |      ln(CAST((SELECT count(*) FROM tg) + 4096 AS DOUBLE)), 6)
         |    AS DECIMAL(18,6)) AS c),
         | nb AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id,
         |    ${PortableHashSql.norm("text")} AS ntx FROM documents
         |  WHERE (CAST(doc_id AS BIGINT) % 3 + 3) % 3 = 2),
         | ntk AS (SELECT doc_id,
         |    CAST(${PortableHashSql.tokenHash("tok")} % 4096 AS BIGINT) AS j
         |  FROM (SELECT doc_id,
         |      unnest(list_filter(split(ntx, ' '), t -> t <> '')) AS tok
         |    FROM nb)),
         | sc AS (SELECT ntk.doc_id, count(*) AS n_tok,
         |    sum(coalesce(grid.term, CAST(0 AS DECIMAL(18,6)))) AS s
         |  FROM ntk LEFT JOIN grid ON ntk.j = grid.j GROUP BY ntk.doc_id),
         | wg AS (SELECT nd.doc_id,
         |    CAST(coalesce(sc.n_tok, 0) AS BIGINT) AS n_tok,
         |    CAST((coalesce(sc.s, CAST(0 AS DECIMAL(18,6))) +
         |          coalesce(sc.n_tok, 0) * ct.c) * 1000000 AS BIGINT) AS uw
         |  FROM (SELECT DISTINCT doc_id FROM nb) nd
         |  LEFT JOIN sc ON sc.doc_id = nd.doc_id, ct)
         |SELECT doc_id, n_tok, uw,
         |  CASE WHEN uw > 0 THEN 1 ELSE 0 END AS kept
         |FROM wg ORDER BY doc_id""".stripMargin,

    // t41: one-pass replay — quality (d24's formula) and the Gopher
    // keep product (t27's rules) from the SAME row, then midrank
    // AUC in doubled-rank integer space, half-up micro units.
    "t41_quality_auc" ->
      s"""WITH raw AS (SELECT source, text, $normSql AS norm,
         |    string_split($normSql, ' ') AS toks,
         |    string_split(replace(text, chr(13), ''), chr(10)) AS lines
         |  FROM documents),
         | mid AS (SELECT source,
         |    ${hup4Sql(
               s"""least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) * 0.4 +
         |        ${safeDivSql(
                    stopFilterSql("toks", TextStats.stopwords.flatMap(_._2)),
                    "len(toks)")} * 0.3 +
         |        ${safeDivSql(
                    "length(regexp_replace(norm, '[^a-z]', '', 'g'))",
                    "length(norm)")} * 0.3""")} AS score,
         |    len(toks) AS n_words,
         |    length(norm) - (len(toks) - 1) AS sum_len,
         |    len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS alpha_words,
         |    len(lines) AS n_lines,
         |    len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS bullet_lines,
         |    len(list_filter(lines, l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$$'))) AS ellipsis_lines,
         |    (length(text) - length(replace(text, '#', '')))
         |      + (length(text) - length(replace(text, '...', ''))) // 3 AS symbols,
         |    len(list_filter(list_distinct(toks),
         |      t -> t IN (${TextStats.gopherStopwords.map(w => s"'$w'").mkString(", ")}))) AS stop_hits
         |  FROM raw),
         | lab AS (SELECT source, score,
         |    (CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END) *
         |    (CASE WHEN 3*n_words <= sum_len AND sum_len <= 10*n_words THEN 1 ELSE 0 END) *
         |    (CASE WHEN 10*symbols <= n_words THEN 1 ELSE 0 END) *
         |    (CASE WHEN 10*bullet_lines <= 9*n_lines THEN 1 ELSE 0 END) *
         |    (CASE WHEN 10*ellipsis_lines <= 3*n_lines THEN 1 ELSE 0 END) *
         |    (CASE WHEN 5*alpha_words >= 4*n_words THEN 1 ELSE 0 END) *
         |    (CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END) AS label
         |  FROM mid),
         | rk AS (SELECT source, label,
         |    2 * rank() OVER (PARTITION BY source ORDER BY score)
         |      + count(*) OVER (PARTITION BY source, score) - 1 AS r2
         |  FROM lab),
         | ag AS (SELECT source,
         |    CAST(sum(CASE WHEN label = 1 THEN r2 ELSE 0 END) AS BIGINT) AS sum_r2_pos,
         |    CAST(sum(label) AS BIGINT) AS n_pos,
         |    CAST(count(*) AS BIGINT) AS n_total
         |  FROM rk GROUP BY source)
         |SELECT source, n_pos, n_total - n_pos AS n_neg,
         |  CASE WHEN n_pos > 0 AND n_total > n_pos THEN
         |    CAST(((sum_r2_pos - n_pos * (n_pos + 1)) * 2000000
         |      + 2 * n_pos * (n_total - n_pos))
         |      // (4 * n_pos * (n_total - n_pos)) AS BIGINT)
         |  END AS auc_micro
         |FROM ag ORDER BY source""".stripMargin,

    // d39: the full DSIR replay — portable token hash mod 4096,
    // Laplace per-bucket ln terms at 6 dp, the per-token constant
    // from the two total masses, exact integer micro-nat weights,
    // d24's rank/boundary formula per source.
    "d39_dsir_select" ->
      s"""WITH b0 AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id, source,
         |    ${PortableHashSql.norm("text")} AS ntx FROM documents),
         | tk AS (SELECT doc_id, source,
         |    CAST(${PortableHashSql.tokenHash("tok")} % 4096 AS BIGINT) AS j
         |  FROM (SELECT doc_id, source,
         |      unnest(list_filter(split(ntx, ' '), t -> t <> '')) AS tok
         |    FROM b0)),
         | tg AS (SELECT * FROM tk WHERE (doc_id % 7 + 7) % 7 = 0),
         | rw AS (SELECT * FROM tk WHERE (doc_id % 7 + 7) % 7 <> 0),
         | tc AS (SELECT j, count(*) AS t_c FROM tg GROUP BY j),
         | rc AS (SELECT j, count(*) AS r_c FROM rw GROUP BY j),
         | grid AS (SELECT coalesce(tc.j, rc.j) AS j,
         |    CAST(round(ln(CAST(coalesce(t_c, 0) + 1 AS DOUBLE)) -
         |               ln(CAST(coalesce(r_c, 0) + 1 AS DOUBLE)), 6)
         |      AS DECIMAL(18,6)) AS term
         |  FROM tc FULL JOIN rc ON tc.j = rc.j),
         | ct AS (SELECT CAST(round(
         |      ln(CAST((SELECT count(*) FROM rw) + 4096 AS DOUBLE)) -
         |      ln(CAST((SELECT count(*) FROM tg) + 4096 AS DOUBLE)), 6)
         |    AS DECIMAL(18,6)) AS c),
         | sc AS (SELECT rw.doc_id, rw.source, count(*) AS n_tok,
         |    sum(term) AS s
         |  FROM rw JOIN grid USING (j) GROUP BY rw.doc_id, rw.source),
         | wg AS (SELECT rd.doc_id, rd.source,
         |    CAST(coalesce(sc.n_tok, 0) AS BIGINT) AS n_tok,
         |    CAST((coalesce(sc.s, CAST(0 AS DECIMAL(18,6))) +
         |          coalesce(sc.n_tok, 0) * ct.c) * 1000000 AS BIGINT) AS uw
         |  FROM (SELECT DISTINCT doc_id, source FROM b0
         |        WHERE (doc_id % 7 + 7) % 7 <> 0) rd
         |  LEFT JOIN sc ON sc.doc_id = rd.doc_id AND sc.source = rd.source, ct),
         | r AS (SELECT source, doc_id, n_tok, uw,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY uw DESC, doc_id) AS BIGINT) AS rk,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_group
         |  FROM wg)
         |SELECT source, rk, doc_id, n_tok, uw, n_group FROM r
         |WHERE rk * 4 <= n_group + 3
         |ORDER BY source, rk""".stripMargin,

    // d20: same top-53-bit fmix64 order key (HUGEINT shift ≡ Spark's
    // shiftrightunsigned on the signed BIGINT) + id tie-break.
    "d20_source_cap" ->
      s"""WITH h AS (SELECT doc_id, source,
         |    CAST(((${PortableHashSql.fmix(PortableHashSql.toUnsigned("doc_id"))}) >> 11) AS BIGINT) AS hkey
         |  FROM documents),
         | r AS (SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source ORDER BY hkey, doc_id) AS rk
         |  FROM h)
         |SELECT source, rk, doc_id FROM r WHERE rk <= 10
         |ORDER BY source, rk""".stripMargin,

    // t27: same integer cross-multiplied thresholds; ratios as
    // floor((20000a+b)/(2b))/10000 — `//` here, floor(double) on the
    // Spark side (exact: numerator < 2^35, see gopherColumns note).
    "t27_gopher" ->
      s"""SELECT doc_id, n_words,
         |  CAST((20000*sum_len + n_words) // (2*n_words) AS DOUBLE)/10000 AS mean_word_len,
         |  CAST((20000*symbols + n_words) // (2*n_words) AS DOUBLE)/10000 AS symbol_ratio,
         |  CAST((20000*bullet_lines + n_lines) // (2*n_lines) AS DOUBLE)/10000 AS bullet_frac,
         |  CAST((20000*ellipsis_lines + n_lines) // (2*n_lines) AS DOUBLE)/10000 AS ellipsis_frac,
         |  CAST((20000*alpha_words + n_words) // (2*n_words) AS DOUBLE)/10000 AS alpha_word_frac,
         |  stop_hits, r_len, r_wordlen, r_symbol, r_bullet, r_ellipsis,
         |  r_alpha, r_stop,
         |  r_len*r_wordlen*r_symbol*r_bullet*r_ellipsis*r_alpha*r_stop AS keep
         |FROM (
         |  SELECT *,
         |    CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS r_len,
         |    CASE WHEN 3*n_words <= sum_len AND sum_len <= 10*n_words THEN 1 ELSE 0 END AS r_wordlen,
         |    CASE WHEN 10*symbols <= n_words THEN 1 ELSE 0 END AS r_symbol,
         |    CASE WHEN 10*bullet_lines <= 9*n_lines THEN 1 ELSE 0 END AS r_bullet,
         |    CASE WHEN 10*ellipsis_lines <= 3*n_lines THEN 1 ELSE 0 END AS r_ellipsis,
         |    CASE WHEN 5*alpha_words >= 4*n_words THEN 1 ELSE 0 END AS r_alpha,
         |    CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS r_stop
         |  FROM (
         |    SELECT doc_id,
         |      len(toks) AS n_words,
         |      length(norm) - (len(toks) - 1) AS sum_len,
         |      len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS alpha_words,
         |      len(lines) AS n_lines,
         |      len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS bullet_lines,
         |      len(list_filter(lines, l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$$'))) AS ellipsis_lines,
         |      (length(text) - length(replace(text, '#', '')))
         |        + (length(text) - length(replace(text, '...', ''))) // 3 AS symbols,
         |      len(list_filter(list_distinct(toks),
         |        t -> t IN (${TextStats.gopherStopwords.map(w => s"'$w'").mkString(", ")}))) AS stop_hits
         |    FROM (SELECT doc_id, text, $normSql AS norm,
         |            string_split($normSql, ' ') AS toks,
         |            string_split(replace(text, chr(13), ''), chr(10)) AS lines
         |          FROM documents)
         |  )
         |) ORDER BY doc_id""".stripMargin,

    // t28: the pair set replayed as a gram-keyed self-join (exact for
    // the oracle; the Spark side's bounded source-set expansion is
    // the scale formulation); same half-up integer-space 4-dp
    // Jaccard.
    "t28_source_overlap" ->
      s"""WITH base AS (SELECT doc_id, source, string_split($normSql, ' ') AS toks
         |   FROM documents),
         | g AS (SELECT DISTINCT source, gm FROM
         |   (SELECT source, unnest(list_distinct(${shingleSql(3)})) AS gm FROM base)),
         | ns AS (SELECT source, count(*) AS n FROM g GROUP BY source),
         | pr AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
         |   FROM g a JOIN g b ON a.gm = b.gm AND a.source < b.source
         |   GROUP BY 1, 2)
         |SELECT src_a, src_b, inter, na.n AS n_a, nb.n AS n_b,
         |  CAST((20000*inter + (na.n + nb.n - inter)) // (2*(na.n + nb.n - inter)) AS DOUBLE)/10000 AS jaccard
         |FROM pr JOIN ns na ON pr.src_a = na.source
         |        JOIN ns nb ON pr.src_b = nb.source
         |ORDER BY src_a, src_b""".stripMargin,

    // d18: quantile_cont ↔ Spark percentile (the f12-proven pairing);
    // identical double-op order for mean/z.
    "d18_source_profile" ->
      s"""WITH per AS (SELECT source,
         |    len(string_split($normSql, ' ')) AS n_tok, md5($normSql) AS h
         |  FROM documents),
         | src AS (SELECT source, count(*) AS n_docs, sum(n_tok) AS n_tokens,
         |    count(DISTINCT h) AS n_distinct FROM per GROUP BY source),
         | m AS (SELECT source, n_docs, n_tokens, n_docs - n_distinct AS dup_docs,
         |    CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_tok
         |  FROM src),
         | c1 AS (SELECT quantile_cont(mean_tok, 0.5) AS med FROM m),
         | c2 AS (SELECT max(med) AS med,
         |    quantile_cont(abs(mean_tok - med), 0.5) AS mad FROM m CROSS JOIN c1),
         | z AS (SELECT m.*, CASE
         |      WHEN mad > 0 THEN (mean_tok - med) / (1.4826 * mad)
         |      WHEN mean_tok - med = 0 THEN 0.0
         |      ELSE sign(mean_tok - med) * 9999.0 END AS rz
         |   FROM m CROSS JOIN c2)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(dup_docs AS BIGINT) AS dup_docs,
         |  round(mean_tok, 4) AS mean_tok,
         |  round(rz, 4) AS tok_robust_z,
         |  abs(rz) > 2 AS outlier
         |FROM z ORDER BY source""".stripMargin,

    "d13_edit_pairs" ->
      s"""WITH d AS (SELECT doc_id, lang, n_chars,
         |    substr($normSql, 1, 80) AS p FROM documents),
         | pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    levenshtein(a.p, b.p) AS edit_dist
         |  FROM d a JOIN d b
         |    ON a.lang = b.lang AND CAST(a.n_chars AS BIGINT) // 100 = CAST(b.n_chars AS BIGINT) // 100
         |    AND a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 20)
         |SELECT id_a, id_b, edit_dist FROM pairs
         |WHERE edit_dist <= 10 ORDER BY id_a, id_b""".stripMargin,

    "d11_shared_grams" ->
      s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks
         |  FROM documents),
         | d AS (SELECT doc_id, list_distinct(${shingleSql(4)}) AS grams FROM base),
         | ex AS (SELECT doc_id, unnest(grams) AS g FROM d)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
         |FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
         |GROUP BY id_a, id_b
         |ORDER BY id_a, id_b""".stripMargin,

    "t14_entropy" ->
      s"""WITH base AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
         |  FROM documents),
         | c AS (SELECT doc_id, tok, count(*) AS cnt FROM base GROUP BY doc_id, tok),
         | a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
         |    sum(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))) AS slc
         |  FROM c GROUP BY doc_id)
         |SELECT doc_id, n AS n_tokens,
         |  round(ln(CAST(n AS DOUBLE)) - slc / CAST(n AS DOUBLE), 4) AS entropy
         |FROM a ORDER BY doc_id""".stripMargin,

    // t15: exact regime — sketch capacity above vocabulary, so the
    // plain GROUP BY count is the ground truth; (n DESC, token) is a
    // total order shared by both sides.
    "t15_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest(string_split($normSql, ' ')) AS token
         |  FROM documents),
         | agg AS (SELECT token, CAST(count(*) AS BIGINT) AS n
         |  FROM toks GROUP BY token)
         |SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rnk,
         |  token, n
         |FROM agg ORDER BY n DESC, token LIMIT 20""".stripMargin,

    // t16: winnowing replayed in SQL — positional 3-gram strings,
    // the portable fmix64∘rollingHash per gram (signed BIGINT so min
    // agrees with Spark's signed longs), window-of-4 minima, distinct.
    "t16_winnow" ->
      s"""WITH nrm AS (SELECT doc_id, $normSql AS nt FROM documents),
         | t AS (SELECT doc_id, string_split(nt, ' ') AS toks FROM nrm),
         | g AS (SELECT doc_id,
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(generate_series(1, len(toks) - 2),
         |                gi -> array_to_string(list_slice(toks, gi, gi + 2), ' ')) END AS grams
         |  FROM t),
         | h AS (SELECT doc_id, list_transform(grams,
         |    gs -> ${PortableHashSql.toSigned(PortableHashSql.tokenHash("gs"))}) AS hs
         |  FROM g),
         | wm AS (SELECT doc_id,
         |    list_distinct(list_transform(generate_series(1, greatest(len(hs) - 3, 1)),
         |      wj -> list_min(list_slice(hs, wj, wj + 3)))) AS fps
         |  FROM h)
         |SELECT doc_id, unnest(fps) AS fp FROM wm ORDER BY doc_id, fp""".stripMargin,

    "t17_lm_score" ->
      s"""WITH tk AS (SELECT doc_id, string_split($normSql, ' ') AS l FROM documents),
         | f AS (SELECT doc_id, l FROM tk WHERE len(l) >= 2),
         | b AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM
         |   (SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z FROM f)),
         | bi AS (SELECT w1, w2, count(*) AS n_xy FROM b GROUP BY 1, 2),
         | ctx AS (SELECT w1, sum(n_xy) AS n_ctx FROM bi GROUP BY 1),
         | pr AS (SELECT bi.w1, bi.w2,
         |     CAST(round(ln(CAST(n_ctx AS DOUBLE)) - ln(CAST(n_xy AS DOUBLE)), 6)
         |       AS DECIMAL(18,6)) AS term
         |   FROM bi JOIN ctx USING (w1)),
         | sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, sum(term) AS s
         |   FROM b JOIN pr USING (w1, w2) GROUP BY doc_id)
         |SELECT doc_id, n_bigrams,
         |  CAST((CAST(s * 1000000 AS BIGINT) + 50 * n_bigrams)
         |    // (100 * n_bigrams) AS DOUBLE) / 10000.0 AS xent
         |FROM sc ORDER BY doc_id""".stripMargin,

    // t34: t17's bigram machinery split train/test, Laplace add-one
    // terms from integer counts, same micro-nat mean.
    "t34_heldout_ppl" ->
      s"""WITH $heldoutXentSql
         |SELECT doc_id, n_bigrams, xent FROM xe ORDER BY doc_id""".stripMargin,

    // d38: t34's per-doc scores (shared heldoutXentSql text), lang
    // joined back, per-language tertiles via ntile over the total
    // order (xent, doc_id), bucket rollup. min/max are order-free;
    // the summed measure is the exact micro-nat integer.
    "d38_ccnet_buckets" ->
      s"""WITH $heldoutXentSql,
         | lg AS (SELECT xe.doc_id, n_bigrams, xent,
         |     coalesce(lang, '?') AS lang
         |   FROM xe JOIN (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id, lang
         |                 FROM documents) d2 ON d2.doc_id = xe.doc_id),
         | nt AS (SELECT *, ntile(3) OVER (PARTITION BY lang
         |     ORDER BY xent, doc_id) AS t FROM lg),
         | bk AS (SELECT lang,
         |     CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
         |     n_bigrams, xent FROM nt)
         |SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
         |  min(xent) AS min_xent, max(xent) AS max_xent,
         |  CAST(sum(CAST(round(xent * 10000) AS BIGINT)) AS BIGINT) AS sum_uxent
         |FROM bk GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,

    // t35: the heap's (cnt DESC, hash ASC) order as a ranked window;
    // line hash via the shared portable fmix∘roll replay.
    "t35_boilerplate" ->
      s"""WITH ln AS (SELECT source, nline FROM (
         |   SELECT coalesce(source, '?') AS source, ${PortableHashSql.norm("l")} AS nline
         |   FROM (SELECT source, unnest(string_split(text, chr(10))) AS l
         |         FROM documents))
         |  WHERE nline <> ''),
         | h AS (SELECT source, nline,
         |    ${PortableHashSql.toSigned(PortableHashSql.tokenHash("nline"))} AS lh
         |  FROM ln),
         | c AS (SELECT source, lh, min(nline) AS line, count(*) AS cnt
         |  FROM h GROUP BY 1, 2),
         | r AS (SELECT source, line, cnt,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY cnt DESC, lh ASC) AS rank
         |  FROM c)
         |SELECT source, CAST(rank AS BIGINT) AS rank, line,
         |  CAST(cnt AS BIGINT) AS cnt
         |FROM r WHERE rank <= 3 ORDER BY source, rank""".stripMargin,

    "t18_dupfrac" ->
      s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         | d AS (SELECT doc_id, list_distinct(${shingleSql(4)}) AS grams FROM base),
         | ex AS (SELECT doc_id, unnest(grams) AS g FROM d),
         | dupg AS (SELECT g FROM ex GROUP BY g HAVING count(*) >= 2),
         | tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM ex GROUP BY doc_id),
         | dup AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
         |   FROM ex JOIN dupg USING (g) GROUP BY doc_id)
         |SELECT doc_id, n_grams,
         |  coalesce(n_dup, CAST(0 AS BIGINT)) AS n_dup,
         |  round(CAST(coalesce(n_dup, 0) AS DOUBLE) / CAST(n_grams AS DOUBLE), 4) AS dup_frac
         |FROM tot LEFT JOIN dup USING (doc_id) ORDER BY doc_id""".stripMargin,

    // t39: synthesis grammar + the extract-and-fold replay — matches
    // exploded with ordinals, surrogates via the proven fmix∘roll
    // column replay, re-listed LONGEST-FIRST (length DESC, value —
    // the operator's substring-safe fold order; email matches are
    // ASCII so DuckDB codepoint length == Spark UTF-16 length) and
    // folded with a chr(1)-encoded (match, surrogate) pair list
    // (chr(1) cannot occur inside an email match).
    "t39_pseudonymize" ->
      s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |    coalesce(text, '') || ' contact ' ||
         |    regexp_replace(coalesce(source, 's'), '[^a-z0-9]', '', 'g') || '_' ||
         |    CAST(doc_id AS BIGINT) || '@mail-' ||
         |    regexp_replace(coalesce(lang, 'x'), '[^a-z0-9]', '', 'g') ||
         |    '.example' AS tx
         |  FROM documents),
         | m AS (SELECT doc_id, tx,
         |    regexp_extract_all(tx, '${TextStats.emailPat}') AS ms FROM d),
         | ex AS (SELECT doc_id, i, ms[i] AS em FROM
         |   (SELECT doc_id, ms, unnest(generate_series(1, len(ms))) AS i FROM m)),
         | sg AS (SELECT doc_id, i, em, em || chr(1) || 'user_' ||
         |    CAST(((${PortableHashSql.toSigned(PortableHashSql.tokenHash("em"))})
         |      % 1000000000000 + 1000000000000) % 1000000000000 AS VARCHAR) ||
         |    '@redacted.example' AS pr
         |  FROM ex),
         | ag AS (SELECT doc_id, list(pr ORDER BY length(em) DESC, em ASC) AS ps
         |   FROM sg GROUP BY doc_id),
         | j AS (SELECT m.doc_id, m.tx, m.ms, ag.ps FROM m JOIN ag USING (doc_id))
         |SELECT doc_id, CAST(len(ms) AS BIGINT) AS n_emails,
         |  list_reduce(list_prepend(tx, ps), (acc, p) -> replace(acc,
         |    string_split(p, chr(1))[1], string_split(p, chr(1))[2])) AS ptext
         |FROM j ORDER BY doc_id""".stripMargin,

    // t45: template, alternation and cumsum offsets replayed with the
    // same null-safe (epoch, event_id) turn order.
    "t45_chat_masks" ->
      """WITH e AS (SELECT CAST(user_id AS BIGINT) AS user_id,
        |    CAST(event_id AS BIGINT) AS event_id,
        |    coalesce(epoch_us(ts), -9223372036854775808) AS tu,
        |    coalesce(event_type, '?') AS et,
        |    CAST(floor(coalesce(value, 0)) AS BIGINT) AS v
        |  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL),
        | t AS (SELECT user_id, event_id, tu, et, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY tu, event_id)
        |      AS turn
        |  FROM e),
        | p AS (SELECT user_id, turn, tu, event_id,
        |    CASE WHEN turn % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
        |    et || ':' || CAST(v AS VARCHAR) AS content
        |  FROM t WHERE turn <= 6),
        | r AS (SELECT user_id, turn, role, tu, event_id,
        |    '<|' || role || '|>' || content || '<|end|>' AS piece FROM p),
        | o AS (SELECT user_id, turn, role, piece,
        |    coalesce(sum(length(piece)) OVER (PARTITION BY user_id
        |      ORDER BY tu, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS start_off
        |  FROM r)
        |SELECT user_id, CAST(turn AS BIGINT) AS turn, role, piece,
        |  CAST(start_off AS BIGINT) AS start_off,
        |  CAST(start_off + length(role) + 4 AS BIGINT) AS mask_start,
        |  CAST(start_off + length(piece) - 7 AS BIGINT) AS mask_end,
        |  CAST(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS BIGINT)
        |    AS masked
        |FROM o ORDER BY user_id, turn""".stripMargin,

    // t43: the corruption AND the repair replayed from the SAME pair
    // table the Spark side folds (rendered into SQL from one Scala
    // source — neither chain can drift); the repaired text is a full
    // compared column, so the round-trip must be byte-exact.
    "t43_mojibake" -> {
      val good = "(coalesce(text, '') || ' café “naïve” entrée’s piñata')"
      val moji = TextStats.mojibakeCorruptSql(good)
      s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |    $moji AS moji
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(${TextStats.mojibakeCountSql("moji")} AS BIGINT) AS n_bad,
         |  ${TextStats.mojibakeRepairSql("moji")} AS repaired
         |FROM d ORDER BY doc_id""".stripMargin
    },

    // t44: the PSM reassembly replayed with the same floor-division
    // split arithmetic and 1-based substr — content preservation
    // makes every span and the full text exact.
    "t44_fim" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    coalesce(text, '') AS tx FROM documents),
        | s AS (SELECT doc_id, tx, length(tx) AS n,
        |    length(tx) // 3 AS p1, (length(tx) * 2) // 3 AS p2 FROM d)
        |SELECT doc_id,
        |  '<fim_prefix>' || substr(tx, 1, p1) ||
        |  '<fim_suffix>' || substr(tx, p2 + 1, n - p2) ||
        |  '<fim_middle>' || substr(tx, p1 + 1, p2 - p1) AS fim_text,
        |  CAST(p1 AS BIGINT) AS n_prefix,
        |  CAST(p2 - p1 AS BIGINT) AS n_middle,
        |  CAST(n - p2 AS BIGINT) AS n_suffix
        |FROM s ORDER BY doc_id""".stripMargin,

    "t19_redact" ->
      s"""WITH r1 AS (SELECT event_id, props,
         |    regexp_replace(props, '${TextStats.emailPat}', '<EMAIL>', 'g') AS after_email
         |  FROM events),
         | r2 AS (SELECT event_id, props, after_email,
         |    regexp_replace(after_email, '${TextStats.ipv4Pat}', '<IP>', 'g') AS after_ip
         |  FROM r1)
         |SELECT event_id,
         |  CAST(len(regexp_extract_all(props, '${TextStats.emailPat}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(after_email, '${TextStats.ipv4Pat}')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(after_ip, '${TextStats.digitRunPat}')) AS BIGINT) AS n_nums,
         |  regexp_replace(after_ip, '${TextStats.digitRunPat}', '<NUM>', 'g') AS redacted
         |FROM r2 ORDER BY event_id""".stripMargin,

    // t37: t19's sequential counting chain rolled up per event_type.
    "t37_pii_profile" ->
      s"""WITH r1 AS (SELECT coalesce(event_type, '?') AS event_type, props,
         |    regexp_replace(props, '${TextStats.emailPat}', '<EMAIL>', 'g') AS after_email
         |  FROM events),
         | r2 AS (SELECT event_type, props, after_email,
         |    regexp_replace(after_email, '${TextStats.ipv4Pat}', '<IP>', 'g') AS after_ip
         |  FROM r1),
         | per AS (SELECT event_type,
         |    len(regexp_extract_all(props, '${TextStats.emailPat}')) AS e,
         |    len(regexp_extract_all(after_email, '${TextStats.ipv4Pat}')) AS i,
         |    len(regexp_extract_all(after_ip, '${TextStats.digitRunPat}')) AS n
         |  FROM r2)
         |SELECT event_type, count(*) AS n_events,
         |  CAST(sum(e) AS BIGINT) AS n_emails,
         |  CAST(sum(i) AS BIGINT) AS n_ips,
         |  CAST(sum(n) AS BIGINT) AS n_nums,
         |  CAST(sum(CASE WHEN e + i + n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dirty
         |FROM per GROUP BY event_type ORDER BY event_type""".stripMargin,

    // d14: the keep decision replayed exactly — same (w·targetN)/n
    // double arithmetic, same fmix64 bucket as t06/t08.
    // d42: the whole recipe — equal-share budget, micro-epoch clamp,
    // whole copies, hash-filtered fractional epoch — replayed in
    // BIGINT arithmetic; per-source materialized counts and unit sums
    // are exact.
    "d42_epoch_recipe" ->
      s"""WITH d AS (SELECT doc_id, coalesce(source, '?') AS s,
         |    CAST(coalesce(n_chars, 0) AS BIGINT) AS nc FROM documents),
         | t AS (SELECT s, count(*) AS nd, sum(nc) AS tok FROM d GROUP BY s),
         | g AS (SELECT sum(tok) AS b, count(*) AS kk FROM t),
         | r AS (SELECT s, nd, tok,
         |    least(4000000, (b * 1000000) // (kk * tok)) AS e6
         |  FROM t, g WHERE tok > 0),
         | h AS (SELECT d.s, d.doc_id, d.nc, r.e6, r.nd, r.tok,
         |    ((${PortableHashSql.toSigned(PortableHashSql.fmix(PortableHashSql.toUnsigned("d.doc_id")))} % 1000000)
         |      + 1000000) % 1000000 AS bk
         |  FROM d JOIN r USING (s)),
         | f AS (SELECT s, e6,
         |    sum(CASE WHEN bk < e6 % 1000000 THEN 1 ELSE 0 END) AS part_n,
         |    sum(CASE WHEN bk < e6 % 1000000 THEN nc ELSE 0 END) AS part_nc,
         |    max(nd) AS nd, max(tok) AS tok
         |  FROM h GROUP BY s, e6)
         |SELECT s AS source, CAST(e6 AS BIGINT) AS epochs6,
         |  CAST(nd * (e6 // 1000000) + part_n AS BIGINT) AS n_materialized,
         |  CAST(tok * (e6 // 1000000) + part_nc AS BIGINT) AS sum_chars
         |FROM f ORDER BY source""".stripMargin,

    // d41: the √n temperature rates replayed with IDENTICAL double
    // arithmetic — sqrt is correctly rounded, the normalizer sums in
    // the same sorted-stratum left-fold order (list_reduce over an
    // ordered list), and the keep filter is the shared portable-hash
    // bucket rule; any drift in a rate's last ulp flips a boundary
    // doc and breaks the row set.
    "d41_temperature_mix" ->
      s"""WITH d AS (SELECT doc_id, coalesce(source, '?') AS s, source, lang
         |   FROM documents),
         | n AS (SELECT s, count(*) AS ns FROM d GROUP BY s),
         | w AS (SELECT s, ns, sqrt(CAST(ns AS DOUBLE)) AS wi FROM n),
         | tot AS (SELECT list_reduce(list(wi ORDER BY s), (a, b) -> a + b)
         |    AS wsum FROM w),
         | r AS (SELECT s, least(1.0, (300.0 * wi) / (wsum * CAST(ns AS DOUBLE)))
         |    AS keep_rate FROM w, tot),
         | h AS (SELECT doc_id, s, source, lang,
         |    ${PortableHashSql.toSigned(PortableHashSql.fmix(PortableHashSql.toUnsigned("doc_id")))} AS hs
         |  FROM d),
         | b AS (SELECT doc_id, s, source, lang,
         |    ((hs % 10000) + 10000) % 10000 AS bucket FROM h)
         |SELECT doc_id, source, lang FROM b JOIN r USING (s)
         |WHERE CAST(bucket AS DOUBLE) < keep_rate * 10000.0
         |ORDER BY doc_id""".stripMargin,

    "d14_mixture" ->
      s"""WITH n AS (SELECT lang, count(*) AS n_stratum FROM documents GROUP BY lang),
         | r AS (SELECT lang, least(1.0,
         |     CASE lang WHEN 'en' THEN 0.4 WHEN 'zh' THEN 0.25 WHEN 'de' THEN 0.15
         |       WHEN 'es' THEN 0.1 WHEN 'fr' THEN 0.1 ELSE 0.0 END
         |     * 250.0 / CAST(n_stratum AS DOUBLE)) AS keep_rate FROM n),
         | h AS (SELECT doc_id, lang, source,
         |    ${PortableHashSql.toSigned(PortableHashSql.fmix(PortableHashSql.toUnsigned("doc_id")))} AS hs
         |  FROM documents),
         | b AS (SELECT doc_id, lang, source,
         |    ((hs % 10000) + 10000) % 10000 AS bucket FROM h)
         |SELECT doc_id, lang, source FROM b JOIN r USING (lang)
         |WHERE CAST(bucket AS DOUBLE) < keep_rate * 10000.0
         |ORDER BY doc_id""".stripMargin,

    // t21: the full 8-round BPE training loop replayed as chained
    // CTEs — per round: pair counts over the current symbol encoding,
    // (n DESC, l, r) argmax, then the same left-to-right
    // non-overlapping replace fuse Spark applies.
    "t21_bpe" -> bpeOracleSql(8),

    // t22: the learned merges applied to every document token — the
    // oracle reuses the training chain (w8's symbol strings ARE the
    // encodings, since the vocab covers every corpus word).
    "t22_bpe_encode" -> bpeEncodeOracleSql(8),

    // t36: the t21/t22 chain grouped by language; half-up 4 dp
    // integer-space fertility ratio.
    "t36_bpe_fertility" ->
      s"""WITH ${bpeChainSql(8)},
         | tf AS (SELECT coalesce(lang, '?') AS lang, word FROM
         |   (SELECT lang, unnest(string_split($normSql, ' ')) AS word FROM documents)
         |   WHERE regexp_matches(word, '^[a-z]+$$')),
         | enc AS (SELECT lang,
         |   len(string_split(trim(sym, '|'), '||')) AS n_sub
         |  FROM tf JOIN w8 USING (word))
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(n_sub) AS BIGINT) AS n_subwords,
         |  CAST((20000 * CAST(sum(n_sub) AS BIGINT) + count(*))
         |    // (2 * count(*)) AS DOUBLE) / 10000.0 AS fertility
         |FROM enc GROUP BY lang ORDER BY lang""".stripMargin,

    // d15: the full curation chain replayed — unrounded quality
    // filter, md5 dedup window, string-gram decontamination, fmix64
    // mixture buckets, manifest rollup.
    "d15_corpus_manifest" -> s"WITH ${manifestChainSql("documents")}",

    // d30: d28's line chain produces the cleaned corpus (surviving
    // lines reassembled as TEXT), and d15's manifest chain — the
    // identical CTE text via manifestChainSql — runs over it.
    // d31: the gate CTE — absence of every blocklist term (strpos =
    // 0 ⇔ the AC scan's all-zero counts) — then the SHARED chain.
    "d31_blocklist_curated" ->
      s"""WITH cd AS (SELECT doc_id, lang, source, text FROM documents
         |   WHERE strpos(coalesce(text, ''), 'batch batch') = 0
         |     AND strpos(coalesce(text, ''), 'big table') = 0
         |     AND strpos(coalesce(text, ''), 'fast join') = 0
         |     AND strpos(coalesce(text, ''), 'slow query') = 0),
         | ${manifestChainSql("cd")}""".stripMargin,

    "d30_line_curated" ->
      s"""WITH ${lineChainSql("documents")},
         | ${manifestChainSql("cd")}""".stripMargin,

    // t38: the oracle REPLAYS THE GRAMMAR — it rebuilds the expected
    // visible lines from the raw document text with string functions
    // (never parsing HTML), so every kernel semantic the synthesized
    // page exercises is value-certified.
    "t38_html_extract" ->
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, $visibleSql AS visible,
         | CAST(len(string_split($visibleSql, chr(10))) AS BIGINT) AS n_lines,
         | CAST(strlen($visibleSql) AS BIGINT) AS n_bytes
         |FROM documents ORDER BY doc_id""".stripMargin,

    // d36: grammar-replay `wet` CTE (t38's expected visible text AS
    // the corpus), then the IDENTICAL d30 composition text — shared
    // lineChainSql + manifestChainSql.
    "d36_wet_curated" ->
      s"""WITH wet AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source,
         |   $visibleSql AS text FROM documents),
         | ${lineChainSql("wet")},
         | ${manifestChainSql("cd")}""".stripMargin,

    // t20: exact regime per group — grouped counts are ground truth;
    // (n DESC, token) is the sketch's own output order.
    "t20_group_hh" ->
      s"""WITH toks AS (SELECT lang, unnest(string_split($normSql, ' ')) AS token
         |  FROM documents),
         | agg AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n
         |  FROM toks GROUP BY lang, token),
         | rk AS (SELECT lang, token, n,
         |   CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, token)
         |     AS BIGINT) AS rnk
         |  FROM agg)
         |SELECT lang, rnk, token, n FROM rk WHERE rnk <= 5
         |ORDER BY lang, rnk""".stripMargin,

    "t09_repetition" ->
      s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         | word AS (SELECT doc_id,
         |   round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) /
         |     CAST(len(toks) AS DOUBLE), 4) AS dup_word_frac FROM base),
         | bic AS (SELECT doc_id, g, count(*) AS cnt
         |   FROM (SELECT doc_id, unnest(${shingleSql(2)}) AS g FROM base)
         |   GROUP BY doc_id, g),
         | bia AS (SELECT doc_id, round(CAST(max(cnt) AS DOUBLE) /
         |     CAST(sum(cnt) AS DOUBLE), 4) AS top_bigram_frac
         |   FROM bic GROUP BY doc_id),
         | tric AS (SELECT doc_id, g, count(*) AS cnt
         |   FROM (SELECT doc_id, unnest(${shingleSql(3)}) AS g FROM base)
         |   GROUP BY doc_id, g),
         | tria AS (SELECT doc_id,
         |   round(CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE) /
         |     CAST(sum(cnt) AS DOUBLE), 4) AS dup_trigram_frac
         |   FROM tric GROUP BY doc_id)
         |SELECT word.doc_id, dup_word_frac, top_bigram_frac, dup_trigram_frac
         |FROM word JOIN bia USING (doc_id) JOIN tria USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "t10_chunks" ->
      s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         | st AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 16)) AS s FROM base)
         |SELECT doc_id, (s - 1) // 16 AS chunk_id,
         |  array_to_string(toks[s:s+31], ' ') AS chunk_text,
         |  least(len(toks) - s + 1, 32) AS chunk_toks
         |FROM st ORDER BY doc_id, chunk_id""".stripMargin,

    "t12_vocab" ->
      s"""WITH c AS (SELECT word, count(*) AS cnt
         |   FROM (SELECT unnest(string_split($normSql, ' ')) AS word FROM documents)
         |   GROUP BY word),
         | r AS (SELECT word, cnt,
         |   row_number() OVER (ORDER BY cnt DESC, word) AS rnk,
         |   sum(cnt) OVER (ORDER BY cnt DESC, word ROWS UNBOUNDED PRECEDING) AS cum,
         |   sum(cnt) OVER () AS total FROM c)
         |SELECT rnk, word, cnt,
         |  round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS cum_share
         |FROM r WHERE rnk <= 100 ORDER BY rnk""".stripMargin,

    "t11_pack" ->
      s"""WITH base AS (SELECT lang, doc_id,
         |   len(string_split($normSql, ' ')) AS n_toks FROM documents),
         | c AS (SELECT lang AS stream, doc_id, n_toks,
         |   -- CAST: DuckDB sum() over integers is HUGEINT; Spark emits int64
         |   CAST(coalesce(sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |   FROM base)
         |SELECT stream, doc_id, n_toks, cum_before % 512 AS block_offset,
         |  cum_before // 512 AS first_block,
         |  (cum_before + n_toks - 1) // 512 AS last_block
         |FROM c ORDER BY stream, doc_id""".stripMargin
  )
}
