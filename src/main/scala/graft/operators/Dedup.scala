package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Deduplication family for large-scale text corpora (the
  * LLM-training-data-pipeline surface; SURVEY.md §2.3 L1–L4).
  *
  * Scale design (100 TB): every variant is `groupBy(bucket)` /
  * equi-join shaped — linear shuffles keyed on hashes, never a cross
  * join. Candidate pairs are generated only inside buckets, hot
  * buckets are capped (the salting guard: a degenerate band that
  * collects millions of docs would otherwise go quadratic), and
  * verification is per-pair map work after an equi-join on doc id.
  */
object Dedup {

  /** Canonical text normalization shared by every dedup/text operator
    * (and mirrored verbatim in the DuckDB oracles via
    * [[graft.queries.PortableHashSql.norm]]): ASCII-fold — every run
    * of characters outside printable ASCII (0x21–0x7E), i.e. all
    * whitespace, control chars, and every non-ASCII codepoint,
    * becomes one space; then trim and lowercase.
    *
    * The fold is what makes the definition provably engine-portable
    * for ARBITRARY input (the t25 lesson, rounds 4–5): Java regex
    * (UTF-16) and RE2 (UTF-8) agree exactly on `[^!-~]+`, and
    * trim/lower over the resulting pure-ASCII string are
    * byte-identical in both engines — whereas unicode-aware `lower`
    * is not ('İ' → "i̇" in Java vs "i" in utf8proc; final 'Σ' → "ς"
    * in Java vs "σ"), and Java's `\s` includes \x0B while RE2's
    * excludes it. Downstream, pure-ASCII tokens also guarantee
    * code-point = UTF-16 = byte counts (length/substring) and
    * ord(char) = utf8 byte in the portable-hash oracles. The
    * differential fuzz harness (tools/fuzzgen.py + FuzzSpec) pins
    * cross-engine agreement on adversarial corpora.
    */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "[^!-~]+", " ")))

  /** Unicode-preserving normalization tier: NFKC (compatibility
    * composition — fullwidth→ASCII, ligature expansion, combining
    * sequences composed) then locale-independent lowercase, then the
    * SAME ASCII whitespace collapse discipline as [[normText]]
    * (unicode letters are KEPT, not folded to spaces).
    *
    * Deliberately a SEPARATE tier with NO DuckDB oracle (documented,
    * not an omission): NFKC + unicode lower have no cross-engine-
    * identical replay — Java's Normalizer and utf8proc disagree on
    * edge codepoints, and unicode `lower` itself diverges ('İ',
    * final sigma; see [[normText]]'s doc). Production multilingual
    * corpora dedup with THIS tier behind the same call sites;
    * certification stays on the ASCII fold, which the fuzz harness
    * replays exactly. UnicodeNormSpec pins the JVM-side contract
    * (idempotence, width folds, combining-mark composition, casefold
    * stability) so the tier is spec-verified even though it is not
    * oracle-verified.
    *
    * A codegen-friendly scalar: java.text.Normalizer is JDK-built-in
    * and allocation-light; at 100 TB this remains a map-side
    * projection like normText.
    */
  def normTextUnicode(c: Column): Column =
    trim(regexp_replace(
      graft.functions.GraftFunctions.nfkc_lower(c), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** L1 — exact dedup: hash the normalized text, keep the smallest id
    * per hash. One hash-aggregate; at 100 TB the md5 shuffle key is
    * 16 bytes/doc regardless of document size.
    */
  /** L68b — LINE-level exact dedup with document reassembly (the
    * RefinedWeb/CCNet line-dedup pass: boilerplate lines — nav bars,
    * cookie banners, footers — repeat across millions of pages and
    * survive whole-doc dedup because the surrounding page differs).
    * Every line keeps only its FIRST corpus occurrence in
    * (doc, line-position) order; each doc is then reassembled from
    * its surviving lines.
    *
    * Per doc: surviving line count, dropped-duplicate count, and the
    * md5 of the reassembled text (join with '\n') — the
    * content-addressed form downstream stages diff against.
    *
    * Determinism: input collapses to DISTINCT (id, text) first (the
    * fuzz-harness dup-row contract), lines are normText-normalized
    * (so CRLF/unicode-space variants of one boilerplate line dedup
    * together), empty lines are dropped on both engines, and
    * first-occurrence is the total order (doc_id, line index).
    *
    * Scale: explode is narrow; first-occurrence is a groupBy(hash)
    * min-struct AGGREGATE (map-side combined — a boilerplate line
    * repeated 100M times reduces to one row per partition before the
    * shuffle) joined back on the hash; then ONE shuffle on doc_id for
    * reassembly. Deliberately NOT the d06-style count window: a
    * window buffers each hash group on one task, and uncapped hot
    * lines are the EXPECTED skew here — the aggregate form is the
    * one that survives them (the join's build side is one row per
    * hash, and AQE skew-split handles the probe side).
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (base, marked) = lineMarked(docs, idCol, textCol)
    val perDoc = marked.groupBy("doc_id").agg(
      count(lit(1)).as("n_lines"),
      sum(when(col("first") =!= struct(col("doc_id"), col("idx")), 1L)
        .otherwise(0L)).as("n_dup_lines"),
      md5(array_join(transform(
        array_sort(collect_list(when(
          col("first") === struct(col("doc_id"), col("idx")),
          struct(col("idx"), col("nline"))))),
        x => x.getField("nline")), "\n")).as("clean_md5"))
    base.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_dup_lines"), lit(0L)).as("n_dup_lines"),
        coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
  }

  /** Shared [[lineDedup]]/[[paragraphDedup]] pipeline: distinct
    * (id, text) → units exploded by `sepRegex` → normalized non-empty
    * units → each unit joined with its corpus FIRST occurrence.
    * Returns (base, marked). The granularity is entirely the split
    * regex: "\n" gives lines (d28), "\n{2,}" gives blank-line
    * paragraphs (d35) — [[normText]] collapses intra-unit whitespace
    * either way, so a reflowed paragraph hashes identically.
    */
  private def unitMarked(docs: DataFrame, idCol: String, textCol: String,
                         sepRegex: String): (DataFrame, DataFrame) = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text")).distinct()
    val units = base
      .select(col("doc_id"), posexplode(split(col("text"), sepRegex)).as(Seq("idx", "line")))
      .withColumn("nline", normText(col("line")))
      .filter(col("nline") =!= "")
      .withColumn("h", md5(col("nline")))
    val firsts = units.groupBy("h")
      .agg(min(struct(col("doc_id"), col("idx"))).as("first"))
    (base, units.join(firsts, Seq("h")))
  }

  private def lineMarked(docs: DataFrame, idCol: String,
                         textCol: String): (DataFrame, DataFrame) =
    unitMarked(docs, idCol, textCol, "\n")

  /** [[lineDedup]]'s reassembly exposed as TEXT, for composition: the
    * surviving (first-occurrence) lines of each document joined back
    * with newlines — the cleaned document the RefinedWeb order feeds
    * into DOC-level curation (line dedup first, because boilerplate
    * lines distort quality ratios and minhash signatures; see d30).
    * Docs whose every line was boilerplate come back as "". Same
    * aggregation as [[lineDedup]] (one keyed shuffle, no window on
    * the hot line hash); the md5 the d28 oracle certifies is exactly
    * md5 of this column.
    */
  def lineDedupText(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (base, marked) = lineMarked(docs, idCol, textCol)
    val clean = marked.groupBy("doc_id").agg(
      array_join(transform(
        array_sort(collect_list(when(
          col("first") === struct(col("doc_id"), col("idx")),
          struct(col("idx"), col("nline"))))),
        x => x.getField("nline")), "\n").as("clean_text"))
    base.select("doc_id").join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** L105 — PARAGRAPH-granularity near-dedup: the RefinedWeb middle
    * granularity between d28's lines and d16/d19's token spans —
    * blank-line-separated paragraphs ("\n{2,}", tolerant of extra
    * blank lines), normalized so reflowed copies collide, corpus
    * first occurrence kept, per-doc dup stats + cleaned-content
    * digest. Identical machinery to [[lineDedup]] (shared
    * [[unitMarked]] body, one keyed shuffle, the skew-safe
    * first-occurrence aggregate — a boilerplate paragraph repeated
    * across millions of pages reduces map-side, never buffering in a
    * window).
    */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (base, marked) = unitMarked(docs, idCol, textCol, "\\n{2,}")
    val perDoc = marked.groupBy("doc_id").agg(
      count(lit(1)).as("n_paras"),
      sum(when(col("first") =!= struct(col("doc_id"), col("idx")), 1L)
        .otherwise(0L)).as("n_dup_paras"),
      md5(array_join(transform(
        array_sort(collect_list(when(
          col("first") === struct(col("doc_id"), col("idx")),
          struct(col("idx"), col("nline"))))),
        x => x.getField("nline")), "\n\n")).as("clean_md5"))
    base.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("n_dup_paras"), lit(0L)).as("n_dup_paras"),
        coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
  }

  /** [[paragraphDedup]]'s reassembly as TEXT (surviving paragraphs
    * joined by blank lines) — the composition form, like
    * [[lineDedupText]] for lines.
    */
  def paragraphDedupText(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (base, marked) = unitMarked(docs, idCol, textCol, "\\n{2,}")
    val clean = marked.groupBy("doc_id").agg(
      array_join(transform(
        array_sort(collect_list(when(
          col("first") === struct(col("doc_id"), col("idx")),
          struct(col("idx"), col("nline"))))),
        x => x.getField("nline")), "\n\n").as("clean_text"))
    base.select("doc_id").join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Drop every row whose `keys`-group holds more than `cap` rows —
    * the hot-bucket/hot-block guard, in its skew-SAFE form: a
    * map-side-combined count (hot groups reduce to one row per
    * partition before the shuffle) joined back on the key. NOT a
    * count window: a window buffers each group on one task, and the
    * degenerate groups are exactly what the cap exists to survive —
    * capping 100M identical docs must not first materialize 100M rows
    * in one window buffer. The join's build side is ≤ one row per
    * surviving group (AQE broadcasts it when small).
    */
  private def capGroups(df: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val keep = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__gn"))
      .filter(col("__gn") <= cap).drop("__gn")
    df.join(keep, keys)
  }

  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), md5(normText(col(textCol))).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** L60 — corpus snapshot delta (recrawl CDC): classify every doc id
    * across two corpus snapshots as added / removed / changed /
    * unchanged by comparing content hashes. This is the incremental-
    * ingest primitive of a recrawl pipeline: downstream stages
    * (dedup, quality, tokenization) re-run only on `added ∪ changed`
    * instead of the full 100 TB corpus.
    *
    * Scale shape: each side reduces to (id, 16-byte md5) at the scan
    * — documents themselves never shuffle — then ONE full-outer
    * sort-merge join on id. The hash is md5 of [[normText]] (the
    * d01-proven cross-engine content key); byte-level deltas that
    * normalize away are deliberately "unchanged" (a recrawl that only
    * reflows whitespace should not re-trigger the pipeline).
    */
  def snapshotDelta(oldSnap: DataFrame, newSnap: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).cast("long").as("doc_id"),
      md5(normText(col(textCol))).as("old_hash"))
    val n = newSnap.select(col(idCol).cast("long").as("doc_id"),
      md5(normText(col(textCol))).as("new_hash"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") === col("new_hash"), "unchanged")
          .otherwise("changed"))
      .select(col("doc_id"), col("status"), col("old_hash"), col("new_hash"))
  }

  /** L30 — blocked edit-distance pairs (record linkage / fuzzy join):
    * candidate pairs from a coarse blocking key plus the classic
    * length lower bound (|len_a − len_b| ≤ lenTol — edit distance is
    * at least the length difference), verified with exact Levenshtein
    * over the normalized `prefixLen`-char prefix. Levenshtein is
    * O(prefixLen²) per pair — bounding it to a prefix keeps the
    * verify cost constant per candidate regardless of document size
    * (prefix distance lower-bounds full-document distance for the
    * dup-detection use). Blocking bounds candidate counts exactly as
    * in [[jaccardPairs]]; pairs across blocks are missed by design.
    *
    * `cap`: hot-block guard, same contract as [[simhashPairs]] — the
    * block self-join emits B² candidates on a degenerate block, so at
    * scale pass Some(n) to drop blocks larger than n entirely (under-
    * reporting pairs). The DEFAULT None is exact: every block is
    * expanded, which is what the oracle checks.
    *
    * The prepped projection is persisted because both sides of the
    * self-join reuse it; it is NOT unpersisted here (the result is
    * lazy — the cache must outlive this call). Callers that loop
    * should `spark.catalog.clearCache()` between actions, as
    * Verify/Bench do; otherwise Spark's LRU block eviction bounds it.
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
                        blockBy: Seq[Column], lenCol: Column,
                        prefixLen: Int = 80, maxDist: Int = 10,
                        lenTol: Int = 20, cap: Option[Int] = None): DataFrame = {
    val prep0 = docs.select(col(idCol).as("id"),
        struct(blockBy: _*).as("blk"), lenCol.cast("long").as("len"),
        substring(normText(col(textCol)), 1, prefixLen).as("p"))
      // Sorted char-code multiset of the prefix, computed ONCE per doc:
      // feeds the bag-distance lower bound below. (split("", "") yields
      // [""] → a phantom code 0; normText is printable ASCII so 0 never
      // collides with a real char and the bound stays a lower bound.)
      .withColumn("pc", sort_array(transform(split(col("p"), ""),
        ch => ascii(ch).cast("long"))))
      .persist()
    val prep = cap match {
      case Some(n) => capGroups(prep0, Seq("blk"), n)
      case None => prep0
    }
    prep.as("a").join(prep.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= lenTol)
      // Bag-distance prune (Navarro: max(|x|,|y|) − |x ⊓ y| ≤ ed(x,y)):
      // one codegen'd merge over the pre-sorted char codes kills most
      // far-apart candidates for ~prefixLen comparisons instead of the
      // O(maxDist·prefixLen) DP — a pure lower bound, so the survivor
      // set (and the oracle) is unchanged.
      .filter(greatest(size(col("a.pc")), size(col("b.pc"))) -
        GraftFunctions.sorted_long_intersect_size(col("a.pc"), col("b.pc"))
        <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        // banded DP: O(maxDist·prefixLen) per pair with early exit
        // (-1 when the distance exceeds the bound) — ~8× less work
        // than the full O(prefixLen²) table at maxDist=10/prefix=80
        levenshtein(col("a.p"), col("b.p"), maxDist).as("edit_dist"))
      .filter(col("edit_dist") >= 0)
  }

  /** L2 — blocked exact-Jaccard near-dedup. Blocking key = the
    * caller's columns (e.g. lang, length bucket) + distinct-token
    * count: near-identical docs agree on all of them, and blocks stay
    * small so the within-block pair join is bounded (standard
    * blocking tradeoff: pairs straddling a block boundary are missed
    * by design). Jaccard over distinct token sets.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   blockBy: Seq[Column], threshold: Double): DataFrame = {
    val blockCols = blockBy.zipWithIndex.map { case (c, i) => c.as(s"block_$i") }
    // Distinct tokens → 64-bit hashes, sorted once per doc: the pair
    // join then shuffles slim long arrays and the per-pair Jaccard is
    // one codegen'd merge scan. (Set semantics are preserved modulo
    // 64-bit collisions between distinct corpus tokens — vanishingly
    // unlikely and checked nowhere near the oracle's float tolerance.)
    val prepped = docs.select(
      (col(idCol).as("id") +:
        sort_array(array_distinct(transform(tokens(col(textCol)), t => xxhash64(t)))).as("toks") +:
        blockCols): _*)
      .withColumn("block",
        concat_ws("|",
          (blockBy.indices.map(i => col(s"block_$i")) :+ size(col("toks")).cast("string")): _*))
    val a = prepped.select(col("block"), col("id").as("id_a"), col("toks").as("toks_a"))
    val b = prepped.select(col("block"), col("id").as("id_b"), col("toks").as("toks_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter",
        GraftFunctions.sorted_long_intersect_size(col("toks_a"), col("toks_b")))
      .withColumn("jac",
        col("inter").cast("double") /
          (size(col("toks_a")) + size(col("toks_b")) - col("inter")).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jac"), 3).as("jaccard"))
  }

  /** Positional adjacent-word pairs of a token array — the shared
    * bigram idiom (t13/t17/t24/t26 and their oracles all build on
    * it): `arrays_zip` of the two shifted slices, struct fields
    * `w1`/`w2`, element i = tokens (i, i+1). CALLERS MUST filter
    * `size(toks) >= 2` first — the slice length goes negative on an
    * empty array (runtime error; see t13's guard note).
    */
  def bigramZip(toks: Column): Column =
    arrays_zip(
      slice(toks, lit(1), size(toks) - 1).as("w1"),
      slice(toks, lit(2), size(toks) - 1).as("w2"))

  /** Word n-gram shingles of the token sequence (order-sensitive). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))

  /** L2b — n-gram Jaccard near-dedup via prefix filtering
    * (AllPairs/PPJoin): EXACT all-pairs similarity over the
    * ORDER-SENSITIVE word n-gram shingle set, so reordered documents
    * that share a bag of words no longer collide (sequence similarity,
    * not bag similarity).
    *
    * Candidate generation is the prefix filter: under ANY total order
    * on grams shared by all docs in a block, two sets with Jaccard
    * >= t must share an element within each one's first
    * |g| - ceil(t*|g|) + 1 grams — a pair sharing nothing in either
    * prefix has overlap <= ceil(t*|g|) - 1 < t*|g| <= t*|union|. So
    * exploding ONLY the prefix (~(1-t)*|g| keys per doc) and
    * equi-joining on the gram key is lossless: same result as the
    * O(n^2) all-pairs join, but the shuffle is linear in corpus size.
    * The order used is ASCENDING DOCUMENT FREQUENCY (the canonical
    * AllPairs ordering, Bayardo et al., WWW'07 "Scaling Up All Pairs
    * Similarity Search"): prefixes then hold each doc's RAREST grams,
    * so join buckets stay tiny even when the corpus shares a hot
    * background vocabulary — the hot grams all sort to the suffixes.
    * The join also applies the length filter (J >= t implies
    * min(|a|,|b|) >= intersection >= t*max(|a|,|b|)), which discards
    * most remaining collisions before the verify step.
    * Verification is one sorted-merge intersect per surviving pair.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, blockBy: Seq[Column], threshold: Double): DataFrame = {
    val blockCols = blockBy.zipWithIndex.map { case (c, i) => c.as(s"block_$i") }
    // Fused native gram hashing (ngram_hashes): the composable
    // transform(shingles(...), xxhash64) form runs interpreted and
    // materializes gram strings per element — measured 15×+ slower.
    val prepped = docs.select(
      (col(idCol).as("id") +:
        GraftFunctions.ngram_hashes(tokens(col(textCol)), n).as("grams") +:
        blockCols): _*)
      .withColumn("block",
        concat_ws("|", blockBy.indices.map(i => col(s"block_$i")): _*))
      .select("block", "id", "grams")
      .withColumn("sz", size(col("grams")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = prepped.select(
      col("block"), col("id"), col("sz"), explode(col("grams")).as("g"))
    // per-block doc frequency: the (df, g)-ascending total order.
    // grams are distinct per doc, so count(*) == docs containing g.
    // A count() WINDOW over (block, g) attaches df in ONE shuffle;
    // the groupBy+join-back form paid the aggregation shuffle AND a
    // second join shuffle of the exploded table on the same key.
    val withDf = exploded.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("block", "g")))
    // Rank each doc's grams by (df, g) with a per-doc array sort (the
    // arrays are small) rather than a window function (which would
    // sort whole shuffle partitions); then keep only the prefix.
    // Persisted because the self-join below reads it twice.
    val cand = withDf
      .groupBy("block", "id", "sz")
      .agg(array_sort(collect_list(struct(col("df"), col("g")))).as("dg"))
      .withColumn("pref", slice(col("dg"), lit(1),
        (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")))
      .select(col("block"), col("id"), col("sz"),
        explode(col("pref").getField("g")).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = cand.as("a")
      .join(cand.as("b"),
        col("a.block") === col("b.block") && col("a.g") === col("b.g") &&
          col("a.id") < col("b.id") &&
          col("a.sz") >= ceil(col("b.sz") * threshold) &&
          col("b.sz") >= ceil(col("a.sz") * threshold))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val side = prepped.select(col("id"), col("grams"))
    pairs
      .join(side.toDF("id_a", "g_a"), Seq("id_a"))
      .join(side.toDF("id_b", "g_b"), Seq("id_b"))
      .withColumn("inter",
        GraftFunctions.sorted_long_intersect_size(col("g_a"), col("g_b")))
      .withColumn("jac",
        col("inter").cast("double") /
          (size(col("g_a")) + size(col("g_b")) - col("inter")).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jac"), 3).as("jaccard"))
  }

  /** L3 — MinHash + LSH near-dedup.
    *
    * shingle → K minhashes (xxhash64 seeded per permutation) → bands
    * of `r` rows hashed to a bucket key → docs sharing any band bucket
    * are candidates → candidates verified with exact Jaccard on
    * distinct token sets.
    *
    * Every stage is narrow or an equi-shuffle on a hash key; `cap`
    * drops degenerate buckets before they go quadratic.
    */
  /** Shared LSH staging: per doc, the banded bucket keys
    * `(id, nt, band, bucket)` and the distinct-shingle-hash sets
    * `(id, dtoks)` used for exact verification. One codegen pass:
    * hash each shingle once, k multiply-add mins; band key is a
    * portable combine-hash of the band's signature slice (band index
    * first, then the r minhashes in order) — replicable by the DuckDB
    * oracle, unlike xxhash64. Tokens are staged first (see
    * ngramJaccardPairs: element_at inside the shingle lambda
    * re-evaluates an inlined tokenize per element).
    */
  private def lshStaged(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int, bands: Int,
                        shingleN: Int): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sh =
      if (shingleN == 1) array_distinct(col("toks"))
      else shingles(col("toks"), shingleN)
    val base = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), sh.as("sh"))
      .withColumn("mh", GraftFunctions.minhash_signature(col("sh"), numHashes))
      .withColumn("nt", size(array_distinct(col("sh"))))
      // Both the banding and the verify sets read this lineage; the
      // K-permutation signature pass is the expensive half of LSH, so
      // evaluate it once (same persist contract as sharedGramPairs:
      // callers clearCache between actions, as Verify/Bench do).
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = base.select(
        col("id"), col("nt"),
        posexplode(array((0 until bands).map(b =>
          GraftFunctions.mix_hash(
            (lit(b.toLong) +: (0 until r).map(j => element_at(col("mh"), b * r + j + 1))): _*)): _*)))
      .toDF("id", "nt", "band", "bucket")
    val sets = base.select(col("id"),
      sort_array(array_distinct(transform(col("sh"), s => xxhash64(s)))).as("dtoks"))
    (banded, sets)
  }

  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, numHashes: Int = 32, bands: Int = 8,
                      shingleN: Int = 3, cap: Int = 100): DataFrame = {
    val (banded, sets) = lshStaged(docs, idCol, textCol, numHashes, bands, shingleN)
    // salting guard: drop hot buckets (degenerate bands) before
    // pairing — skew-safe count+join, see [[capGroups]].
    val counted = capGroups(banded, Seq("band", "bucket"), cap)
    val l = counted.select(col("band"), col("bucket"), col("id").as("id_a"), col("nt").as("nt_a"))
    val rg = counted.select(col("band"), col("bucket"), col("id").as("id_b"), col("nt").as("nt_b"))
    // cheap size-ratio prune: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so a
    // pair can only pass the threshold if the set sizes are close —
    // integer math, applied before the (expensive) verification joins.
    val tPermille = (threshold * 1000).toLong
    val candidates = l.join(rg, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      // 1000L: int count × 1000 overflows past ~2.1M shingles/doc
      .filter(least(col("nt_a"), col("nt_b")) * lit(1000L) >=
        greatest(col("nt_a"), col("nt_b")) * tPermille)
      .select("id_a", "id_b")
      .distinct()
    // verify candidates with exact Jaccard (two slim equi-joins over
    // sorted hash arrays; see jaccardPairs for the hashing rationale).
    candidates
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("dtoks", "toks_a"), Seq("id_a"))
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("dtoks", "toks_b"), Seq("id_b"))
      .withColumn("inter",
        GraftFunctions.sorted_long_intersect_size(col("toks_a"), col("toks_b")))
      .withColumn("jac",
        col("inter").cast("double") /
          (size(col("toks_a")) + size(col("toks_b")) - col("inter")).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jac"), 3).as("jaccard"))
  }

  /** L66 — incremental MinHash-LSH dedup: a NEW batch joined against
    * a STATIC indexed corpus — the production recrawl shape (dedupe
    * today's crawl against the existing 100 TB corpus WITHOUT
    * re-mining corpus×corpus). Same signature/banding/verify kernels
    * as [[minhashLshPairs]]; only new↔corpus pairs are formed — the
    * candidate join is |batch bands| × matching index buckets, linear
    * in the batch for healthy buckets. In production the corpus side
    * of [[lshStaged]] is computed once and PERSISTED as the index:
    * [[writeLshIndex]] writes it as (band, bucket)-bucketed tables and
    * [[probeLshIndex]] probes it with NO Exchange on the index side.
    * Here it is recomputed so the operator stays a pure function of
    * its inputs (the d27 oracle contract); the two forms are
    * spec-pinned equal.
    *
    * `cap` governs the INDEX buckets at build time: a corpus bucket
    * hotter than `cap` docs (boilerplate band) is dropped before any
    * batch ever probes it — the same hot-bucket contract as
    * [[minhashLshPairs]], applied where the quadratic risk lives
    * (hot index bucket × every future batch).
    *
    * @return (new_id, corpus_id, jaccard) — exact Jaccard ≥ threshold
    */
  def minhashAgainstIndex(newDocs: DataFrame, corpus: DataFrame,
                          idCol: String, textCol: String,
                          threshold: Double, numHashes: Int = 32,
                          bands: Int = 8, shingleN: Int = 3,
                          cap: Int = 100): DataFrame = {
    val (nb, nsets) = lshStaged(newDocs, idCol, textCol, numHashes, bands, shingleN)
    val (cb, csets) = lshStaged(corpus, idCol, textCol, numHashes, bands, shingleN)
    val hot = cb.groupBy("band", "bucket").agg(count(lit(1)).as("nd"))
      .filter(col("nd") > cap).select("band", "bucket")
    val index = cb.join(hot, Seq("band", "bucket"), "left_anti")
    val tPermille = (threshold * 1000).toLong
    val cand = nb
      .select(col("band"), col("bucket"), col("id").as("new_id"), col("nt").as("nt_n"))
      .join(index.select(col("band"), col("bucket"),
        col("id").as("corpus_id"), col("nt").as("nt_c")), Seq("band", "bucket"))
      // size-ratio prune, as in minhashLshPairs
      .filter(least(col("nt_n"), col("nt_c")) * lit(1000L) >=
        greatest(col("nt_n"), col("nt_c")) * tPermille)
      .select("new_id", "corpus_id")
      .distinct()
    cand
      .join(nsets.select(col("id").as("new_id"), col("dtoks").as("toks_n")), Seq("new_id"))
      .join(csets.select(col("id").as("corpus_id"), col("dtoks").as("toks_c")), Seq("corpus_id"))
      .withColumn("inter",
        GraftFunctions.sorted_long_intersect_size(col("toks_n"), col("toks_c")))
      .withColumn("jac",
        col("inter").cast("double") /
          (size(col("toks_n")) + size(col("toks_c")) - col("inter")).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("new_id"), col("corpus_id"), round(col("jac"), 3).as("jaccard"))
  }

  /** Persist the corpus side of [[minhashAgainstIndex]] as a
    * PROBE-READY index: two bucketed managed tables —
    * `<prefix>_bands(band, bucket, id, nt)` bucketed on (band,
    * bucket) and `<prefix>_sets(id, dtoks)` bucketed on id — with the
    * hot-bucket `cap` applied AT BUILD TIME (a boilerplate bucket is
    * dropped once, before any batch ever probes it — the quadratic
    * risk lives on the index side).
    *
    * This is the production recrawl layout: the 100 TB corpus pays
    * its signature pass and its (band, bucket) shuffle ONCE at write;
    * every future batch probe ([[probeLshIndex]]) joins it with NO
    * Exchange on the index side — only the batch (today's crawl)
    * shuffles, and a batch is small. PipelineSpec pins the
    * Exchange-free probe plan and result-equality with the
    * recompute-everything form.
    */
  def writeLshIndex(corpus: DataFrame, idCol: String, textCol: String,
                    tablePrefix: String, numHashes: Int = 32, bands: Int = 8,
                    shingleN: Int = 3, cap: Int = 100,
                    buckets: Int = 64, path: Option[String] = None): Unit = {
    val (cb, csets) = lshStaged(corpus, idCol, textCol, numHashes, bands, shingleN)
    val hot = cb.groupBy("band", "bucket").agg(count(lit(1)).as("nd"))
      .filter(col("nd") > cap).select("band", "bucket")
    val index = cb.join(hot, Seq("band", "bucket"), "left_anti")
    graft.sources.TidyIO.writeBucketedCols(
      index, s"${tablePrefix}_bands", Seq("band", "bucket"), buckets,
      path = path.map(p => s"$p/bands"))
    graft.sources.TidyIO.writeBucketedCols(
      csets, s"${tablePrefix}_sets", Seq("id"), buckets,
      path = path.map(p => s"$p/sets"))
  }

  /** Right-to-be-forgotten purge of a persisted LSH index: drop every
    * index row belonging to a tombstoned id from BOTH tables (bands
    * and verify sets) and write the purged index as a NEW versioned
    * snapshot under `dstPrefix` — the lakehouse deletion pattern:
    * never rewrite a table you are reading; swap the new version in
    * and retire the old per retention policy (q63's AS OF story is
    * the read side of the same discipline).
    *
    * Deletion requests are request-sized, not corpus-sized, so the
    * tombstone list broadcasts and both purges are anti-join map
    * passes over the index — cost is index-sized, zero corpus
    * touches. The hot-bucket cap stays as applied AT BUILD (purging
    * can only shrink buckets; re-capping would resurrect rows the
    * build dropped, changing history). PipelineSpec certifies the
    * purged index probes EXACTLY like an index built from the purged
    * corpus, and d37 driver-verifies it end-to-end.
    */
  def purgeLshIndex(spark: org.apache.spark.sql.SparkSession,
                    srcPrefix: String, dstPrefix: String,
                    tombstones: DataFrame, buckets: Int = 64,
                    path: Option[String] = None): Unit = {
    val t = tombstones.select(
      col(tombstones.columns.head).cast("long").as("id"))
    val bands = spark.table(s"${srcPrefix}_bands")
      .join(broadcast(t), Seq("id"), "left_anti")
    val sets = spark.table(s"${srcPrefix}_sets")
      .join(broadcast(t), Seq("id"), "left_anti")
    graft.sources.TidyIO.writeBucketedCols(
      bands, s"${dstPrefix}_bands", Seq("band", "bucket"), buckets,
      path = path.map(p => s"$p/bands"))
    graft.sources.TidyIO.writeBucketedCols(
      sets, s"${dstPrefix}_sets", Seq("id"), buckets,
      path = path.map(p => s"$p/sets"))
  }

  /** Probe a [[writeLshIndex]] index with a new batch: identical
    * semantics to [[minhashAgainstIndex]] (same banding, size-ratio
    * prune, exact-Jaccard verify), but the corpus is READ, not
    * recomputed — the candidate join consumes `<prefix>_bands`
    * bucket-for-bucket (no Exchange on the index side; the batch
    * side shuffles to match, bounded by the batch) and the verify
    * join reads `<prefix>_sets` the same way on id.
    */
  def probeLshIndex(newDocs: DataFrame, idCol: String, textCol: String,
                    tablePrefix: String, threshold: Double,
                    numHashes: Int = 32, bands: Int = 8,
                    shingleN: Int = 3): DataFrame = {
    val spark = newDocs.sparkSession
    val (nb, nsets) = lshStaged(newDocs, idCol, textCol, numHashes, bands, shingleN)
    val index = spark.table(s"${tablePrefix}_bands")
    val csets = spark.table(s"${tablePrefix}_sets")
    val tPermille = (threshold * 1000).toLong
    val cand = nb
      .select(col("band"), col("bucket"), col("id").as("new_id"), col("nt").as("nt_n"))
      .join(index.select(col("band"), col("bucket"),
        col("id").as("corpus_id"), col("nt").as("nt_c")), Seq("band", "bucket"))
      .filter(least(col("nt_n"), col("nt_c")) * lit(1000L) >=
        greatest(col("nt_n"), col("nt_c")) * tPermille)
      .select("new_id", "corpus_id")
      .distinct()
    cand
      .join(nsets.select(col("id").as("new_id"), col("dtoks").as("toks_n")), Seq("new_id"))
      .join(csets.select(col("id").as("corpus_id"), col("dtoks").as("toks_c")), Seq("corpus_id"))
      .withColumn("inter",
        GraftFunctions.sorted_long_intersect_size(col("toks_n"), col("toks_c")))
      .withColumn("jac",
        col("inter").cast("double") /
          (size(col("toks_n")) + size(col("toks_c")) - col("inter")).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("new_id"), col("corpus_id"), round(col("jac"), 3).as("jaccard"))
  }

  /** STREAMING form of [[probeLshIndex]] — the production recrawl
    * INGEST: a document stream probes the persisted index as it
    * arrives. Identical result contract to the batch probe (same
    * banding, size-ratio prune, exact-Jaccard verify against the
    * stored sets), restructured to be STREAM-LEGAL:
    *
    *   - the batch probe joins two derivatives of its input (bands ×
    *     sets) — a stream SELF-join the engine rejects; here the band
    *     explode CARRIES each doc's token set alongside, so the only
    *     joins are stream-static (against the bucketed index tables);
    *   - two stateful operators, both order-independent: an input
    *     dedup on (id, text) — the lineDedup dup-row contract: a
    *     re-delivered document must not double its pairs, where the
    *     batch probe's verify join would multiply them — and the
    *     candidate dedup on (new_id, corpus_id, token-set), content
    *     in the key so an id collision with DIFFERENT text keeps one
    *     verify row per text (matching the batch multiplicity
    *     whenever each text's own bands find the pair; a pair found
    *     only by the other text's bands is the one corner where the
    *     streaming form emits fewer rows — a keyed ingest should not
    *     ship colliding ids at all).
    *
    * Scale note: carrying the token set through the band explode
    * costs ×bands payload on the candidate join's stream side —
    * bounded by the BATCH (a recrawl probe batch is small by
    * definition; the corpus-sized index side still ships nothing).
    */
  def probeLshIndexStreaming(newDocs: DataFrame, idCol: String, textCol: String,
                             tablePrefix: String, threshold: Double,
                             numHashes: Int = 32, bands: Int = 8,
                             shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val spark = newDocs.sparkSession
    val sh =
      if (shingleN == 1) array_distinct(col("toks"))
      else shingles(col("toks"), shingleN)
    val base = newDocs
      .select(col(idCol).as("new_id"), col(textCol).as("__text"))
      .dropDuplicates("new_id", "__text")
      .select(col("new_id"), tokens(col("__text")).as("toks"))
      .select(col("new_id"), sh.as("sh"))
      .withColumn("mh", GraftFunctions.minhash_signature(col("sh"), numHashes))
      .withColumn("nt_n", size(array_distinct(col("sh"))))
      .withColumn("toks_n",
        sort_array(array_distinct(transform(col("sh"), s => xxhash64(s)))))
    val banded = base.select(col("new_id"), col("nt_n"), col("toks_n"),
      posexplode(array((0 until bands).map(b =>
        GraftFunctions.mix_hash(
          (lit(b.toLong) +: (0 until r).map(j =>
            element_at(col("mh"), b * r + j + 1))): _*)): _*))
        .as(Seq("band", "bucket")))
    val index = spark.table(s"${tablePrefix}_bands")
    val csets = spark.table(s"${tablePrefix}_sets")
    val tPermille = (threshold * 1000).toLong
    banded
      .join(index.select(col("band"), col("bucket"),
        col("id").as("corpus_id"), col("nt").as("nt_c")), Seq("band", "bucket"))
      .filter(least(col("nt_n"), col("nt_c")) * lit(1000L) >=
        greatest(col("nt_n"), col("nt_c")) * tPermille)
      .select("new_id", "corpus_id", "toks_n")
      .dropDuplicates("new_id", "corpus_id", "toks_n")
      .join(csets.select(col("id").as("corpus_id"), col("dtoks").as("toks_c")),
        Seq("corpus_id"))
      .withColumn("inter",
        GraftFunctions.sorted_long_intersect_size(col("toks_n"), col("toks_c")))
      .withColumn("jac",
        col("inter").cast("double") /
          (size(col("toks_n")) + size(col("toks_c")) - col("inter")).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("new_id"), col("corpus_id"), round(col("jac"), 3).as("jaccard"))
  }

  /** L57 — MinHash estimator calibration: for every LSH candidate
    * pair (word-level signatures, same banding/cap as
    * [[minhashLshPairs]] with shingleN=1), report the SIGNATURE
    * estimate (matching components / K) next to the EXACT token-set
    * Jaccard — the dashboard that tells you whether K and the band
    * shape are adequate before trusting the sketch at corpus scale
    * (E[est] = J; spread ~ √(J(1−J)/K)).
    *
    * Shape: identical linear band shuffle as the dedup path; the
    * verification joins carry the K-long signature next to the hashed
    * token set, so est and exact come from the SAME two slim joins.
    * est is half-up 4-dp integer-space (matches/K); exact mirrors
    * minhashLshPairs' 3-dp rounding.
    */
  def minhashCalibration(docs: DataFrame, idCol: String, textCol: String,
                         numHashes: Int = 64, bands: Int = 8,
                         cap: Int = 500): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val base = docs
      .select(col(idCol).as("id"), array_distinct(tokens(col(textCol))).as("sh"))
      .withColumn("mh", GraftFunctions.minhash_signature(col("sh"), numHashes))
    val banded = base.select(
        col("id"),
        posexplode(array((0 until bands).map(b =>
          GraftFunctions.mix_hash(
            (lit(b.toLong) +: (0 until r).map(j => element_at(col("mh"), b * r + j + 1))): _*)): _*)))
      .toDF("id", "band", "bucket")
    val counted = capGroups(banded, Seq("band", "bucket"), cap)
    val candidates = counted.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(counted.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val sigs = base.select(col("id"), col("mh"),
      sort_array(transform(col("sh"), s => xxhash64(s))).as("ht"))
    candidates
      .join(sigs.select(col("id").as("id_a"), col("mh").as("mh_a"), col("ht").as("ht_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("mh").as("mh_b"), col("ht").as("ht_b")), Seq("id_b"))
      .withColumn("matches",
        size(filter(zip_with(col("mh_a"), col("mh_b"), (x, y) => x === y), b => b))
          .cast("long"))
      .withColumn("inter",
        GraftFunctions.sorted_long_intersect_size(col("ht_a"), col("ht_b")))
      .select(col("id_a"), col("id_b"), col("matches"),
        (floor((lit(20000L) * col("matches") + numHashes).cast("double")
          / lit(2.0 * numHashes)) / lit(10000.0)).as("est"),
        col("inter").cast("long").as("inter"),
        (size(col("ht_a")) + size(col("ht_b")) - col("inter")).cast("long").as("uni"),
        round(col("inter").cast("double") /
          (size(col("ht_a")) + size(col("ht_b")) - col("inter")).cast("double"), 3)
          .as("jaccard"))
  }

  /** L4 — SimHash near-dedup: 64-bit fingerprint per doc, Hamming
    * band partitioning (pigeonhole: distance ≤ maxDist with
    * `maxDist+1` bands guarantees one identical band), verify with
    * bit_count(xor) on candidates. Linear shuffle on 16-bit band keys.
    *
    * `cap`: optional hot-bucket guard for adversarial corpora (a band
    * value shared by B docs yields B² candidate pairs). The DEFAULT is
    * None = exact — every candidate bucket is expanded, preserving the
    * pigeonhole guarantee that banded output equals brute force. Pass
    * Some(n) only when trading exactness for worst-case skew safety at
    * scale; buckets over n are then dropped entirely (under-reporting
    * pairs), so exactness claims no longer hold.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3, cap: Option[Int] = None): DataFrame = {
    val fp = docs.select(col(idCol).as("id"),
      GraftFunctions.simhash64(tokens(col(textCol))).as("sim"))
    val bandCols = (0 until 4).map(b =>
      shiftrightunsigned(col("sim"), 16 * b).bitwiseAND(lit(0xFFFFL)))
    val banded = fp.select(
        col("id"), col("sim"),
        posexplode(array(bandCols: _*)))
      .toDF("id", "sim", "band", "bucket")
    val counted = cap match {
      case Some(n) => capGroups(banded, Seq("band", "bucket"), n)
      case None => banded
    }
    val l = counted.select(col("band"), col("bucket"), col("id").as("id_a"), col("sim").as("sim_a"))
    val rg = counted.select(col("band"), col("bucket"), col("id").as("id_b"), col("sim").as("sim_b"))
    l.join(rg, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
