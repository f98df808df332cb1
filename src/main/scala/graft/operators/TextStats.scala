package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation (SURVEY.md §2.3
  * L8–L11): language ID, quality scoring, token counting. All are
  * narrow per-document projections built from codegen'd builtins —
  * zero shuffle, they fold into whatever scan feeds them.
  */
object TextStats {

  /** Language stopword profiles for the n-gram/stopword heuristic.
    * Order is the deterministic tie-break precedence.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Count of tokens belonging to a stopword list (with multiplicity). */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** L8 — language-ID: per-language stopword hit counts, argmax with
    * fixed precedence (first language winning ties). Returns
    * (scores..., predicted) as a struct-free column list via the
    * helper columns; callers select what they need.
    */
  def langScores(toks: Column): Seq[(String, Column)] =
    stopwords.map { case (lang, words) => s"score_$lang" -> stopwordCount(toks, words) }

  def langPredict(scores: Seq[(String, Column)]): Column = {
    // CASE WHEN s_i >= all later scores THEN lang_i ... ELSE last.
    val cols = scores.map(_._2)
    scores.init.zipWithIndex.foldRight(lit(scores.last._1.stripPrefix("score_"))) {
      case (((name, _), i), elseCol) =>
        val cond = (i + 1 until cols.length).map(j => cols(i) >= cols(j)).reduce(_ && _)
        when(cond, name.stripPrefix("score_")).otherwise(elseCol)
    }
  }

  /** 0-safe ratio: a/b as doubles, 0.0 when b = 0 (the empty-doc
    * convention — under ANSI mode a plain division would abort the
    * whole query on the first empty document). Mirrored in oracles
    * as CASE WHEN b = 0 THEN 0.0 ELSE a/b END.
    */
  def safeRatio(num: Column, den: Column): Column =
    when(den === 0, lit(0.0))
      .otherwise(num.cast("double") / den.cast("double"))

  /** Half-up 4-dp rounding as PURE double arithmetic: floor(x·10⁴ +
    * ½)/10⁴ — every step is one correctly-rounded IEEE op, so both
    * engines produce the IDENTICAL double. `round(double, 4)` does
    * NOT have that property: Spark rounds the shortest decimal
    * representation (BigDecimal.valueOf) while DuckDB rounds the
    * binary value, and they disagree exactly at half boundaries —
    * the hotbucket fuzz corpus caught d25's micro sum off by one
    * through a single boundary-landing quality value. Nonneg x only.
    */
  def halfUp4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** L9 — quality metrics over the normalized text. All ratios are
    * 0-safe double divisions mirrored exactly in the oracle SQL
    * (an empty doc has n_chars = 0; its ratios report 0.0), and all
    * roundings are [[halfUp4]] so the doubles are engine-identical.
    */
  def qualityColumns(norm: Column, toks: Column): Seq[(String, Column)] = {
    val nChars = length(norm)
    val nTok = size(toks)
    val alpha = length(regexp_replace(norm, "[^a-z]", ""))
    val allStop = stopwordCount(toks, stopwords.flatMap(_._2))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTok,
      "mean_tok_len" -> halfUp4(safeRatio(nChars - (nTok - lit(1)), nTok)),
      "stop_ratio" -> halfUp4(safeRatio(allStop, nTok)),
      "alpha_ratio" -> halfUp4(safeRatio(alpha, nChars)),
      "quality" -> halfUp4(
        least(nTok.cast("double") / lit(50.0), lit(1.0)) * lit(0.4) +
          safeRatio(allStop, nTok) * lit(0.3) +
          safeRatio(alpha, nChars) * lit(0.3)))
  }

  /** L28 — unigram token entropy in nats: H = ln n − (Σ c·ln c)/n over
    * the document's token counts. Low entropy marks repetitive or
    * degenerate text (the cheap complexity filter next to t09's
    * repetition signals); high entropy, token-salad. Two keyed
    * aggregations — (doc, token) counts then a per-doc fold — both
    * linear, shuffling only keys and counts.
    */
  def tokenEntropy(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(graft.operators.Dedup.tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n"),
        sum(col("cnt").cast("double") * log(col("cnt").cast("double"))).as("slc"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        round(log(col("n").cast("double")) - col("slc") / col("n").cast("double"), 4)
          .as("entropy"))

  /** L67 — hashed linear classifier APPLICATION (the fastText-style
    * quality/domain scorer every curation pipeline runs over the full
    * corpus, CCNet/LLaMA-style): tokens hash into `numBuckets`
    * feature buckets, each bucket contributes `weights(bucket)`, the
    * doc's score is the sum. ONE fused native codegen pass
    * ([[org.apache.spark.sql.graftx.HashedLinearScore]]): tokenize →
    * hash → bucket → integer-weight accumulate in a single byte loop
    * inside whole-stage codegen — at 100 TB the model applies at read
    * speed, zero shuffle, no per-row allocation, no model state
    * beyond the numBuckets-long weight array shipped with the plan.
    *
    * Weights are INTEGER (production models quantize to int8/int16
    * for exactly this reason): the per-doc sum is order-independent
    * in integer space, so the score is bit-reproducible on any
    * partitioning and replayable by the SQL oracle — a float dot
    * product would drift under unordered aggregation.
    * Use a power-of-two `numBuckets` so the oracle can reduce the
    * unsigned 64-bit token hash mod 2^k without sign fix-ups.
    *
    * An empty/whitespace-only document is (n_toks=0, score=0,
    * score_mean=null) — the byte loop never emits an empty token (the
    * same convention as the oracle roll()'s empty-string guard).
    */
  def hashedLinearScore(text: Column, numBuckets: Int,
                        weights: Seq[Long]): Seq[(String, Column)] = {
    val st = org.apache.spark.sql.graftx.GraftExpressions
      .hashed_linear_score(Dedup.normText(text), numBuckets, weights)
    // st appears once per output column; whole-stage codegen's
    // subexpression elimination evaluates the fused loop once per row.
    val n = st.getField("n_toks")
    val sc = st.getField("score")
    Seq(
      "n_toks" -> n,
      "score" -> sc,
      "score_mean" -> when(n === 0, lit(null).cast("double"))
        .otherwise(round(sc.cast("double") / n.cast("double"), 6)))
  }

  /** Composable higher-order-function form of [[hashedLinearScore]]:
    * `weight` is an arbitrary Column function of the bucket index
    * (e.g. a formula, or `element_at(typedlit(model), idx + 1)`).
    * Spark's `aggregate()` lambda machinery is CodegenFallback —
    * interpreted per token with a split() array per row — so this
    * form exists for ad-hoc weight expressions and as the reference
    * HashedLinearScoreSpec pins the fused loop against; production
    * scans run the fused form.
    */
  def hashedLinearScoreHof(text: Column, numBuckets: Int,
                           weight: Column => Column): Seq[(String, Column)] = {
    import graft.functions.GraftFunctions
    // Empty-token guard: split("") yields [""] in both engines, which
    // would score one phantom bucket and make an empty doc n_toks=1.
    val toks = filter(Dedup.tokens(text), t => t =!= "")
    val score = aggregate(toks, lit(0L), (acc, t) => acc +
      weight(pmod(GraftFunctions.fmix64(GraftFunctions.rolling_hash(t)),
        lit(numBuckets.toLong))).cast("long"))
    Seq(
      "n_toks" -> size(toks).cast("long"),
      "score" -> score,
      "score_mean" -> when(size(toks) === 0, lit(null).cast("double"))
        .otherwise(round(score.cast("double") / size(toks).cast("double"), 6)))
  }

  /** L81 — TRAINED hashed centroid classifier (Rocchio '71 relevance
    * feedback, the TF-centroid form IR textbooks teach — trained
    * in-corpus, not just applied like L67): the train split builds
    * per-class hashed-bucket token counts cnt(c, j) and class masses
    * T_c; a test doc's class score is Σ_occurrences cnt(c, bucket)/T_c
    * — the mean train-class frequency of the doc's buckets — and the
    * prediction is the argmax (ties to the smallest class label).
    * This is distributed supervised TRAINING as a query: the model is
    * an aggregate of the data, the apply a broadcast join against it.
    *
    * Oracle-exactness by construction: the model is pure INTEGER
    * counts (order-independent under any partitioning), each score is
    * ONE exact int/int division (correctly-rounded IEEE on both
    * engines), and the argmax compares those doubles then the label —
    * no float accumulation anywhere, so train + apply replay
    * value-for-value in SQL. A test doc with no tokens scores 0 for
    * every class and deterministically predicts the alphabetically
    * first class.
    *
    * Scale shape: training is one map-side-combined groupBy over the
    * token stream into ≤ C·numBuckets rows (the model is bounded by
    * the schema, not the corpus — broadcast-sized by construction);
    * apply joins the broadcast model on bucket (each test token fans
    * out to ≤ C classes, partially aggregated to |docs|·C slim rows
    * before the shuffle), and the argmax is a per-doc window over C
    * rows. No corpus-sized sort, no skew-sensitive key (buckets are
    * hash-uniform).
    *
    * Dup-row contract: base rows are DISTINCT (doc_id, label, text) —
    * re-delivered rows must not double tokens (the d28 convention); a
    * doc_id appearing with two labels yields one prediction per
    * (doc_id, label) pair, deterministically.
    */
  def rocchioClassify(docs: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, labelCol: String, isTrain: Column,
                      numBuckets: Int = 4096): org.apache.spark.sql.DataFrame = {
    import graft.functions.GraftFunctions
    // null-label rows are unlabelable — dropped from train AND test
    // (a null class would order differently across engines)
    val base = docs.filter(col(labelCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        col(labelCol).as("label"), Dedup.normText(col(textCol)).as("ntx"))
      .distinct()
    val tk = base.select(col("doc_id"), col("label"),
        explode(filter(split(col("ntx"), " "), t => t =!= "")).as("tok"))
      .withColumn("j", pmod(GraftFunctions.fmix64(
        GraftFunctions.rolling_hash(col("tok"))), lit(numBuckets.toLong)))
      .select("doc_id", "label", "j")
    val tr = tk.filter(isTrain)
    val cls = tr.groupBy(col("label").as("clabel"))
      .agg(count(lit(1)).as("t_c"))
    val cnts = tr.groupBy(col("label").as("clabel"), col("j"))
      .agg(count(lit(1)).as("c"))
    val m0 = tk.filter(!isTrain).select("doc_id", "j")
      .join(broadcast(cnts), Seq("j"))
      .groupBy("doc_id", "clabel").agg(sum(col("c")).as("m"))
    // skeleton: every (test doc, class) pair — zero-overlap classes
    // and token-less docs still score (0.0), so every doc predicts
    val skel = base.filter(!isTrain).select("doc_id", "label").distinct()
      .crossJoin(broadcast(cls))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id", "label")
      .orderBy(col("score").desc, col("clabel"))
    skel.join(m0, Seq("doc_id", "clabel"), "left")
      .withColumn("score",
        coalesce(col("m"), lit(0L)).cast("double") / col("t_c").cast("double"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label"), col("clabel").as("pred"),
        (floor(col("score") * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).as("score"),
        when(col("clabel") === col("label"), lit(1)).otherwise(lit(0)).as("hit"))
  }

  /** L114 — DSIR importance resampling weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * the production domain-matching selector — score every RAW
    * (crawl) document by how much more likely its hashed-unigram bag
    * is under the TARGET (reference) distribution than under the raw
    * distribution, then keep the top `keepFrac` by weight. Per
    * bucket j with Laplace add-one: log p̂(j)/q̂(j) decomposes into a
    * per-bucket term ln(t_j+1) − ln(r_j+1) plus a per-TOKEN constant
    * ln(R+B) − ln(T+B); both are rounded to 6 dp and carried as
    * DECIMAL(18,6) (the t17 discipline), so the per-doc weight —
    * emitted as the exact integer micro-nat TOTAL `uw`, never a
    * divided mean — is reproducible bit-for-bit in any engine.
    * Selection is per SOURCE over the deterministic total order
    * (uw DESC, doc_id): keep each source's top fracNum/fracDen —
    * the paper's balanced per-domain variant (§4: proportional
    * selection keeps one domain from swamping the budget), the d24
    * gate pattern, and the only plan shape whose window partitions
    * (the paper's global Gumbel resampling is not oracle-checkable;
    * the deterministic per-source top-k is its zero-temperature,
    * domain-balanced limit).
    *
    * Shape at 100 TB: the model is two bucket-count aggregates
    * (≤ numBuckets rows each — BROADCAST); scoring is one narrow
    * explode + one broadcast join + one per-doc fold over the raw
    * side only; selection windows partition by source (a dominant
    * source should switch to the Sampling.topFractionBySketch
    * twin — same contract, KLL threshold, no per-source sort).
    */
  def dsirWeights(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, sourceCol: String, isTarget: Column,
                  numBuckets: Int = 4096,
                  fracNum: Int = 1, fracDen: Int = 4): org.apache.spark.sql.DataFrame = {
    import graft.functions.GraftFunctions
    val base = docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"),
        Dedup.normText(col(textCol)).as("ntx"))
      .distinct()
    val tk = base.select(col("doc_id"), col("source"),
        explode(filter(split(col("ntx"), " "), t => t =!= "")).as("tok"))
      .withColumn("j", pmod(GraftFunctions.fmix64(
        GraftFunctions.rolling_hash(col("tok"))), lit(numBuckets.toLong)))
      .select("doc_id", "source", "j")
    val tg = tk.filter(isTarget)
    val rw = tk.filter(!isTarget)
    val tc = tg.groupBy("j").agg(count(lit(1)).as("t_c"))
    val rc = rw.groupBy("j").agg(count(lit(1)).as("r_c"))
    // the per-bucket model: ≤ numBuckets rows, broadcast to the scorer
    val grid = tc.join(rc, Seq("j"), "full_outer")
      .select(col("j"),
        round(log(coalesce(col("t_c"), lit(0L)).cast("double") + lit(1.0)) -
              log(coalesce(col("r_c"), lit(0L)).cast("double") + lit(1.0)), 6)
          .cast("decimal(18,6)").as("term"))
    // 2 scalars (bounded 1-row agg): total target / raw token mass
    val totRow = tk
      .agg(sum(when(isTarget, 1L).otherwise(0L)).as("tt"),
        sum(when(isTarget, 0L).otherwise(1L)).as("rr"))
      .collect()(0)
    val (tt, rr) = (Option(totRow.get(0)).fold(0L)(_ => totRow.getLong(0)),
      Option(totRow.get(1)).fold(0L)(_ => totRow.getLong(1)))
    val cTerm = BigDecimal(math.log(rr.toDouble + numBuckets) -
      math.log(tt.toDouble + numBuckets))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val scored = rw.join(broadcast(grid), Seq("j"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tok"), sum("term").as("s"))
    val rawDocs = base.filter(!isTarget)
      .select("doc_id", "source").distinct()
    val weighted = rawDocs.join(scored, Seq("doc_id", "source"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        ((coalesce(col("s"), lit(BigDecimal(0)).cast("decimal(18,6)")) +
          lit(cTerm.bigDecimal).cast("decimal(18,6)") *
            coalesce(col("n_tok"), lit(0L))) * lit(1000000L))
          .cast("long").as("uw"))
    Sampling.topFractionByScore(weighted, "doc_id", "source", "uw",
        fracNum, fracDen)
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("n_tok"), col("uw"), col("n_group"))
  }

  /** L117 — the PERSISTED half of [[dsirWeights]] (the d29/s15
    * store pattern applied to data selection — the 100 TB recrawl
    * shape: the reference/raw distributions are trained ONCE over
    * the standing corpus and every new crawl batch scores against
    * the frozen model, never rescanning the corpus):
    *   - `<prefix>_dsir_grid`: (j, t_c, r_c) — raw bucket counts
    *     (counts ARE the model; terms derive at apply time, so the
    *     store stays smoothing-agnostic), ≤ numBuckets rows;
    *   - `<prefix>_dsir_totals`: (tt, rr, b) — one row, the token
    *     masses + bucket count the Laplace constant needs.
    */
  def writeDsirModel(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, isTarget: Column,
                     numBuckets: Int, tablePrefix: String,
                     path: Option[String] = None): Unit = {
    import graft.functions.GraftFunctions
    val base = docs
      .select(col(idCol).cast("long").as("doc_id"),
        Dedup.normText(col(textCol)).as("ntx"))
      .distinct()
    val tk = base.select(col("doc_id"),
        explode(filter(split(col("ntx"), " "), t => t =!= "")).as("tok"))
      .withColumn("j", pmod(GraftFunctions.fmix64(
        GraftFunctions.rolling_hash(col("tok"))), lit(numBuckets.toLong)))
      .select("doc_id", "j")
    val tc = tk.filter(isTarget).groupBy("j").agg(count(lit(1)).as("t_c"))
    val rc = tk.filter(!isTarget).groupBy("j").agg(count(lit(1)).as("r_c"))
    val grid = tc.join(rc, Seq("j"), "full_outer")
      .select(col("j"), coalesce(col("t_c"), lit(0L)).as("t_c"),
        coalesce(col("r_c"), lit(0L)).as("r_c"))
    graft.sources.TidyIO.writeBucketedCols(grid,
      s"${tablePrefix}_dsir_grid", Seq("j"), 1,
      path = path.map(p => s"$p/grid"))
    val totals = grid.agg(sum("t_c").as("tt"), sum("r_c").as("rr"))
      .select(coalesce(col("tt"), lit(0L)).as("tt"),
        coalesce(col("rr"), lit(0L)).as("rr"),
        lit(numBuckets.toLong).as("b"))
    graft.sources.TidyIO.writeBucketedCols(totals,
      s"${tablePrefix}_dsir_totals", Seq("b"), 1,
      path = path.map(p => s"$p/totals"))
  }

  /** Score a NEW batch against a [[writeDsirModel]] store: the model
    * is READ, never retrained — the plan contains the grid scan
    * (broadcast, ≤ numBuckets rows), the batch explode, and a
    * per-doc fold; the training corpus is never touched. Terms are
    * derived from the stored counts exactly as [[dsirWeights]]
    * derives them, with one difference the incremental setting
    * forces: a batch token whose bucket the training corpus never
    * populated LEFT-joins to a 0 term (Laplace gives ln 1 − ln 1 on
    * both sides) but still counts toward n_tok — the per-token
    * constant applies to every token, seen or not. `kept` = uw > 0:
    * the doc looks more like the reference than like raw crawl — the
    * threshold-free selection the log-ratio's sign defines.
    */
  def dsirScoreStored(batch: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String,
                      tablePrefix: String): org.apache.spark.sql.DataFrame = {
    import graft.functions.GraftFunctions
    val spark = batch.sparkSession
    val totRow = spark.table(s"${tablePrefix}_dsir_totals").collect()(0)
    val (tt, rr, b) = (totRow.getLong(0), totRow.getLong(1), totRow.getLong(2))
    val cTerm = BigDecimal(math.log(rr.toDouble + b) - math.log(tt.toDouble + b))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val grid = spark.table(s"${tablePrefix}_dsir_grid")
      .select(col("j"),
        round(log(col("t_c").cast("double") + lit(1.0)) -
              log(col("r_c").cast("double") + lit(1.0)), 6)
          .cast("decimal(18,6)").as("term"))
    val base = batch
      .select(col(idCol).cast("long").as("doc_id"),
        Dedup.normText(col(textCol)).as("ntx"))
      .distinct()
    val tk = base.select(col("doc_id"),
        explode(filter(split(col("ntx"), " "), t => t =!= "")).as("tok"))
      .withColumn("j", pmod(GraftFunctions.fmix64(
        GraftFunctions.rolling_hash(col("tok"))), lit(b)))
      .select("doc_id", "j")
    val scored = tk.join(broadcast(grid), Seq("j"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(coalesce(col("term"),
          lit(BigDecimal(0)).cast("decimal(18,6)"))).as("s"))
    base.select("doc_id").distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        ((coalesce(col("s"), lit(BigDecimal(0)).cast("decimal(18,6)")) +
          lit(cTerm.bigDecimal).cast("decimal(18,6)") *
            coalesce(col("n_tok"), lit(0L))) * lit(1000000L))
          .cast("long").as("uw"))
      .withColumn("kept", when(col("uw") > 0L, 1L).otherwise(0L))
  }

  /** L115 — exact per-group ROC-AUC of a score against a binary
    * label (Mann–Whitney rank-sum with midrank tie handling): the
    * classifier-calibration dashboard every filter pipeline needs —
    * "does the cheap score actually predict the expensive gate?"
    * AUC = (Σ_pos avgrank − n₊(n₊+1)/2) / (n₊·n₋), carried entirely
    * in INTEGER space: doubled average ranks r2 = 2·rank + ties − 1
    * make the numerator exact, and the 6-dp value is emitted as the
    * half-up integer `auc_micro` (never a float division), so the
    * statistic is engine-portable bit-for-bit. NULL when a group has
    * no positives or no negatives (AUC undefined).
    *
    * Shape: two windows, both PARTITIONED by group (rank within
    * group + tie counts within (group, score)), then one per-group
    * fold — no global sort. Long arithmetic holds to ~10⁹ rows per
    * group ((2n²)·10⁶ < 2⁶³); past that, lift the aggregate into
    * DECIMAL(38,0).
    */
  def scoreAuc(df: org.apache.spark.sql.DataFrame, groupCol: String,
               scoreCol: String, labelCol: String): org.apache.spark.sql.DataFrame = {
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(scoreCol))
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol, scoreCol)
    df.withColumn("r2",
        lit(2L) * rank().over(wr) + count(lit(1)).over(wt) - lit(1L))
      .groupBy(groupCol)
      .agg(sum(when(col(labelCol) === 1L, col("r2")).otherwise(lit(0L)))
          .as("sum_r2_pos"),
        sum(col(labelCol)).cast("long").as("n_pos"),
        count(lit(1)).as("n_total"))
      .select(col(groupCol),
        col("n_pos"), (col("n_total") - col("n_pos")).as("n_neg"),
        when(col("n_pos") > 0L && col("n_total") > col("n_pos"),
          expr("CAST(((sum_r2_pos - n_pos * (n_pos + 1)) * 2000000 " +
            "+ 2 * n_pos * (n_total - n_pos)) " +
            "div (4 * n_pos * (n_total - n_pos)) AS BIGINT)"))
          .as("auc_micro"))
  }

  /** L10 — token counting three ways: whitespace split, wordish regex
    * matches, and a BPE-ish subword estimate (⌈len/4⌉ pieces per word
    * — the "~4 chars per token" rule of thumb). All three count over
    * the canonical ASCII-fold normalization (Dedup.normText), so the
    * counts are engine-portable for arbitrary input — raw-text `\s`
    * splits and unicode `lower` both diverge between Java regex and
    * RE2/utf8proc (see normText's doc).
    */
  def tokenCountColumns(text: Column): Seq[(String, Column)] = {
    val norm = Dedup.normText(text)
    val words = regexp_extract_all(norm, lit("[a-z0-9]+"), lit(0))
    Seq(
      "ws_tokens" -> size(split(norm, " ")),
      "word_tokens" -> size(words),
      "bpe_ish_tokens" -> aggregate(
        transform(words, w => ceil(length(w) / lit(4.0)).cast("long")),
        lit(0L), (acc, x) => acc + x))
  }

  /** L33 — corpus-trained bigram language-model cross-entropy: the
    * perplexity-style fluency filter (score docs by how surprising
    * they are under an n-gram LM of the corpus itself — the cheap
    * stand-in for KenLM-based quality bucketing). p(w2|w1) is the
    * conditional MLE c(w1,w2)/c_ctx(w1) with c_ctx the bigram-left
    * occupancy, so every doc bigram has a seen count and no smoothing
    * is needed; xent = mean of −ln p over the doc's bigrams.
    *
    * Determinism: each −ln p term is rounded to 6 dp and summed as
    * DECIMAL(18,6) — integer arithmetic, so the per-doc total is
    * independent of Spark's partial-aggregation order and the oracle
    * reproduces it exactly (the only float ops left are one ln per
    * DISTINCT (n_ctx, n_xy) pair and one final division).
    *
    * Shape: the doc-bigram stream is the only big side — one shuffle
    * to count bigram types, a co-keyed (w1,w2) join back (exchange
    * reuse), one shuffle to the per-doc fold. The count tables join
    * each other small-small. All linear at corpus scale.
    */
  def lmCrossEntropy(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
    val bg = toks.select(col("doc_id"),
        explode(Dedup.bigramZip(col("toks"))).as("z"))
      .select(col("doc_id"), col("z.w1").as("w1"), col("z.w2").as("w2"))
    val bi = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_xy"))
    // n_ctx (bigram-left occupancy) as a window over bi, not a second
    // aggregation of the bigram stream: plan-audited to save a whole
    // scan+shuffle chain (bi is vocabulary-sized; the window shuffles
    // only it, on w1).
    val probs = bi
      .withColumn("n_ctx", sum("n_xy").over(
        org.apache.spark.sql.expressions.Window.partitionBy("w1")))
      .withColumn("term",
        round(log(col("n_ctx").cast("double")) - log(col("n_xy").cast("double")), 6)
          .cast("decimal(18,6)"))
      .select("w1", "w2", "term")
    bg.join(probs, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("term").as("s"))
      // The 4-dp mean is computed half-up in INTEGER micro-nat space:
      // round(double, 4) diverges between engines when s/n lands
      // exactly on a half boundary (Spark rounds the shortest decimal
      // repr, DuckDB the binary value); (S + 50n) div (100n) cannot.
      .select(col("doc_id"), col("n_bigrams"),
        (expr("cast((cast(s * 1000000 as bigint) + 50L * n_bigrams) " +
          "div (100L * n_bigrams) as double)") / lit(10000.0)).as("xent"))
  }

  /** L92 — HELD-OUT bigram cross-entropy: the production direction
    * of [[lmCrossEntropy]] (CCNet/Wenzek et al.: the LM trains on a
    * clean REFERENCE corpus and scores the crawl — t17's self-scoring
    * is the degenerate same-corpus case). Scoring unseen text forces
    * a smoothing choice; add-one (Laplace) keeps every term a pure
    * function of integer counts: p(w2|w1) = (c(w1,w2)+1)/(c_ctx(w1)+V)
    * with V the reference next-word vocabulary — unseen bigrams and
    * unseen contexts both land on well-defined integer-count terms,
    * so the whole score stays oracle-exact (same 6-dp DECIMAL term
    * sums + integer micro-nat mean as t17).
    *
    * Shape: the reference model (bi, ctx, V) is vocabulary-bounded
    * and BROADCAST; the crawl bigram stream is the only corpus-sized
    * side — one narrow explode, two broadcast left joins, one per-doc
    * fold. Re-scoring 100 TB of crawl against a fixed reference is a
    * map-plus-fold, never a crawl×crawl shuffle.
    */
  def lmHeldoutXent(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, trainPred: Column): org.apache.spark.sql.DataFrame = {
    def bigrams(d: org.apache.spark.sql.DataFrame) = {
      val toks = d.select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
        .filter(size(col("toks")) >= 2)
      toks.select(col("doc_id"), explode(Dedup.bigramZip(col("toks"))).as("z"))
        .select(col("doc_id"), col("z.w1").as("w1"), col("z.w2").as("w2"))
    }
    val bi = bigrams(docs.filter(trainPred))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_xy"))
      .persist() // read by ctx, V, and the score join (library caching contract)
    val ctx = bi.groupBy("w1").agg(sum("n_xy").as("n_ctx"))
    val vRow = bi.agg(countDistinct(col("w2")).as("v"))
    bigrams(docs.filter(!trainPred))
      .join(broadcast(bi), Seq("w1", "w2"), "left")
      .join(broadcast(ctx), Seq("w1"), "left")
      .crossJoin(broadcast(vRow))
      .withColumn("term",
        round(log((coalesce(col("n_ctx"), lit(0L)) + col("v")).cast("double"))
          - log((coalesce(col("n_xy"), lit(0L)) + lit(1L)).cast("double")), 6)
          .cast("decimal(18,6)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("term").as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        (expr("cast((cast(s * 1000000 as bigint) + 50L * n_bigrams) " +
          "div (100L * n_bigrams) as double)") / lit(10000.0)).as("xent"))
  }

  /** L44 — BM25 ranked retrieval (Robertson/Walker, the Okapi
    * weighting): score every document against a bag of query terms —
    * the relevance primitive behind corpus search, eval-set mining,
    * and targeted subset extraction ("pull the docs about X") in a
    * curation pipeline. idf = ln(1 + (N − df + ½)/(df + ½)); per-term
    * tf normalization with the k1/b length correction.
    *
    * Determinism (cross-engine): per-(doc, term) scores are rounded
    * to 6 dp and summed as DECIMAL(18,6) (≤ |terms| addends — order-
    * free), and the final 4-dp rounding is half-up in integer space;
    * see [[lmCrossEntropy]] for why round(double, n) alone diverges.
    * dl and the corpus Σdl are integer-valued doubles, so N/avgdl are
    * exact regardless of partial-aggregation order. Residual risk
    * (shared with t07/t17, measure-zero in practice): the per-term
    * round(double, 6) itself — Spark rounds the shortest decimal
    * repr, DuckDB the binary value, so a score landing within an ulp
    * of a 6-dp half boundary could still round apart.
    *
    * Shape: one narrow pass for doc lengths, one explode+filter pass
    * for term frequencies (the isin prunes before the shuffle — only
    * query-term hits travel), df and the (N, avgdl) row broadcast.
    * Corpus-linear; the per-doc fold touches only matching docs.
    *
    * CACHING: persists the tokenized corpus (read by the length and
    * term passes) and leaves it cached for the returned lazy plan;
    * callers in long-lived sessions `spark.catalog.clearCache()`
    * between materialized actions (the Verify/Bench contract).
    */
  def bm25(docs: org.apache.spark.sql.DataFrame, idCol: String,
           textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty)
    val toks = docs
      .select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      // read by the length pass and the term pass; callers clearCache
      // between actions (Verify/Bench contract).
      .persist()
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("double").as("dl"))
    val st = dl.agg(count(lit(1)).cast("double").as("n"), avg("dl").as("avgdl"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).cast("double").as("tf"))
    val dfTab = tf.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfTab), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("tfn",
        (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("term", round(col("idf") * col("tfn"), 6).cast("decimal(18,6)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("term")).as("s"))
      .select(col("doc_id"), col("n_terms"),
        (expr("cast((cast(s * 1000000 as bigint) + 50L) div 100L as double)") /
          lit(10000.0)).as("bm25"))
  }

  /** L47 — vocabulary growth curve (Heaps'-law profile): per ingest
    * bucket of `bucket` documents, how many NOVEL word bigrams first
    * appear there, with the cumulative vocabulary size — the corpus
    * diversity/saturation diagnostic (a flattening curve says more
    * data is adding repetition, not coverage; a jump flags a domain
    * shift in the crawl).
    *
    * Shape: "first seen" inverts the inherently sequential scan into
    * one gram-keyed min aggregation — grams travel as 64-bit hashes
    * (one codegen pass/doc), so the only corpus-sized work is a
    * linear shuffle on the gram hash. The curve window runs over the
    * BUCKET table (≤ corpus/bucket rows, one per ingest slice) —
    * a deliberately driver-small global window, never the corpus.
    *
    * Requires a numeric `idCol` (ingest order); docs with fewer than
    * two tokens contribute no bigram (ngram_hashes would otherwise
    * fall back to one whole-array gram for short docs).
    */
  def vocabGrowth(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, bucket: Int = 50): org.apache.spark.sql.DataFrame = {
    require(docs.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"vocabGrowth needs a numeric ingest-order id; '$idCol' is " +
        s"${docs.schema(idCol).dataType.simpleString} — derive one " +
        "(e.g. a dense rank over ingest time) before calling")
    val fs = docs
      .select(col(idCol).cast("long").as("doc_id"),
        Dedup.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions
          .ngram_hashes(col("toks"), 2)).as("g"))
      .groupBy("g").agg(min("doc_id").as("first_seen"))
    val b = fs
      .select(((expr(s"first_seen div $bucket") + 1) * bucket).as("bucket_end"))
      .groupBy("bucket_end").agg(count(lit(1)).as("new_grams"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket_end")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    b.withColumn("cum_vocab", sum("new_grams").over(w))
  }

  /** PII scrub patterns — conservative syntax shared by Java regex
    * (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
    */
  /** L120 — MOJIBAKE detection + repair (ftfy's highest-frequency fix
    * class: UTF-8 bytes mis-decoded as cp1252/Latin-1, so "é" renders
    * "Ã©" and "’" renders "â€™" — the canonical double-encoding
    * corruption a web crawl is full of). The table maps each common
    * accented/punctuation codepoint to its cp1252 mojibake digraph,
    * restricted to digraphs whose every byte is PRINTABLE cp1252
    * (space- and control-free), so an exact `replace` chain — not a
    * regex — detects and repairs them deterministically on both the
    * Spark and DuckDB sides. Repair applies longest-bad-first;
    * entries never substring one another so the fold is
    * order-independent (kept sorted anyway for the principle).
    * Narrow per-row projection, zero shuffle.
    */
  val mojibakePairs: Seq[(String, String)] = Seq(
    "’" -> "â€™", // ’  ← â€™
    "“" -> "â€œ", // “  ← â€œ
    "é" -> "Ã©", // é ← Ã©
    "è" -> "Ã¨", // è ← Ã¨
    "ä" -> "Ã¤", // ä ← Ã¤
    "ö" -> "Ã¶", // ö ← Ã¶
    "ü" -> "Ã¼", // ü ← Ã¼
    "ñ" -> "Ã±", // ñ ← Ã±
    "ç" -> "Ã§", // ç ← Ã§
    "á" -> "Ã¡", // á ← Ã¡
    "ó" -> "Ã³", // ó ← Ã³
    "ú" -> "Ãº", // ú ← Ãº
    "ï" -> "Ã¯") // ï ← Ã¯

  private def mojiSorted: Seq[(String, String)] =
    mojibakePairs.sortBy { case (_, bad) => (-bad.length, bad) }

  /** Number of mojibake digraphs present (the detector — route a doc
    * to the repair pass when > 0).
    */
  def mojibakeCount(text: Column): Column =
    mojiSorted.map { case (_, bad) =>
      ((length(text) - length(replace(text, lit(bad), lit("")))) /
        lit(bad.length)).cast("long")
    }.reduce(_ + _)

  /** The repaired text: every digraph folded back to its codepoint. */
  def mojibakeRepair(text: Column): Column =
    mojiSorted.foldLeft(text) { case (c, (good, bad)) =>
      replace(c, lit(bad), lit(good)) }

  /** The CORRUPTION direction (good → mojibake) — what a
    * double-encode does; used by tests/queries to synthesize
    * deterministic corrupt inputs whose repair round-trips.
    */
  def mojibakeCorrupt(text: Column): Column =
    mojiSorted.foldLeft(text) { case (c, (good, bad)) =>
      replace(c, lit(good), lit(bad)) }

  /** DuckDB replay of the same chains — shared source of truth, the
    * t39 convention (the oracle replays the grammar AND the repair).
    */
  def mojibakeCorruptSql(inner: String): String =
    mojiSorted.foldLeft(inner) { case (e, (good, bad)) =>
      s"replace($e, '$good', '$bad')" }
  def mojibakeRepairSql(inner: String): String =
    mojiSorted.foldLeft(inner) { case (e, (good, bad)) =>
      s"replace($e, '$bad', '$good')" }
  def mojibakeCountSql(inner: String): String =
    mojiSorted.map { case (_, bad) =>
      s"((length($inner) - length(replace($inner, '$bad', ''))) // ${bad.length})"
    }.mkString("(", " + ", ")")

  /** L121 — FIM (fill-in-middle) transform (Bavarian et al. 2022 —
    * the standard code-corpus augmentation: train the model to infill
    * by moving the middle span to the end): deterministic PSM
    * re-assembly `<fim_prefix>P<fim_suffix>S<fim_middle>M` with split
    * points at ⌊n/3⌋ and ⌊2n/3⌋ codepoints — content-preserving by
    * construction (every codepoint lands exactly once), so counts and
    * the reassembled text are oracle-exact. Narrow per-row substring
    * projection, zero shuffle; a production pipeline randomizes the
    * split per sample — the split RULE is the pluggable part, the
    * plumbing is this.
    */
  def fimColumns(text: Column): Seq[(String, Column)] = {
    val n = length(text)
    val p1 = floor(n / lit(3)).cast("int")
    val p2 = floor(n * lit(2) / lit(3)).cast("int")
    Seq(
      "fim_text" -> concat(
        lit("<fim_prefix>"), text.substr(lit(1), p1),
        lit("<fim_suffix>"), text.substr(p2 + lit(1), n - p2),
        lit("<fim_middle>"), text.substr(p1 + lit(1), p2 - p1)),
      "n_prefix" -> p1.cast("long"),
      "n_middle" -> (p2 - p1).cast("long"),
      "n_suffix" -> (n - p2).cast("long"))
  }

  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val digitRunPat = "[0-9]+"

  /** L34 — PII redaction: sequentially mask emails → IPv4s → residual
    * digit runs (order matters: emails/IPs contain digits, so each
    * count is taken on the text with the earlier classes already
    * masked). Returns (n_emails, n_ips, n_nums, redacted) columns.
    * Narrow per-row regex projection — zero shuffle, codegen'd
    * builtins, folds into the scan at any scale.
    */
  def redactColumns(text: Column): Seq[(String, Column)] = {
    val afterEmail = regexp_replace(text, emailPat, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, ipv4Pat, "<IP>")
    val afterNum = regexp_replace(afterIp, digitRunPat, "<NUM>")
    Seq(
      "n_emails" -> size(regexp_extract_all(text, lit(emailPat), lit(0))).cast("long"),
      "n_ips" -> size(regexp_extract_all(afterEmail, lit(ipv4Pat), lit(0))).cast("long"),
      "n_nums" -> size(regexp_extract_all(afterIp, lit(digitRunPat), lit(0))).cast("long"),
      "redacted" -> afterNum)
  }

  /** L110 — PSEUDONYMIZATION (the governance tier between t19's
    * destructive redaction and keeping raw PII): every email is
    * replaced by a STABLE keyed surrogate —
    * `user_<pmod(fmix64(rollingHash(email)), 10^12)>@redacted.example`
    * — so the identifier is gone but equality survives: the same
    * address maps to the same surrogate everywhere, and joins /
    * sessionization / dedup over the pseudonymized corpus still
    * work (the GDPR-pseudonymization contract; re-identification
    * needs the hash preimage, not present in the data). The 10^12
    * surrogate space keeps the birthday-collision probability below
    * ~0.5 up to ~1.2M distinct addresses per corpus (vs ~1.2k at
    * the naive 10^6), so pseudonym equality tracks true identity at
    * corpus scale.
    *
    * Mechanics: one regexp_extract_all pass collects the matches
    * ([[emailPat]], t19's class), sorted LONGEST-FIRST (ties broken
    * lexically) so a shorter address that is a substring of a longer
    * one in the same document (alice@x.com inside malice@x.com)
    * cannot corrupt the longer match — the longer replace runs
    * before the shorter's whole-string pass can touch it. Then a
    * higher-order `aggregate` fold replaces each match with its
    * surrogate — `replace` is whole-string, so a repeated address is
    * rewritten by its first fold step and later steps no-op. All
    * codegen builtins plus the portable fmix∘roll kernel — the
    * DuckDB oracle replays the fold with the identical hash
    * arithmetic and the identical (length DESC, value) order (t35's
    * idiom). Email matches are ASCII by construction, so the length
    * sort is engine-independent (bytes == codepoints == UTF-16
    * units). Narrow per-row projection: zero shuffle, folds into
    * the scan at any scale.
    */
  def pseudonymizeEmails(text: Column): Column =
    aggregate(
      array_sort(
        regexp_extract_all(text, lit(emailPat), lit(0)),
        (a, b) => when(length(a) =!= length(b), length(b) - length(a))
          .when(a < b, lit(-1)).when(a > b, lit(1)).otherwise(lit(0))),
      text,
      (acc, m) => replace(acc, m,
        concat(lit("user_"),
          pmod(graft.functions.GraftFunctions.fmix64(
            graft.functions.GraftFunctions.rolling_hash(m)), lit(1000000000000L)),
          lit("@redacted.example"))))

  /** L53 — the Gopher quality-rule battery (Rae et al. 2021 §A1.1):
    * the standard document-level heuristic filter set next to t02's
    * scoring — word-count bounds, mean-word-length bounds,
    * symbol-to-word ratio, bullet-/ellipsis-line fractions, alphabetic
    * word fraction, and required-stopword presence, each reported as a
    * per-rule flag plus the conjunctive `keep`.
    *
    * Engine-exactness: every threshold is evaluated by integer
    * cross-multiplication on raw counts (3·n ≤ Σlen, 10·sym ≤ n, …),
    * never on rounded doubles — a ratio landing exactly on a
    * threshold can't flip between engines. The display ratios are
    * rounded half-up in integer space: floor((20000·a + b) / (2b)) /
    * 10⁴. The floor-of-double-division is exact here: numerator <
    * 2^35 ≪ 2^53 and a true quotient r/b away from an integer by
    * ≥ 1/b can't cross it under one correctly-rounded division.
    *
    * Narrow per-row projection — zero shuffle, folds into the scan.
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherColumns(text: Column): Seq[(String, Column)] = {
    def r4(a: Column, b: Column): Column =
      (floor((lit(20000L) * a + b).cast("double") / (b * lit(2L)).cast("double"))
        / lit(10000.0))
    val norm = Dedup.normText(text)
    val toks = Dedup.tokens(text)
    val nWords = size(toks).cast("long")
    // Single-space join ⇒ Σ word length = |norm| − (n−1); exact for
    // the empty doc too ("" → [""], 0 − 0).
    val sumLen = (length(norm) - (size(toks) - lit(1))).cast("long")
    val alphaWords = size(filter(toks, w => w.rlike("[a-z]"))).cast("long")
    // Lines are split after stripping \r, so CRLF text can't leave a
    // trailing \r that Java's '$' treats as a line terminator while
    // RE2's end-of-string '$' does not (cross-engine divergence).
    val lines = split(regexp_replace(text, "\r", ""), "\n")
    val nLines = size(lines).cast("long")
    val bulletLines =
      size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("long")
    val ellipsisLines =
      size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("long")
    val hashes = (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    val dots = ((length(text) - length(regexp_replace(text, "\\.\\.\\.", "")))
      .cast("double") / lit(3.0)).cast("long")
    val symbols = hashes + dots
    val stopHits = size(filter(array_distinct(toks),
      t => t.isin(gopherStopwords: _*))).cast("long")
    val rLen = (nWords >= 50L && nWords <= 100000L).cast("int")
    val rWordLen = (lit(3L) * nWords <= sumLen && sumLen <= lit(10L) * nWords).cast("int")
    val rSymbol = (lit(10L) * symbols <= nWords).cast("int")
    // Rae et al. §A1.1: drop docs with MORE than 90% bullet lines
    // (10·b ≤ 9·n keeps ≤ 90%).
    val rBullet = (lit(10L) * bulletLines <= lit(9L) * nLines).cast("int")
    val rEllipsis = (lit(10L) * ellipsisLines <= lit(3L) * nLines).cast("int")
    val rAlpha = (lit(5L) * alphaWords >= lit(4L) * nWords).cast("int")
    val rStop = (stopHits >= 2L).cast("int")
    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> r4(sumLen, nWords),
      "symbol_ratio" -> r4(symbols, nWords),
      "bullet_frac" -> r4(bulletLines, nLines),
      "ellipsis_frac" -> r4(ellipsisLines, nLines),
      "alpha_word_frac" -> r4(alphaWords, nWords),
      "stop_hits" -> stopHits,
      "r_len" -> rLen, "r_wordlen" -> rWordLen, "r_symbol" -> rSymbol,
      "r_bullet" -> rBullet, "r_ellipsis" -> rEllipsis,
      "r_alpha" -> rAlpha, "r_stop" -> rStop,
      "keep" -> (rLen * rWordLen * rSymbol * rBullet * rEllipsis * rAlpha * rStop))
  }
}
