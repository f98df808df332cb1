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

  /** L9 — quality metrics over the normalized text. All ratios are
    * double divisions mirrored exactly in the oracle SQL.
    */
  def qualityColumns(norm: Column, toks: Column): Seq[(String, Column)] = {
    val nChars = length(norm)
    val nTok = size(toks)
    val alpha = length(regexp_replace(norm, "[^a-z]", ""))
    val allStop = stopwordCount(toks, stopwords.flatMap(_._2))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTok,
      "mean_tok_len" -> round((nChars - (nTok - lit(1))).cast("double") / nTok.cast("double"), 4),
      "stop_ratio" -> round(allStop.cast("double") / nTok.cast("double"), 4),
      "alpha_ratio" -> round(alpha.cast("double") / nChars.cast("double"), 4),
      "quality" -> round(
        least(nTok.cast("double") / lit(50.0), lit(1.0)) * lit(0.4) +
          (allStop.cast("double") / nTok.cast("double")) * lit(0.3) +
          (alpha.cast("double") / nChars.cast("double")) * lit(0.3), 4))
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

  /** L10 — token counting three ways: whitespace split, wordish regex
    * matches, and a BPE-ish subword estimate (⌈len/4⌉ pieces per word
    * — the "~4 chars per token" rule of thumb).
    */
  def tokenCountColumns(text: Column): Seq[(String, Column)] = {
    val words = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    Seq(
      "ws_tokens" -> size(split(trim(text), "\\s+")),
      "word_tokens" -> size(words),
      "bpe_ish_tokens" -> aggregate(
        transform(words, w => ceil(length(w) / lit(4.0)).cast("long")),
        lit(0L), (acc, x) => acc + x))
  }
}
