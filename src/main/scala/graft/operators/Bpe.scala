package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** L38 — BPE tokenizer training (Sennrich et al. 2016) as a
  * distributed pipeline: the merge-rule learner behind GPT-style
  * subword vocabularies, run over the corpus word-frequency table.
  *
  * Each merge round is (a) one pair-count shuffle over the vocabulary
  * weighted by word frequency, (b) a 1-row argmax collected to the
  * driver (the algorithm's inherent sync point — BPE is sequential in
  * its merge list), and (c) a NARROW per-word rewrite fusing the
  * winning pair. The vocabulary table is tiny relative to the corpus
  * (count-distinct of whitespace words), so at 100 TB the only
  * corpus-sized job is the initial word count; every round after
  * touches vocab-sized data.
  *
  * Determinism / oracle replay: a word's symbol sequence is encoded
  * as `|s1||s2||...||sn|` — the double delimiter makes a pair match
  * `|a||b|` unambiguous (it can't match across a symbol boundary or
  * overlap a previous fuse), and the merge is PLAIN substring
  * replace, scanning left-to-right non-overlapping — identical
  * semantics in Spark's `replace` and DuckDB's `replace`, and exactly
  * BPE's greedy left-to-right fuse. Argmax tie-break is
  * (count DESC, left, right).
  */
object Bpe {

  /** `word` (letters only) → `|c1||c2||...||cn|` symbol encoding. */
  def encodeChars(word: Column): Column =
    concat(lit("|"), array_join(split(word, ""), "||"), lit("|"))

  /** Adjacent symbol pairs of an encoded word, as (left, right) structs. */
  private def pairs(sym: Column): Column = {
    val syms = split(trim(sym, "|"), "\\|\\|")
    zip_with(slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))
  }

  /** The corpus word-frequency table with char-encoded symbols.
    * Words are restricted to `^[a-z]+$` so the `|` delimiter can
    * never occur inside a symbol.
    */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("n_word"))
      .withColumn("sym", encodeChars(col("word")))

  /** Run `merges` BPE rounds; returns (round, left, right, pair_count)
    * — the learned merge table, most-frequent-first by construction.
    *
    * @param localFinishWords once the corpus is reduced to its word-
    *   frequency table, a vocabulary at or below this many rows runs
    *   ALL merge rounds inside one executor task (the CC local-finish
    *   pattern: identical argmax order and identical left-to-right
    *   literal replace, so the merge table is bit-equal to the
    *   distributed rounds') instead of paying `merges` scheduling
    *   round-trips on a tiny table. Larger vocabularies take the
    *   distributed per-round path unchanged. Pass 0 to force it.
    */
  def train(docs: DataFrame, textCol: String, merges: Int,
            localFinishWords: Long = 2000000L): Seq[(Int, String, String, Long)] = {
    val v0 = vocab(docs, textCol).select("n_word", "sym").persist()
    // count doubles as the materializing action: the corpus-sized
    // word count runs exactly once whichever path follows.
    if (v0.count() <= localFinishWords) {
      import docs.sparkSession.implicits._
      val rows = v0.select(col("n_word"), col("sym")).coalesce(1)
        .mapPartitions { it =>
          var cur = it.map(r => (r.getLong(0), r.getString(1))).toArray
          val acc = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
          var round = 1
          var go = true
          while (round <= merges && go) {
            val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
            for ((nw, sym) <- cur) {
              val syms = sym.substring(1, sym.length - 1).split("\\|\\|")
              var i = 0
              while (i < syms.length - 1) {
                val k = (syms(i), syms(i + 1))
                counts(k) = counts.getOrElse(k, 0L) + nw
                i += 1
              }
            }
            if (counts.isEmpty) go = false
            else {
              // (count DESC, left, right) — the distributed argmax order
              val ((l, r), c) = counts.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
              acc += ((round, l, r, c))
              cur = cur.map { case (nw, sym) =>
                (nw, sym.replace(s"|$l||$r|", s"|$l$r|"))
              }
              round += 1
            }
          }
          acc.iterator
        }.collect() // ≤ `merges` rows — the merge table, driver-small
      v0.unpersist()
      return rows.toSeq.sortBy(_._1)
    }
    var v = v0
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (round <- 1 to merges) {
      val top = v.select(col("n_word"), explode(pairs(col("sym"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("n_word").as("n"))
        .orderBy(desc("n"), col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) { v.unpersist(); return out.result() }
      val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      out += ((round, l, r, n))
      // plain replace, not regexp: the pair strings are literal
      val fused = v.withColumn("sym",
        replace(col("sym"), lit(s"|$l||$r|"), lit(s"|$l$r|"))).persist()
      v.unpersist()
      v = fused
    }
    v.unpersist()
    out.result()
  }

  /** Encode each document with a learned merge list: apply the merges
    * in order to every word's char encoding (the same replace chain
    * as training — narrow, zero shuffle), returning per-doc subword
    * token counts.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val applied = merges.foldLeft(encodeChars(col("word")): Column) {
      case (acc, (l, r)) => replace(acc, lit(s"|$l||$r|"), lit(s"|$l$r|"))
    }
    docs.select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .withColumn("n_sub", size(split(trim(applied, "|"), "\\|\\|")).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"))
  }
}
