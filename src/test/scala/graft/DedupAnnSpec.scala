package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Ann, Dedup}

class DedupAnnSpec extends AnyFunSuite {
  import SharedSpark.{sfDir, spark}

  private lazy val docs = Graft.table(spark, sfDir, "documents").cache()
  private lazy val emb = Graft.table(spark, sfDir, "embeddings").cache()

  test("minhash LSH finds every blocked exact-Jaccard pair (recall) with exact precision") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text",
      Seq(col("lang"), expr("n_chars div 100")), threshold = 0.9)
      .select("id_a", "id_b")
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
      threshold = 0.9, numHashes = 64, bands = 8, shingleN = 1, cap = 500)
    val missed = exact.except(lsh.select("id_a", "id_b")).count()
    val nExact = exact.count()
    assert(nExact > 0, "fixture should contain near-dup pairs")
    assert(missed <= nExact / 20, s"missed $missed of $nExact (recall < 95%)")
    // precision is exact by construction: every emitted pair passed
    // the exact-Jaccard verification
    val bad = lsh.filter(col("jaccard") < 0.9).count()
    assert(bad == 0)
  }

  test("snapshotDelta classifies added/removed/changed/unchanged; normalization-only edits are unchanged") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "kept doc"),
      (4L, "whitespace   doc")).toDF("doc_id", "text")
    val b = Seq((1L, "alpha beta EDITED"),            // changed
      (3L, "kept doc"),                               // unchanged
      (4L, "  whitespace doc "),                      // normalizes equal → unchanged
      (9L, "brand new")).toDF("doc_id", "text")       // added; 2 removed
    val got = Dedup.snapshotDelta(a, b, "doc_id", "text")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed", 2L -> "removed", 3L -> "unchanged",
      4L -> "unchanged", 9L -> "added"))
  }

  test("cluster-aware split has zero leakage: one split per dup cluster, covers every doc") {
    import graft.operators.{ConnectedComponents, Sampling}
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
      Seq(col("lang"), expr("CAST(n_chars AS BIGINT) div 100")), threshold = 0.9)
    val cc = ConnectedComponents.minLabel(pairs.select("id_a", "id_b"))
    val labeled = docs.select(col("doc_id")).join(cc, col("doc_id") === cc("id"), "left")
      .select(col("doc_id").cast("long").as("doc_id"),
        coalesce(col("cluster"), col("doc_id")).cast("long").as("rep_id"))
      .withColumn("split",
        when(Sampling.hashBucket(col("rep_id")) < 90, "train")
          .when(Sampling.hashBucket(col("rep_id")) < 95, "valid").otherwise("test"))
      .cache()
    assert(labeled.count() == docs.count())
    // leakage invariant: no cluster spans two splits (split is a pure
    // function of rep_id, so this is structural — the test pins it)
    val leaky = labeled.groupBy("rep_id")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
    assert(leaky == 0)
    // and the clusters are non-trivial in the fixture
    assert(labeled.groupBy("rep_id").count().filter(col("count") > 1).count() > 0)
    labeled.unpersist()
  }

  test("pqTrainEncode: codes in range, reconstruction beats a random codebook, deterministic") {
    import graft.operators.Ann
    import org.apache.spark.sql.functions._
    val e = emb.filter(size(col("embedding")) === 64)
    val out = Ann.pqTrainEncode(e, "vec_id", "embedding",
      m = 4, subDim = 16, k = 16, iters = 2).cache()
    val rows = out.collect()
    assert(rows.length == e.count())
    // codes are valid cell ids (seeds are vec_id < 16)
    for (s <- 0 until 4)
      assert(rows.forall { r =>
        val c = r.getLong(r.fieldIndex(s"c_$s")); c >= 0 && c < 16 })
    // quantization quality: trained codebooks must reconstruct with
    // clearly POSITIVE cosine on average (random reconstructions
    // center on 0) — the synthetic near-random embeddings put the
    // observed median around 0.48 with 16 cells per 16-dim subspace,
    // so 0.25 is a generous instance-proof floor
    val rc = rows.map(_.getDouble(rows.head.fieldIndex("recon_cos")))
    assert(rc.forall(v => v >= -1.0001 && v <= 1.0001))
    assert(rc.sorted.apply(rc.length / 2) > 0.25,
      f"median recon quality too low: ${rc.sorted.apply(rc.length / 2)}%.3f")
    // deterministic: bit-identical second run (row order is join
    // order — sort by id before comparing)
    val again = Ann.pqTrainEncode(e, "vec_id", "embedding",
      m = 4, subDim = 16, k = 16, iters = 2).collect()
    assert(again.map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq ==
      rows.map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq)
    out.unpersist()
    spark.catalog.clearCache()
  }

  test("pqAdcTopK: ADC score == cos(query, reconstruction); meaningful overlap with brute force") {
    import graft.operators.Ann
    import org.apache.spark.sql.functions._
    val e = emb.filter(size(col("embedding")) === 64)
    val q = e.filter(col("vec_id") < 5)
    val adc = Ann.pqAdcTopK(e, q, "vec_id", "embedding", kTop = 10).cache()
    val rows = adc.collect()
    assert(rows.length == 50) // 5 queries x 10
    // adc_cos is a valid cosine, descending within each query
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val cs = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.forall(v => v >= -1.0001 && v <= 1.0001))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      // each query's own vector reconstructs best-or-near-best: its
      // ADC self-score should put it in the top 10
      assert(rs.exists(r => r.getLong(2) == r.getLong(0)))
    }
    // ADC (codes only) vs exact brute force: compressed search must
    // agree on a decent fraction of the true top-10 (16^4 codebook on
    // near-random 64-dim data — exact agreement is not expected)
    val brute = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rs) => qid -> rs.map(_.getLong(2)).toSet }
    val overlap = byQ.map { case (qid, rs) =>
      rs.map(_.getLong(2)).toSet.intersect(brute(qid)).size }.sum
    assert(overlap >= 10, s"ADC∩brute overlap too low: $overlap/50")
    adc.unpersist()
    spark.catalog.clearCache()
  }

  test("ivfAdcTopK: candidates pruned to probed cells; nProbe=all cells equals exhaustive ADC") {
    import org.apache.spark.sql.functions._
    val e = emb.filter(size(col("embedding")) === 64)
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val q = e.filter(col("vec_id") < 5)
    val seeds = e.filter(col("vec_id") < 16)
    val n = e.count()
    val (cand, ranked) = Ann.ivfAdcParts(e, q, seeds, "vec_id", "embedding",
      kTop = 10, nProbe = 4, m = 4, subDim = 16, k = 16, iters = 2,
      quantScale = 1e6)
    // the point of IVFADC: the scored candidate volume is a cell
    // fraction of the exhaustive |corpus| × |queries|, pruned BEFORE
    // any ADC arithmetic. 4 of 16 cells probed ⇒ ~25% expected; 60%
    // is a generous skew allowance.
    val candN = cand.count()
    assert(candN < n * 5, s"no pruning: $candN candidates")
    assert(candN <= (n * 5 * 0.6).toLong, s"weak pruning: $candN of ${n * 5}")
    val rows = ranked.collect()
    assert(rows.length == 50)
    // every query still finds its own vector (self-cell is always
    // the top probe, and self reconstructs best-or-near-best)
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.exists(r => r.getLong(2) == r.getLong(0)))
    }
    // probing every cell = the exhaustive ADC ranking, row for row —
    // the pruned path changes WHICH codes score, never how they score
    val all = Ann.ivfAdcTopK(e, q, seeds, "vec_id", "embedding",
      kTop = 10, nProbe = 16).collect()
    val exh = Ann.pqAdcTopK(e, q, "vec_id", "embedding", kTop = 10).collect()
    assert(all.map(_.toSeq).toSet == exh.map(_.toSeq).toSet)
    spark.catalog.clearCache()
  }

  test("minhash calibration: est is unbiased-shaped (dup pairs read 1.0, est tracks exact Jaccard)") {
    val cal = Dedup.minhashCalibration(docs, "doc_id", "text").cache()
    val rows = cal.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est")
      val jac = r.getAs[Double]("jaccard")
      assert(est >= 0.0 && est <= 1.0)
      // identical token sets must show a perfect signature match...
      if (jac == 1.0) assert(est == 1.0)
      // ...and K=64 keeps the estimate near truth: |est − J| within
      // 4·√(J(1−J)/64) + 1/64 (four sigmas + quantization).
      val tol = 4.0 * math.sqrt(jac * (1 - jac) / 64.0) + 1.0 / 64.0
      assert(math.abs(est - jac) <= tol,
        s"pair (${r.getLong(0)},${r.getLong(1)}): est $est vs jaccard $jac")
    }
    cal.unpersist()
  }

  test("simhash pairs respect the Hamming bound and are symmetric-free") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("hamming") <= 3L)
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
    }
  }

  test("banded simhash equals brute force exactly (pigeonhole: 4 bands, dist<=3)") {
    import graft.functions.GraftFunctions
    val fp = docs.select(col("doc_id").as("id"),
      GraftFunctions.simhash64(Dedup.tokens(col("text"))).as("sim"))
    val a = fp.select(col("id").as("id_a"), col("sim").as("sim_a"))
    val b = fp.select(col("id").as("id_b"), col("sim").as("sim_b"))
    val brute = a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .filter(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= 3)
      .select("id_a", "id_b")
    val banded = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b")
    assert(banded.except(brute).count() == 0, "banded found a pair brute force rejects")
    assert(brute.except(banded).count() == 0, "banded missed a pair (pigeonhole violated)")
  }

  test("editDistancePairs cap drops degenerate blocks, None stays exact") {
    import spark.implicits._
    // one hot block of 6 near-identical docs (15 pairs) + a cold pair
    val rows = (0 until 6).map(i => (i.toLong, "hot", s"aaaa bbbb cccc d$i")) ++
      Seq((10L, "cold", "xxxx yyyy"), (11L, "cold", "xxxx yyyz"))
    val df = rows.toDF("doc_id", "blk", "text")
      .withColumn("n_chars", length(col("text")))
    def pairs(cap: Option[Int]) = Dedup.editDistancePairs(
      df, "doc_id", "text", Seq(col("blk")), col("n_chars"),
      maxDist = 5, cap = cap).count()
    assert(pairs(None) === 15 + 1)       // exact: all hot pairs + cold
    assert(pairs(Some(4)) === 1)         // hot block (6 > 4) dropped
    spark.catalog.clearCache()
  }

  test("exact dedup keeps one representative per distinct normalized text") {
    val withDups = docs.select(col("doc_id"), col("text"))
      .union(docs.select(col("doc_id") + 100000, concat(col("text"), lit("  "))))
    val deduped = Dedup.exactDedup(withDups, "doc_id", "text")
    assert(deduped.count() == docs.count())
    // the kept id is always the smaller (original) one
    assert(deduped.filter(col("keep_id") >= 100000).count() == 0)
    assert(deduped.filter(col("n_copies") =!= 2).count() == 0)
  }

  test("LSH ANN: self-match always found; recall@10 vs brute force is usable") {
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
    val lsh = Ann.lshTopK(emb, queries, "vec_id", "embedding", 10)
    val self = lsh.filter(col("qid") === col("vec_id")).count()
    assert(self == 5, "self-match must be in its own bucket")
    val hits = brute.select("qid", "vec_id")
      .intersect(lsh.select("qid", "vec_id")).count()
    assert(hits >= 15, s"recall@10 too low: $hits/50") // ≥30% on near-random vectors
  }

  test("IVF ANN: self-match found, recall beats probe fraction, candidates pruned") {
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
    val ivf = Ann.ivfTopK(emb, queries, "vec_id", "embedding", 10, nCells = 16, nProbe = 4)
    // the query's own vector shares its cell → always probed
    assert(ivf.filter(col("qid") === col("vec_id")).count() == 5)
    val hits = brute.select("qid", "vec_id")
      .intersect(ivf.select("qid", "vec_id")).count()
    // probing 4/16 cells scans ~25% of random data; near neighbors
    // skew toward the query's own cells, so recall should beat that
    assert(hits >= 15, s"recall@10 too low: $hits/50")
  }

  test("nearest-seed assignment equals the brute-force argmax with low-id ties") {
    val seeds = emb.filter(col("vec_id") < 8)
    val got = Ann.assignToSeeds(emb, seeds, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent reference: in-memory cosine argmax over the same data
    val sv = seeds.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = emb.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      r.getLong(0) -> sv.toSeq.map { case (sid, se) => (cos(v, se), sid) }
        .maxBy { case (c, sid) => (c, -sid) }._2
    }.toMap
    assert(got == want)
    // every seed is its own nearest seed (cos = 1 with itself)
    (0L until 8L).foreach(sid => assert(got(sid) == sid))
  }

  test("lloydIterate: iters=1 equals assignToSeeds; iters=2 refines without losing vectors") {
    val seeds = emb.filter(col("vec_id") < 8)
    val one = Ann.lloydIterate(emb, seeds, "vec_id", "embedding", iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val base = Ann.assignToSeeds(emb, seeds, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(one == base)
    val two = Ann.lloydIterate(emb, seeds, "vec_id", "embedding", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // still a partition of the corpus into the seeded cluster ids
    assert(two.map(_._1).distinct.length == two.length)
    assert(two.length == emb.count())
    assert(two.map(_._2).toSet.subsetOf((0L until 8L).toSet))
    // the refined centroids should fit at least as well on average —
    // Lloyd's objective improves monotonically up to the 1e-6 centroid
    // quantization (allow that much slack)
    val m1 = base.toSeq.map(_._3).sum / base.size
    val m2 = two.map(_._3).sum / two.length
    assert(m2 >= m1 - 1e-4, s"mean cos degraded: $m1 -> $m2")
  }

  test("cosine kernel: NULL on zero norm and size mismatch; pairs exclude zero vectors") {
    // the cross-engine contract (oracle guards replicate it): a
    // zero-norm side has no defined cosine — the kernel must yield
    // NULL, never -1/NaN (DuckDB's unguarded list_cosine_similarity
    // returns -1.0 there, the divergence the fuzz instances pin)
    import spark.implicits._
    import graft.functions.GraftFunctions
    val rows = Seq(
      (1L, Array(0f, 0f, 0f), 0),
      (2L, Array(1f, 2f, 2f), 0),
      (3L, Array(2f, 4f, 4f), 0)).toDF("vec_id", "embedding", "label")
    val cosines = rows.as("a").crossJoin(rows.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        GraftFunctions.cosine_sim(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(cosines((1L, 2L)).isEmpty && cosines((1L, 1L)).isEmpty)
    assert(math.abs(cosines((2L, 3L)).get.asInstanceOf[Double] - 1.0) < 1e-12)
    // size mismatch is NULL too (the dim quarantine drops such rows
    // before any kernel call in the driver queries)
    val mism = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("x", "y")
      .select(GraftFunctions.cosine_sim(col("x"), col("y"))).head()
    assert(mism.isNullAt(0))
    // a zero vector never appears in threshold-filtered pairs
    val pairs = Ann.cosinePairs(rows, "vec_id", "embedding", "label", threshold = -10.0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 3L)))
  }

  test("approx_count_distinct (HLL) is within 2% of exact") {
    val li = Graft.table(spark, sfDir, "lineitem")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.01).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.02, s"$approx vs $exact")
  }

  test("hash split is deterministic, disjoint, complete, and near the requested ratio") {
    import graft.operators.Sampling
    val (tr1, ho1) = Sampling.hashSplit(docs, "doc_id", 80)
    val (tr2, _) = Sampling.hashSplit(docs, "doc_id", 80)
    assert(tr1.select("doc_id").except(tr2.select("doc_id")).count() == 0)
    assert(tr1.count() + ho1.count() == docs.count())
    assert(tr1.select("doc_id").intersect(ho1.select("doc_id")).count() == 0)
    val frac = tr1.count().toDouble / docs.count()
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("stratified sample keeps only requested strata at roughly the requested rates") {
    import graft.operators.Sampling
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "fr" -> 1.0))
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == Set("en", "fr"))
    val enTotal = docs.filter(col("lang") === "en").count()
    assert(byLang("en") > enTotal * 0.3 && byLang("en") < enTotal * 0.7)
    assert(byLang("fr") == docs.filter(col("lang") === "fr").count())
  }

  test("minhashAgainstIndex: only batch-vs-index pairs; equals the full-mine restriction; cap prunes hot index buckets") {
    import spark.implicits._
    val rep = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = Seq(
      (10L, rep),                                   // batch (id % 5 == 0)
      (11L, rep + " extra"),                        // index near-dup of 10
      (5L, "zeta eta theta iota kappa lambda mu"),  // batch
      (15L, "zeta eta theta iota kappa lambda nu"), // batch near-dup of 5 → must NOT pair
      (3L, "one two three four five six seven"),
      (13L, "one two three four five six eight"),   // index near-dup of 3 → must NOT pair
      (7L, "completely unrelated content words here")
    ).toDF("doc_id", "text")
    val isBatch = pmod(col("doc_id"), lit(5)) === 0
    val got = Dedup.minhashAgainstIndex(
      corpus.filter(isBatch), corpus.filter(!isBatch),
      "doc_id", "text", threshold = 0.8, numHashes = 64, bands = 16,
      shingleN = 1, cap = 100)
    val pairs = got.select("new_id", "corpus_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 11L)), "batch↔index near-dup missed")
    assert(pairs.forall { case (a, b) => a % 5 == 0 && b % 5 != 0 },
      "every pair must be (batch id, index id) — no batch×batch or index×index")
    spark.catalog.clearCache()
    // Against-index == the full symmetric mine restricted to pairs
    // that cross the split (modulo pair orientation).
    val full = Dedup.minhashLshPairs(corpus, "doc_id", "text",
      threshold = 0.8, numHashes = 64, bands = 16, shingleN = 1, cap = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val fullCross = full.collect {
      case (a, b) if a % 5 == 0 && b % 5 != 0 => (a, b)
      case (a, b) if b % 5 == 0 && a % 5 != 0 => (b, a)
    }
    assert(pairs == fullCross)
    spark.catalog.clearCache()
    // cap = 0 drops every index bucket → no candidates at all.
    val capped = Dedup.minhashAgainstIndex(
      corpus.filter(isBatch), corpus.filter(!isBatch),
      "doc_id", "text", threshold = 0.8, numHashes = 64, bands = 16,
      shingleN = 1, cap = 0)
    assert(capped.count() == 0)
    spark.catalog.clearCache()
  }

  test("hashedLinearScore equals an explode-based reference; trained-table form agrees") {
    import graft.operators.TextStats
    import graft.functions.GraftFunctions
    val d = docs.limit(200)
    val cols = TextStats.hashedLinearScore(col("text"), 4096,
      (0 until 4096).map(j => (j * 2654435761L + 97L) % 2001L - 1000L))
    val got = d.select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
    // independent path: explode tokens, hash/weight per row, groupBy.
    val ref = d.select(col("doc_id"),
        explode(Dedup.tokens(col("text"))).as("tok"))
      .withColumn("j", pmod(GraftFunctions.fmix64(
        GraftFunctions.rolling_hash(col("tok"))), lit(4096L)))
      .withColumn("w", (col("j") * lit(2654435761L) + lit(97L)) % lit(2001L) - lit(1000L))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum("w").as("score"))
      .select(col("doc_id"), col("n_toks"), col("score"),
        round(col("score").cast("double") / col("n_toks").cast("double"), 6)
          .as("score_mean"))
    assert(got.except(ref).count() == 0 && ref.except(got).count() == 0)
    spark.catalog.clearCache()
    // trained-table HOF form: element_at over a typedlit weight array
    // must equal the fused form when the table holds the same
    // formula values.
    val table = Array.tabulate(4096)(j =>
      (((j * 2654435761L + 97L) % 2001L) - 1000L).toInt)
    val cols2 = TextStats.hashedLinearScoreHof(col("text"), 4096,
      j => element_at(typedLit(table), j.cast("int") + 1))
    val got2 = d.select(col("doc_id") +: cols2.map { case (n, c) => c.as(n) }: _*)
    assert(got2.except(got).count() == 0)
    spark.catalog.clearCache()
  }

  test("q22 cluster-sort: rows are sorted within every partition") {
    val df = SparkEntry.queries("q22_cluster_sort")(spark, sfDir)
      // narrow projection: preserves partitioning and in-partition order
      .withColumn("sd_s", col("l_shipdate").cast("string")) // ISO format sorts lexicographically
    val ok = df.rdd.mapPartitions { it =>
      val rows = it.map(r => (r.getAs[Long]("l_suppkey"), r.getAs[String]("sd_s"))).toSeq
      Iterator(rows == rows.sorted)
    }.collect()
    assert(ok.forall(identity))
  }
}
