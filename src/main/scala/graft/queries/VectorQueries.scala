package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.functions.GraftFunctions
import graft.operators.{Ann, Multimodal, TextStats}

/** Embedding similarity + multimodal — SURVEY.md §2.3 (L5–L7, L12).
  *
  * Cosines are computed in double precision on both sides (the oracle
  * casts FLOAT[] → DOUBLE[] before list_cosine_similarity) so the
  * accumulation is bit-identical and order/threshold decisions agree.
  */
object VectorQueries {

  /** The embedding contract: fixed dimension, float32 elements. The
    * plane-based queries (s02's SRP codes, s07's JL planes) bake
    * [[EmbDim]]-sized literals into their oracles, so the dimension
    * is part of the query surface, not something read from data.
    */
  private[graft] val EmbDim = 64

  /** Embedding-table loader with the same defensive normalization the
    * text queries apply to documents (the t25/q50 instance-proofing
    * lesson): ids to BIGINT regardless of the physical parquet width,
    * vectors through a FLOAT fold regardless of the physical element
    * type (the kernels accumulate float→double; an instance shipping
    * float64 payloads would otherwise keep precision the float-folded
    * oracle replays drop), and a dimension quarantine — rows whose
    * vector is not exactly [[EmbDim]] long are dropped IDENTICALLY on
    * both sides (oracle: WHERE len(embedding) = 64) instead of
    * crashing list_cosine_similarity on mismatched lengths.
    */
  private def emb(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<float>").as("embedding"),
        col("label").cast("long").as("label"))
      .filter(size(col("embedding")) === EmbDim)

  private def docs(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "documents")

  /** m13/st22's shared WebDataset instance: two members per document
    * — key.txt (the text bytes) and key.json (a deterministic
    * metadata record) — hash-sharded by doc id. ONE body so the batch
    * certification and the streaming ingest cannot drift.
    */
  private[queries] def tarCorpusEntries(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
      coalesce(col("text"), lit("")).as("text"),
      coalesce(col("lang"), lit("xx")).as("lang"))
    d.select(col("doc_id"),
        graft.operators.Sampling.hashBucket(col("doc_id"), 8).as("shard"),
        explode(array(
          struct(concat(col("doc_id"), lit(".txt")).as("name"),
            encode(col("text"), "UTF-8").as("payload")),
          struct(concat(col("doc_id"), lit(".json")).as("name"),
            encode(concat(lit("{\"doc_id\":"), col("doc_id"),
              lit(",\"lang\":\""), col("lang"), lit("\"}")), "UTF-8")
              .as("payload")))).as("e"))
      .select(col("shard"), col("e.name").as("name"), col("e.payload").as("payload"))
  }

  /** The WebDataset sample reassembly over parsed (shard, name,
    * payload) members — per sample key: member count, shard, per-
    * member digests/sizes. Pure aggregate (arrival-order-invariant),
    * so the SAME body serves m13's batch read and st22's complete-
    * mode streaming ingest; callers sort.
    */
  private[queries] def tarSampleStats(parsed: DataFrame): DataFrame =
    parsed
      .select(col("shard"),
        regexp_extract(col("name"), "^(\\d+)\\.", 1).cast("long").as("doc_id"),
        regexp_extract(col("name"), "\\.([a-z]+)$", 1).as("ext"),
        col("payload"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_members"),
        max(col("shard")).as("shard"),
        max(when(col("ext") === "txt", md5(hex(col("payload"))))).as("txt_md5"),
        max(when(col("ext") === "txt", length(col("payload"))))
          .cast("long").as("txt_bytes"),
        max(when(col("ext") === "json", md5(hex(col("payload"))))).as("json_md5"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L5: label-blocked cosine similarity pairs (IVF-style blocking).
    "d05_embed_neardup" -> ((s, dir) => {
      Ann.cosinePairs(emb(s, dir), "vec_id", "embedding", "label", threshold = 0.3)
        .withColumnRenamed("block", "label")
        .orderBy("id_a", "id_b")
    }),

    // L55: within-cluster pair mining — SemDeDup's candidate stage
    // end-to-end: s08's nearest-seed Voronoi assignment becomes the
    // blocking key, then exact cosine pairs are mined only inside
    // cells (cosinePairs with block = cluster; `cap` available for
    // hot cells at scale). Corpus×k broadcast assign + per-cell
    // equi-join — no global all-pairs anywhere.
    "s09_cluster_pairs" -> ((s, dir) => {
      val e = emb(s, dir)
      val assign = Ann.assignToSeeds(e, e.filter(col("vec_id") < 8),
          "vec_id", "embedding")
        .select(col("vec_id"), col("cluster"))
      // Persisted: cosinePairs self-joins this relation, and without
      // the cache each branch recomputes the whole corpus×k
      // assignment (plan-audited — the BroadcastNestedLoopJoin +
      // argmax chain appeared twice). Verify/Bench clearCache
      // between queries (the library caching contract).
      val withCluster = e.join(assign, "vec_id").persist()
      Ann.cosinePairs(withCluster, "vec_id", "embedding",
          "cluster", threshold = 0.2)
        .withColumnRenamed("block", "cluster")
        .orderBy("id_a", "id_b")
    }),

    // L6: brute-force cosine top-k (query set = vec_id < 5, broadcast).
    "s01_ann_brute" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.bruteForceTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
        .orderBy("qid", "rnk")
    }),

    // L7: LSH-bucketed ANN — fully oracled: the ±1 hyperplanes are
    // deterministic literals and every float accumulation is an
    // ascending left-fold both engines replay identically.
    "s02_ann_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.lshTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
        .orderBy("qid", "rnk")
    }),

    // L7b: IVF ANN — k-means cells + nProbe probing (rows-only;
    // recall vs brute force in spec).
    // L7b: IVF ANN, oracle-EXACT since round 7 — the coarse quantizer
    // is the deterministic Lloyd machinery (s10), so index build +
    // probe + rank replay value-for-value in DuckDB. The MLlib-wired
    // ivfTopK stays the production-training variant (recall spec).
    "s03_ann_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.ivfTopKExact(e, e.filter(col("vec_id") < 5),
          e.filter(col("vec_id") < 16), "vec_id", "embedding",
          k = 10, nProbe = 4, iters = 2)
        .orderBy("qid", "rnk")
    }),

    // L72: product quantization — 4 deterministic sub-quantizers
    // (the s10 Lloyd contract per 16-dim slice), per-vector codes +
    // reconstruction-cosine quality audit; the oracle replays all
    // four Lloyd chains and the reconstruction.
    "s11_pq_encode" -> ((s, dir) => {
      Ann.pqTrainEncode(emb(s, dir), "vec_id", "embedding",
          m = 4, subDim = 16, k = 16, iters = 2)
        .orderBy("vec_id")
    }),

    // L74: incremental PQ encode — the batch (vec_id ≡ 0 mod 5)
    // encoded against codebooks trained on the REST of the corpus
    // only (frozen-quantizer append: the d27 recrawl shape for
    // vector compression).
    "s13_pq_incremental" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.pqEncodeAgainst(
          e.filter(pmod(col("vec_id"), lit(5)) =!= 0),
          e.filter(pmod(col("vec_id"), lit(5)) === 0),
          "vec_id", "embedding", m = 4, subDim = 16, k = 16, iters = 2)
        .orderBy("vec_id")
    }),

    // L77: persisted PQ model, DRIVER-VERIFIED — the quantizer trains
    // on the corpus split (vec_id ≢ 0 mod 5) and writes codebooks +
    // codes as external tables; the batch then encodes against the
    // STORED codebooks (no Lloyd stage in the encode plan). Same
    // result contract as s13, so it reuses s13's oracle verbatim —
    // what this query adds is DuckDB certifying the whole
    // train→write→read→encode path.
    "s15_pq_store" -> ((s, dir) => {
      val e = emb(s, dir)
      val storePath = graft.sources.TidyIO.scratchDir("g_pqstore")
      val prefix = storePath.stripPrefix("/tmp/")
      Ann.writePqModel(e.filter(pmod(col("vec_id"), lit(5)) =!= 0),
        "vec_id", "embedding", prefix, m = 4, subDim = 16, k = 16,
        iters = 2, buckets = 8, path = Some(storePath))
      Ann.pqEncodeStored(e.filter(pmod(col("vec_id"), lit(5)) === 0),
          "vec_id", "embedding", prefix, m = 4, subDim = 16)
        .orderBy("vec_id")
    }),

    // L78a: ADC retrieval SERVED from the persisted model — the
    // model trains and writes once, the serving plan reads codebooks
    // + codes and trains nothing. Result contract identical to s12
    // (same corpus, same parameters, shared adcRank), so it reuses
    // s12's oracle verbatim; what s16 adds is DuckDB certifying the
    // whole train→write→read→serve path.
    "s16_pq_serve" -> ((s, dir) => {
      val e = emb(s, dir)
      val storePath = graft.sources.TidyIO.scratchDir("g_pqserve")
      val prefix = storePath.stripPrefix("/tmp/")
      Ann.writePqModel(e, "vec_id", "embedding", prefix, m = 4,
        subDim = 16, k = 16, iters = 2, buckets = 8, path = Some(storePath))
      Ann.pqAdcTopKStored(e.filter(col("vec_id") < 5), "vec_id", "embedding",
          prefix, kTop = 10, m = 4, subDim = 16)
        .orderBy("qid", "rnk")
    }),

    // L78b: the persisted IVFADC index served end-to-end — coarse
    // centroids, codebooks, and CELL-BUCKETED codes (the FAISS
    // inverted-list layout) written once; the serving query probes
    // stored centroids and ADC-scores only probed cells' codes.
    // Result contract identical to s14 → s14's oracle verbatim.
    "s17_ivfadc_serve" -> ((s, dir) => {
      val e = emb(s, dir)
      val storePath = graft.sources.TidyIO.scratchDir("g_ivfserve")
      val prefix = storePath.stripPrefix("/tmp/")
      Ann.writeIvfAdcIndex(e, e.filter(col("vec_id") < 16), "vec_id",
        "embedding", prefix, m = 4, subDim = 16, k = 16, iters = 2,
        buckets = 8, path = Some(storePath))
      Ann.ivfAdcTopKStored(e.filter(col("vec_id") < 5), "vec_id",
          "embedding", prefix, kTop = 10, nProbe = 4, m = 4, subDim = 16)
        .orderBy("qid", "rnk")
    }),

    // L79: residual-coded IVFADC (by_residual=true, the FAISS
    // default): PQ quantizes x − coarse_centroid(x), spending the
    // codebook budget on what the cell hasn't explained. Score is
    // exactly cos(query, c + r̂) via per-subspace decomposition —
    // fully oracle-replayed: coarse chain, residual formation, four
    // residual Lloyd chains, probes, term tables, ranking.
    "s18_ivfadc_residual" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.ivfAdcResidualTopK(e, e.filter(col("vec_id") < 5),
          e.filter(col("vec_id") < 16), "vec_id", "embedding",
          kTop = 10, nProbe = 4, m = 4, subDim = 16, k = 16, iters = 2)
        .orderBy("qid", "rnk")
    }),

    // L80: two-stage serving — the s14 IVFADC scan truncated at a
    // 30-deep shortlist, then an EXACT cosine re-rank of only those
    // 30 raw vectors per query (FAISS IndexRefineFlat). ADC
    // quantization error can misorder near-ties; the refine pass
    // recovers exact ordering while the corpus floats stay untouched
    // at query time (the fetch is a broadcast point-lookup of
    // |q|·30 ids). Fully oracle-replayed: s14's chain to rnk ≤ 30,
    // then the s01 exact-cosine kernel over the shortlist.
    "s19_ivfadc_rerank" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.ivfAdcRerankTopK(e, e.filter(col("vec_id") < 5),
          e.filter(col("vec_id") < 16), "vec_id", "embedding",
          kTop = 10, shortlist = 30, nProbe = 4, m = 4, subDim = 16,
          k = 16, iters = 2)
        .orderBy("qid", "rnk")
    }),

    // L73: PQ asymmetric-distance retrieval — queries (vec_id < 5)
    // score the whole corpus from CODES alone via per-subspace
    // lookup tables; the ADC score is exactly cos(query,
    // reconstruction), which the oracle replays.
    "s12_pq_adc" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.pqAdcTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          kTop = 10, m = 4, subDim = 16, k = 16, iters = 2)
        .orderBy("qid", "rnk")
    }),

    // L76: IVFADC — the composed billion-vector serving path: the
    // s03 coarse quantizer prunes candidates to each query's 4
    // nearest cells (of 16), and the s12 ADC lookup tables score
    // ONLY inside probed cells. Raw-vector codes (FAISS
    // by_residual=false), so the ADC score stays exactly
    // cos(query, reconstruction) and the whole composition —
    // quantizer, cells, codes, probes, ranking — replays in DuckDB.
    "s14_ivf_adc" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.ivfAdcTopK(e, e.filter(col("vec_id") < 5),
          e.filter(col("vec_id") < 16), "vec_id", "embedding",
          kTop = 10, nProbe = 4, m = 4, subDim = 16, k = 16, iters = 2)
        .orderBy("qid", "rnk")
    }),

    // L5b: per-label embedding centroid (class means / cluster
    // centers) — posexplode → one keyed agg on (label, dim); no
    // per-label collect_list, so a hot label can't OOM an executor.
    // Elements are quantized to 1e-6 before the mean: integer sums are
    // order-independent, so the distributed result is bit-reproducible
    // and the oracle replays it exactly.
    "s04_label_centroid" -> ((s, dir) => {
      // centroid_micro only: the exact integer micro-unit mean. The
      // display double would round at a .5 boundary whose half-up vs
      // half-even handling differs across engines (seen at sf0.1).
      Ann.labelCentroids(emb(s, dir), "embedding", "label")
        .select("label", "dim", "centroid_micro")
        .orderBy("label", "dim")
    }),

    // L21b: symmetric int8 quantization (the vector-store compaction
    // step): per-vector scale 127/max|v|, elementwise floor(v·s + ½).
    // Purely narrow — quantizing 100 TB of vectors is a map job. floor
    // instead of round so both engines hit the same IEEE operation.
    // The quantized vector is emitted as a comma-joined string: the
    // driver's pandas comparator can't sort/hash array cells.
    "s05_quantize" -> ((s, dir) => {
      emb(s, dir)
        .select(col("vec_id"),
          transform(col("embedding"), v => v.cast("double")).as("v"))
        .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
        .withColumn("scale",
          when(col("mx") > 0, lit(127.0) / col("mx")).otherwise(lit(0.0)))
        .select(col("vec_id"), round(col("scale"), 6).as("scale"),
          array_join(transform(col("v"),
            x => floor(x * col("scale") + lit(0.5)).cast("int").cast("string")), ",")
            .as("q"))
        .orderBy("vec_id")
    }),

    // L83: int8 MIPS retrieval — serving from s05's quantization:
    // integer dot product over the 4×-smaller codes, one float
    // descale after. Exact-integer core + deterministic scales →
    // fully oracle-replayed; zero vectors score NULL (s01's
    // convention).
    "s20_int8_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.int8TopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
        .orderBy("qid", "rnk")
    }),

    // L118/s26: per-label embedding CENTROID DRIFT between two
    // corpus snapshots — the embedding-space monitoring tier next to
    // s24's diversity dashboard (a recrawl, a new encoder version,
    // or a domain shift moves class centroids long before top-k
    // recall visibly degrades): both snapshots' per-(label, dim)
    // means computed in s04's EXACT integer micro units (quantized
    // sums are order-independent BIGINTs — no float-fold anywhere),
    // drift = Σ_dims (μA − μB)² in micro² — pure BIGINT end to end,
    // so the statistic replays bit-for-bit. Shape: two
    // label×dim-sized aggregates + one equi-join on (label, dim) +
    // a per-label fold — snapshot scans are the only corpus-sized
    // work, exactly two narrow passes.
    // L129/s27: ANN RECALL AUDIT — the index-quality dashboard a
    // production vector store runs next to its serving index (Faiss's
    // recall@k benchmark as a pipeline operator): the EXACT
    // brute-force top-k (s01's arm) joined against the SERVED IVF
    // top-k (s03's arm) per query → hits and recall@10. A recall
    // regression after a re-train/re-shard lands here before it lands
    // in retrieval quality. Scale: the exact arm is the audit's cost
    // (corpus × query-sample — run it on a SAMPLE of queries, the
    // served arm stays corpus·nProbe/nCells); the join is
    // query×k-sized, negligible.
    "s27_ann_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 5)
      val exact = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
        .select(col("qid"), col("vec_id"))
      val served = Ann.ivfTopKExact(e, q, e.filter(col("vec_id") < 16),
          "vec_id", "embedding", k = 10, nProbe = 4, iters = 2)
        .select(col("qid"), col("vec_id"), lit(1L).as("h"))
      exact.join(served, Seq("qid", "vec_id"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("h"), lit(0L))).as("hits"))
        .select(col("qid"), col("hits"),
          round(col("hits") / lit(10.0), 4).as("recall"))
        .orderBy("qid")
    }),

    "s26_centroid_drift" -> ((s, dir) => {
      val e = emb(s, dir)
      def half(r: Long) = Ann.labelCentroids(
          e.filter(pmod(col("vec_id"), lit(2L)) === r), "embedding", "label")
        .select(col("label"), col("dim"),
          col("centroid_micro").as(s"m$r"))
      val counts = e.groupBy("label")
        .agg(sum(when(pmod(col("vec_id"), lit(2L)) === 0L, 1L).otherwise(0L))
            .as("n_a"),
          sum(when(pmod(col("vec_id"), lit(2L)) === 1L, 1L).otherwise(0L))
            .as("n_b"))
      half(0L).join(half(1L), Seq("label", "dim"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_dims"),
          sum((col("m0") - col("m1")) * (col("m0") - col("m1")))
            .as("drift_sq_micro"))
        .join(counts, Seq("label"))
        .select(col("label"), col("n_a"), col("n_b"), col("n_dims"),
          col("drift_sq_micro"))
        .orderBy("label")
    }),

    // L116/s25: per-DIMENSION scalar quantization + code-space
    // retrieval — FAISS ScalarQuantizer QT_8bit, the TRAINED tier
    // above s05/s20's zero-state per-vector scaling: per-dim
    // (vmin, vmax) learned from the corpus (a dim-sized model, the
    // PQ-codebook class), every coordinate encoded to one byte, and
    // top-k served by INTEGER L2 over the codes — exact BIGINT
    // arithmetic end to end, so the ranking replays bit-for-bit
    // (constant dims encode to 0 on both sides; clamped floor
    // boundaries are identical doubles).
    "s25_sq8_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.sq8TopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10)
        .orderBy("qid", "rnk")
    }),

    // L89: FILTERED vector search — top-k under a metadata predicate
    // (label ≡ 1 mod 4) served from the s03 index built on the FULL
    // corpus: candidates prune to probed cells, the predicate cuts
    // INSIDE the cells before scoring (pre-filter, not the
    // fewer-than-k-prone post-filter). Fully oracle-replayed.
    "s23_filtered_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.ivfFilteredTopK(e, e.filter(col("vec_id") < 5),
          e.filter(col("vec_id") < 16), "vec_id", "embedding",
          pred = pmod(col("label"), lit(4)) === 1,
          k = 10, nProbe = 4, iters = 2)
        .orderBy("qid", "rnk")
    }),

    // L85: truncated-dimension retrieval + exact re-rank — the
    // Matryoshka/MRL serving shape: stage 1 ranks by cosine over the
    // FIRST 16 of 64 coordinates (a prefix-sliced store scans 1/4 of
    // the float bytes), stage 2 re-scores the 30-deep shortlist with
    // the exact full-dim cosine (s19's point-lookup fetch). Zero
    // trained state — nothing to retrain on corpus drift; both
    // stages are the certified float-fold kernel, so the whole
    // composition replays value-for-value.
    "s21_trunc_rerank" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.truncRerankTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          kTop = 10, dPrefix = 16, shortlist = 30)
        .orderBy("qid", "rnk")
    }),

    // L86: 1-bit sign Hamming retrieval + exact re-rank — the binary-
    // hashing extreme of the compression family (s05 int8 → s11 PQ →
    // 2 longs/vector here): xor+popcount candidate scan over 16 B
    // codes, 30-deep shortlist, exact cosine re-rank. All-integer
    // stage 1 → fully oracle-replayed.
    "s22_sign_hamming" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.signHammingTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          kTop = 10, shortlist = 30)
        .orderBy("qid", "rnk")
    }),

    // L96/s24: embedding diversity — mean PAIRWISE inner product per
    // label WITHOUT pair enumeration, via the sum-vector identity
    // Σ_{i≠j} vᵢ·vⱼ = ‖Σv‖² − Σ‖v‖² (the representation-collapse /
    // dedup-potential dashboard: a mean pair dot near the mean square
    // norm means the corpus has collapsed to near-duplicates). The
    // O(n²) pair sum computed by ONE linear pass: vectors quantize to
    // 1e-6 integer space (the s10 convention) so both Σ-terms are
    // EXACT integer aggregates — order-independent under any
    // partitioning — combined in DECIMAL(38,0)/HUGEINT and divided
    // once at the end (half-up 6 dp in the shared double formula).
    // n=1 groups report NULL pair dot (no pairs), mirrored.
    "s24_embed_diversity" -> ((s, dir) => {
      val e = emb(s, dir).select(col("label"),
        transform(col("embedding"),
          v => floor(v.cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))
          .as("q"))
      def hup6(x: org.apache.spark.sql.Column) =
        floor(x * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
      val base = e
        .withColumn("sq", aggregate(col("q"), lit(0L), (a, x) => a + x * x))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(col("sq").cast("decimal(38,0)")).as("sumsq"))
      val s2 = e.select(col("label"), posexplode(col("q")).as(Seq("d", "qv")))
        .groupBy("label", "d").agg(sum("qv").as("sd"))
        .groupBy("label")
        .agg(sum(col("sd").cast("decimal(38,0)") * col("sd").cast("decimal(38,0)"))
          .as("ssq"))
      base.join(s2, Seq("label"))
        .select(col("label"), col("n"),
          hup6((col("sumsq").cast("double") / col("n").cast("double"))
            / lit(1.0e12)).as("mean_sq_norm"),
          when(col("n") > 1,
            hup6(((col("ssq") - col("sumsq")).cast("double")
              / (col("n") * (col("n") - 1L)).cast("double")) / lit(1.0e12)))
            .as("mean_pair_dot"))
        .orderBy("label")
    }),

    // L26: one-pass PCA — VecStatsAgg collects count/sum/Gram in a
    // single tree-reduced aggregate, the d×d eigenproblem solves on
    // the driver (Jacobi), and the projection is a narrow codegen'd
    // constant-plane dot product. Eigenvector sign/last-ulp jitter is
    // run-dependent (parallel double summation) → rows-only check;
    // PcaSpec pins the geometry (orthonormality, variance order,
    // known principal direction).
    "s06_pca_project" -> ((s, dir) => {
      import graft.operators.Pca
      val e = emb(s, dir)
      val model = Pca.fit(e, col("embedding"), EmbDim, k = 2)
      Pca.project(e, col("embedding"), model)
        .select(col("vec_id"), col("label"),
          round(col("pc1"), 4).as("pc1"), round(col("pc2"), 4).as("pc2"))
        .orderBy("vec_id")
    }),

    // L46: Johnson–Lindenstrauss sign projection — data-independent
    // 64-d float → 8-d double reduce (±1/√k planes regenerable from
    // (d, k) alone), the narrow pre-reduce in front of ANN at scale.
    // Bit-identical across engines: exact float→double casts, fixed
    // accumulation order (ProjectPlanes ↔ the oracle's ordered fold).
    "s07_jl_project" -> ((s, dir) => {
      Ann.jlProject(emb(s, dir), "vec_id", "embedding", EmbDim, k = 8)
        .orderBy("vec_id")
    }),

    // L51: nearest-seed cluster assignment — the Voronoi/cluster
    // stage of SemDeDup-style curation and of IVF index builds:
    // seeds (vec_id < 8) broadcast, one corpus pass scores, a
    // map-side-combinable groupBy argmax assigns (ties → lowest
    // seed). Raw-double comparisons → engine-exact assignment.
    "s08_cluster_assign" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.assignToSeeds(e, e.filter(col("vec_id") < 8), "vec_id", "embedding")
        .orderBy("vec_id")
    }),

    // L58: oracle-exact Lloyd refinement — two assign→update rounds
    // from the vec_id<8 seeds; the argmax and the 1e-6-quantized
    // integer centroid means make every round engine-exact (the s08 +
    // s04 determinism patterns composed into an iterative ML loop).
    "s10_kmeans_refine" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.lloydIterate(e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
          iters = 2)
        .orderBy("vec_id")
    }),

    // L29: SemDeDup-style semantic dedup end-to-end — embedding
    // cosine pairs (label-blocked) → connected components → canonical
    // representative (cluster min id) per non-singleton member. The
    // full composition a semantic-dedup pipeline runs, as one query.
    "d12_semantic_keep" -> ((s, dir) => {
      import graft.operators.ConnectedComponents
      val pairs = Ann.cosinePairs(emb(s, dir), "vec_id", "embedding", "label",
        threshold = 0.3)
      val cc = ConnectedComponents.minLabel(pairs.select("id_a", "id_b"))
      val sizes = cc.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
      cc.join(sizes, "cluster")
        .select(col("id").as("vec_id"), col("cluster").as("keep_id"),
          col("cluster_size"))
        .orderBy("keep_id", "vec_id")
    }),

    // L59: hybrid retrieval fusion — the RAG/eval-retrieval shape: a
    // BM25 lexical arm (t23's scorer) and an embedding-cosine
    // semantic arm (query = vector 0, doc_id ↔ vec_id), each cut to
    // its top-100 by a TOTAL order (score desc, id), fused by
    // Reciprocal Rank Fusion (Cormack et al., SIGIR'09:
    // Σ 1/(60+rank)). Scale shape: each arm ends in a global
    // sort-limit (TakeOrdered — no full-corpus window); ranking and
    // fusion then run on the ≤100-row tops. rrf is reported in
    // half-up micro-units; the fusion sum is two IEEE divisions and
    // one addition of bit-equal inputs, so the order is engine-exact.
    "t29_rrf_hybrid" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val lexTop = TextStats.bm25(
          docs(s, dir).select(col("doc_id").cast("long").as("doc_id"), col("text")),
          "doc_id", "text", terms = Seq("dup", "spark", "merge"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(100)
      val lexR = lexTop
        .withColumn("lex_rank",
          row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
        .select("doc_id", "lex_rank")
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qemb"))
      val semTop = e.crossJoin(broadcast(q))
        .withColumn("c", GraftFunctions.cosine_sim(col("embedding"), col("qemb")))
        .select(col("vec_id").as("doc_id"), col("c"))
        .orderBy(col("c").desc_nulls_last, col("doc_id")).limit(100)
      val semR = semTop
        .withColumn("sem_rank",
          row_number().over(Window.orderBy(col("c").desc_nulls_last, col("doc_id"))))
        .select("doc_id", "sem_rank")
      val fused = lexR.join(semR, Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("sem_rank")), lit(0.0)))
      fused.orderBy(col("rrf").desc, col("doc_id")).limit(20)
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("rrf").desc, col("doc_id"))))
        .select(col("rnk"), col("doc_id"), col("lex_rank"), col("sem_rank"),
          floor(col("rrf") * lit(1e6) + lit(0.5)).cast("long").as("rrf_micro"))
    }),

    // L12: multimodal blob features — SQL-expressible part (octet
    // length, md5, prefix) with a DuckDB oracle …
    "m01_blob_features" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("blob", encode(col("text"), "UTF-8"))
        .select(
          col("doc_id"),
          length(col("blob")).as("n_bytes"),
          md5(col("blob")).as("blob_md5"),
          upper(hex(expr("substring(blob, 1, 4)"))).as("prefix_hex"))
        .orderBy("doc_id")
    }),

    // … and the batched mapPartitions decode path. The stub decoder is
    // deterministic arithmetic over the payload bytes, so the oracle
    // replicates it exactly (ASCII text: ord(char) == byte).
    "m02_blob_decode" -> ((s, dir) => {
      Multimodal.decodeFeatures(Multimodal.blobsFromDocuments(docs(s, dir)))
        .toDF()
        .orderBy("doc_id")
    }),

    // L48: frame-sample manifest — every 4th 16-byte "frame" of each
    // payload with offset + digest (the sampled-decode work list; the
    // codec consumes the manifest, the plumbing is the deliverable).
    // Purely narrow, like m03.
    "m04_frame_sample" -> ((s, dir) => {
      Multimodal.frameSampleManifest(
          docs(s, dir).select(col("doc_id"),
            encode(col("text"), "UTF-8").as("blob")),
          "doc_id", frameBytes = 16, stride = 4)
        .orderBy("doc_id", "sample_id")
    }),

    // L63: real-codec roundtrip audit — deterministic 8×8 RGB images
    // ENCODED through the JDK's real PNG writer and DECODED back
    // through the production decodeImage path; the oracle replays the
    // pixel FORMULA (PNG is lossless), certifying the whole binary
    // encode→decode plumbing value-for-value without DuckDB needing a
    // codec.
    "m05_image_roundtrip" -> ((s, dir) => {
      val s2 = s
      import s2.implicits._
      val ids = docs(s, dir)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").cast("long")).distinct().as[java.lang.Long]
      Multimodal.imageRoundtripStats(ids).orderBy("doc_id")
    }),

    // L68: real-codec resize — decode the deterministic PNG through
    // the production path, nearest-neighbor 8×8 → 4×4 (pure index
    // math, the only float-free resampling kernel), emit resized luma
    // stats. The oracle replays the pixel formula AT THE SAMPLED
    // coordinates, certifying decode+resize end-to-end like m05
    // certifies encode+decode.
    "m06_image_resize" -> ((s, dir) => {
      val s2 = s
      import s2.implicits._
      val ids = docs(s, dir)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").cast("long")).distinct().as[java.lang.Long]
      Multimodal.imageResizeStats(ids, side = 8, outSide = 4).orderBy("doc_id")
    }),

    // L87: ViT-style patchify over the real-codec decode — per-patch
    // integer luma sum/min/max on the 4×4 tile grid; the oracle
    // replays the pixel formula grouped by patch coordinates, so a
    // tiling off-by-one is a hash mismatch. Zero shuffle.
    "m09_image_patches" -> ((s, dir) => {
      val s2 = s
      import s2.implicits._
      val ids = docs(s, dir)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").cast("long")).distinct().as[java.lang.Long]
      Multimodal.imagePatchStats(ids, side = 8, patch = 4)
        .orderBy("doc_id", "patch_row", "patch_col")
    }),

    // L109/m14: perceptual-hash image near-dup (the LAION image-dedup
    // pass): controlled duplicate groups — id div 4 shares the
    // picture, id mod 4 perturbs one pixel (re-encoded/edited copies)
    // — REAL-codec decoded, aHashed (integer mean comparison), 4×16-
    // bit multi-index bands (pigeonhole-exact candidates for
    // Hamming ≤ 3), exact xor+bit_count verify. Oracle replays the
    // PIXEL FORMULA (no codec): luma grid → aHash bands → the same
    // band join — a decode bug, a hash-bit off-by-one or a banding
    // slip is a hash mismatch. Zero-shuffle hashing; the self-join
    // shuffles 4 longs per image.
    "m14_image_neardup" -> ((s, dir) => {
      val s2 = s
      import s2.implicits._
      val ids = docs(s, dir)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").cast("long")).distinct().as[java.lang.Long]
      Multimodal.imageNearDupPairs(ids, side = 8, maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // L112/m15: DCT pHash near-dup — the robust perceptual tier
    // above m14's aHash: same real-codec decode + formula corpus +
    // multi-index banding, hash = SIGN of each 8×8 DCT-II
    // coefficient in exact fixed-point integer arithmetic (9-literal
    // cosine table ×10⁴; α normalization dropped — it never changes
    // a sign). The 63 non-DC bits are brightness/contrast-shift
    // invariant by integer identity (PHashSpec), where aHash's mean
    // threshold flips en masse. Oracle replays pixel formula → the
    // same cosine literals → separable row/column integer DCT →
    // sign bits → band join: no codec, no floating point.
    "m15_phash_neardup" -> ((s, dir) => {
      val s2 = s
      import s2.implicits._
      val ids = docs(s, dir)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").cast("long")).distinct().as[java.lang.Long]
      Multimodal.imagePHashNearDupPairs(ids, side = 8, maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // L113/m16: windowed SPECTRAL features over the real-codec audio
    // decode — the dominant-frequency front end (pitch/tone tracking,
    // DTMF/whistle detection; the spectral half of VAD): per
    // 16-sample frame, an integer 16-point DFT power spectrum over
    // bins 1..8 using the 16-literal fixed-point cosine table (the
    // m15 discipline on the audio tier; sin indexes the same table
    // shifted 12), dominant bin by power with ties → lowest k. All
    // quantities Long-exact, so the oracle replays sample formula →
    // table → powers → argmax bit-for-bit. Zero-shuffle map job.
    "m16_audio_spectral" -> ((s, dir) => {
      val s2 = s
      import s2.implicits._
      val ids = docs(s, dir)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").cast("long")).distinct().as[java.lang.Long]
      Multimodal.audioSpectralFeatures(ids, n = 512, stride = 64)
        .orderBy("doc_id", "win_id")
    }),

    // L91: scene-cut detection — 6 formula frames per doc through
    // the real PNG codec, integer SAD detector (|Δ luma sum| > 3000),
    // per-doc cut count + first cut; oracle replays frame sums + lag.
    "m10_scene_cuts" -> ((s, dir) => {
      val s2 = s
      import s2.implicits._
      val ids = docs(s, dir)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").cast("long")).distinct().as[java.lang.Long]
      Multimodal.sceneCuts(ids, side = 8, nFrames = 6, threshold = 3000L)
        .orderBy("doc_id")
    }),

    // L93: energy-threshold VAD segmentation — non-overlapping
    // 32-sample windows over the real-codec decode, active iff
    // integer energy > threshold·win, consecutive active windows
    // merged to segments; oracle replays formula → energies →
    // threshold → islands.
    "m11_vad_segments" -> ((s, dir) => {
      val s2 = s
      import s2.implicits._
      val ids = docs(s, dir)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").cast("long")).distinct().as[java.lang.Long]
      Multimodal.vadSegments(ids, n = 512, win = 32)
        .orderBy("doc_id", "seg_id")
    }),

    // L101/m12: multipart INTEGRITY audit — the download-side twin of
    // m03's upload manifest (every blob store's multipart protocol:
    // fetch parts by offset, reassemble in part order, digest-check
    // against the manifest's whole-object hash): chunks re-emitted by
    // the m03 grid, reassembled via an ordered fold, and the
    // reassembled digest compared to the original — a chunk-boundary
    // or ordering bug flips `intact` AND hash-differs. Hex-string
    // convention throughout (the m03 precedent: byte-exact without
    // binary-type comparisons). Distinct (doc_id, text) base — the
    // streaming-ingest dup-row contract.
    "m12_blob_integrity" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
          col("text")).distinct()
        .withColumn("h", hex(encode(col("text"), "UTF-8")))
        .filter(length(col("h")) > 0)
      val chunks = d.select(col("doc_id"), col("h"),
          posexplode(expr("sequence(1L, CAST(length(h) / 2 AS BIGINT), 64L)"))
            .as(Seq("cid", "off")))
        .select(col("doc_id"), col("h"), col("cid").cast("long").as("cid"),
          expr("substring(h, 2 * off - 1, 128)").as("p"))
      chunks.groupBy("doc_id", "h")
        .agg(count(lit(1)).as("n_chunks"),
          array_join(transform(
            sort_array(collect_list(struct(col("cid"), col("p")))),
            x => x.getField("p")), "").as("rh"))
        .select(col("doc_id"), col("n_chunks"),
          (length(col("h")) / 2).cast("long").as("n_bytes"),
          (md5(col("rh")) === md5(col("h"))).as("intact"),
          md5(col("h")).as("blob_md5"))
        .orderBy("doc_id", "blob_md5")
    }),

    // L104/m13: WebDataset tar-shard ingest — the container format
    // multimodal corpora ship in: (key.txt, key.json) members packed
    // into ustar shards by TarShards.write (hash-sharded, name-sorted,
    // byte-deterministic), read back through the binaryFile→offset-
    // math parser, and reassembled per sample key (the WebDataset
    // grouping). DRIVER-VERIFIED real IO: the tars are written and
    // re-parsed inside the query (the q53/s15 certification pattern),
    // and every output value — per-member md5 (m03's hex convention),
    // byte counts, member counts, shard assignment — is replayed by
    // the oracle from the raw table + the portable-hash shard formula.
    // Real binary members (PNG) ride the same writer in TarShardsSpec;
    // the query keeps to text members so the oracle stays exact.
    // Scale shape: write is one linear shuffle (hash-partition on
    // shard, in-task serialization); read is a zero-shuffle map over
    // shard files; the groupBy is sample-cardinality.
    "m13_tar_shards" -> ((s, dir) => {
      val tmp = graft.sources.TidyIO.scratchDir("graft_tar_shards")
      graft.sources.TarShards.write(
        tarCorpusEntries(s, dir), "shard", "name", "payload", tmp)
      tarSampleStats(graft.sources.TarShards.read(s, tmp)).orderBy("doc_id")
    }),

    // L69: real-codec audio roundtrip — the deterministic PCM16
    // signal through the JDK's actual WAV encoder+decoder
    // (javax.sound), integer sample stats replayed by the oracle
    // formula; m05's certification contract applied to audio.
    "m07_audio_roundtrip" -> ((s, dir) => {
      val s2 = s
      import s2.implicits._
      val ids = docs(s, dir)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").cast("long")).distinct().as[java.lang.Long]
      Multimodal.audioRoundtripStats(ids).orderBy("doc_id")
    }),

    // L82: windowed audio features over the REAL-codec decode — the
    // ASR/VAD front end: 64-sample windows every 32, per-window
    // integer energy/zero-crossings/peak + exact-quotient rms. The
    // oracle replays the integer PCM formula and the windowing, so a
    // codec bug or framing off-by-one hash-differs.
    "m08_audio_features" -> ((s, dir) => {
      val s2 = s
      import s2.implicits._
      val ids = docs(s, dir)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").cast("long")).distinct().as[java.lang.Long]
      Multimodal.audioWindowFeatures(ids).orderBy("doc_id", "win_id")
    }),

    // L12b: multipart blob layout — chunk each media payload into
    // fixed 64-byte parts with offsets and per-part digests (the
    // manifest a blob store / multipart upload needs; also how >2 GB
    // media rows shard across parquet row groups). Purely narrow:
    // posexplode over the offset sequence, substring + md5 per part —
    // chunking 100 TB of media is a map job.
    // Zero-byte payloads have no chunks (and would crash sequence(1,0)
    // under ANSI); digests are md5 of the chunk's HEX encoding — the
    // one byte-exact digest both engines can compute (DuckDB's md5
    // cannot digest BLOBs, and an arbitrary byte slice is not valid
    // UTF-8, so md5-of-VARCHAR can't stand in).
    "m03_blob_chunks" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("blob", encode(col("text"), "UTF-8"))
        .filter(length(col("blob")) > 0)
        .select(col("doc_id"), col("blob"),
          posexplode(sequence(lit(1), length(col("blob")), lit(64)))
            .as(Seq("chunk_id", "off")))
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          (col("off") - 1).cast("long").as("byte_offset"),
          length(expr("substring(blob, off, 64)")).cast("long").as("n_bytes"),
          md5(hex(expr("substring(blob, off, 64)"))).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    })
  )

  /** Ascending left-fold from 0.0 — the same op order as the scalar
    * loops in CosineSim/SrpCode, so doubles match bit-for-bit.
    */
  private def foldSum(listExpr: String): String =
    s"list_reduce(list_prepend(0.0, $listExpr), (fx, fy) -> fx + fy)"

  private def dotSql(a: String, b: String, dim: Int): String =
    foldSum(s"list_transform(range(1, ${dim + 1}), li -> ($a)[li] * ($b)[li])")

  /** CosineSim.compute mirrored: dot / (sqrt(na) * sqrt(nb)). */
  private def cosSql(a: String, b: String, dim: Int): String =
    s"(${dotSql(a, b, dim)} / (sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)})))"

  /** One PQ sub-quantizer replay (subspace `s`, 16-dim slice): the
    * s03/s10 Lloyd template — seed cells vec_id < 16, cosine argmax
    * via row_number, quantized-integer centroid means, FLOAT-folded
    * rebuild, reassign. Exposes a2_s (final assignment) and sd1_s
    * (rebuilt centroids); shared by the s11/s12 oracles.
    */
  private def pqChainSql(s: Int): String = pqChainSql(s, "")

  /** `srcFilter` restricts the TRAINING rows (s13's incremental form
    * trains on the corpus split only; "" trains on everything);
    * `srcRel` names the (vec_id, de) relation the chain trains on
    * ("e" = raw embeddings; s18 passes its residual CTE).
    */
  private def pqChainSql(s: Int, srcFilter: String,
                         srcRel: String = "e"): String = {
    val lo = s * 16 + 1; val hi = s * 16 + 16
    s"""es_$s AS (SELECT vec_id, de[$lo:$hi] AS se FROM $srcRel $srcFilter),
       | sd0_$s AS (SELECT vec_id AS cell, se FROM es_$s WHERE vec_id < 16),
       | sc1_$s AS (SELECT es_$s.vec_id, sd0_$s.cell,
       |            ${cosSql(s"es_$s.se", s"sd0_$s.se", 16)} AS c
       |          FROM es_$s, sd0_$s),
       | r1_$s AS (SELECT vec_id, cell,
       |           row_number() OVER (PARTITION BY vec_id
       |             ORDER BY c DESC, cell) AS rn
       |         FROM sc1_$s),
       | a1_$s AS (SELECT vec_id, cell FROM r1_$s WHERE rn = 1),
       | x1_$s AS (SELECT a1_$s.cell, di.i AS dim,
       |           CAST(floor(es_$s.se[di.i] * 1000000.0 + 0.5) AS BIGINT) AS qv
       |         FROM es_$s JOIN a1_$s USING (vec_id),
       |           (SELECT unnest(range(1, 17)) AS i) di),
       | g1_$s AS (SELECT cell, dim, CAST(sum(qv) AS BIGINT) AS sq,
       |           CAST(count(*) AS BIGINT) AS n
       |         FROM x1_$s GROUP BY cell, dim),
       | c1_$s AS (SELECT cell, dim,
       |           (sq - (((sq % n) + n) % n)) // n AS cm
       |         FROM g1_$s),
       | sd1_$s AS (SELECT cell,
       |           CAST(CAST(list(CAST(cm AS DOUBLE) / 1000000.0 ORDER BY dim)
       |             AS FLOAT[]) AS DOUBLE[]) AS se
       |         FROM c1_$s GROUP BY cell),
       | sc2_$s AS (SELECT es_$s.vec_id, sd1_$s.cell,
       |            ${cosSql(s"es_$s.se", s"sd1_$s.se", 16)} AS c
       |          FROM es_$s, sd1_$s),
       | r2_$s AS (SELECT vec_id, cell,
       |           row_number() OVER (PARTITION BY vec_id
       |             ORDER BY c DESC, cell) AS rn
       |         FROM sc2_$s),
       | a2_$s AS (SELECT vec_id, cell FROM r2_$s WHERE rn = 1)""".stripMargin
  }

  /** The s03 coarse-quantizer replay (seeds = vec_id < 16, one
    * quantized-integer centroid update, FLOAT-folded rebuild,
    * reassign): exposes `sd1` (rebuilt coarse centroids) and `a2`
    * (final cell per vector). Shared verbatim by the s03 and s14
    * oracles — the composition MUST replay the identical quantizer.
    */
  private def coarseChainSql: String =
    s"""sd0 AS (SELECT vec_id AS cell, de AS se FROM e WHERE vec_id < 16),
       | sc1 AS (SELECT e.vec_id, sd0.cell,
       |           ${cosSql("e.de", "sd0.se", 64)} AS c
       |         FROM e, sd0),
       | r1 AS (SELECT vec_id, cell,
       |          row_number() OVER (PARTITION BY vec_id
       |            ORDER BY c DESC, cell) AS rn
       |        FROM sc1),
       | a1 AS (SELECT vec_id, cell FROM r1 WHERE rn = 1),
       | x1 AS (SELECT a1.cell, di.i AS dim,
       |          CAST(floor(e.de[di.i] * 1000000.0 + 0.5) AS BIGINT) AS qv
       |        FROM e JOIN a1 USING (vec_id),
       |          (SELECT unnest(range(1, 65)) AS i) di),
       | g1 AS (SELECT cell, dim, CAST(sum(qv) AS BIGINT) AS sq,
       |          CAST(count(*) AS BIGINT) AS n
       |        FROM x1 GROUP BY cell, dim),
       | c1 AS (SELECT cell, dim,
       |          (sq - (((sq % n) + n) % n)) // n AS cm
       |        FROM g1),
       | sd1 AS (SELECT cell,
       |          CAST(CAST(list(CAST(cm AS DOUBLE) / 1000000.0 ORDER BY dim)
       |            AS FLOAT[]) AS DOUBLE[]) AS se
       |        FROM c1 GROUP BY cell),
       | sc2 AS (SELECT e.vec_id, sd1.cell,
       |           ${cosSql("e.de", "sd1.se", 64)} AS c
       |         FROM e, sd1),
       | r2 AS (SELECT vec_id, cell,
       |          row_number() OVER (PARTITION BY vec_id
       |            ORDER BY c DESC, cell) AS rn
       |        FROM sc2),
       | a2 AS (SELECT vec_id, cell FROM r2 WHERE rn = 1)""".stripMargin

  /** The 4-way code join over the chains' final assignments. */
  private val pqCodesCte: String =
    """codes AS (SELECT a2_0.vec_id,
      |             a2_0.cell AS c_0, a2_1.cell AS c_1,
      |             a2_2.cell AS c_2, a2_3.cell AS c_3
      |           FROM a2_0 JOIN a2_1 USING (vec_id)
      |             JOIN a2_2 USING (vec_id) JOIN a2_3 USING (vec_id))""".stripMargin

  /** SrpCode mirrored: bit p = [dot(e, w_p) > 0], planes emitted as
    * DOUBLE[] literals from the same seeded generator.
    */
  private def srpCodeSql(e: String, nPlanes: Int, dim: Int): String = {
    val planes = Ann.hyperplanes(nPlanes, dim)
    (0 until nPlanes).map { p =>
      val w = planes(p).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
      s"(CASE WHEN ${dotSql(e, w, dim)} > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Shared defensive embeddings CTE mirroring [[emb]]: BIGINT ids,
    * elements through a FLOAT fold, dim-[[EmbDim]] quarantine, plus
    * the squared norm `n2` for zero-vector guards. A sum of squares
    * is 0 iff every element is 0 — in ANY accumulation order — so
    * the guard is order-independent. Zero-norm cosines must be
    * guarded to NULL explicitly: DuckDB's list_cosine_similarity
    * returns -1.0 for a zero vector while the Spark kernel
    * (CosineSim.compute) returns NULL.
    */
  private val embSql: String =
    s"""SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(label AS BIGINT) AS label,
       |    CAST(CAST(embedding AS FLOAT[]) AS DOUBLE[]) AS de,
       |    ${foldSum(s"list_transform(CAST(CAST(embedding AS FLOAT[]) AS DOUBLE[]), fz -> fz * fz)")} AS n2
       |  FROM embeddings WHERE len(embedding) = $EmbDim""".stripMargin

  // s15 runs write-model → encode-batch with s13's exact parameters —
  // the RESULT contract is identical (the stored codebooks ARE s13's
  // trained centroids, the encode its frozen argmax), so its oracle
  // is s13's verbatim; what s15 adds is DuckDB certifying the whole
  // train→write→read→encode path (the d29/q53 promotion pattern).
  val oracle: Map[String, String] = oracleBase ++ Map(
    "s15_pq_store" -> oracleBase("s13_pq_incremental"),
    // s16/s17 serve from the persisted model/index with s12/s14's
    // exact corpus + parameters — identical result contracts, so
    // their oracles are s12's/s14's verbatim; the queries add DuckDB
    // certification of the train→write→read→serve path.
    "s16_pq_serve" -> oracleBase("s12_pq_adc"),
    "s17_ivfadc_serve" -> oracleBase("s14_ivf_adc"))

  private lazy val oracleBase: Map[String, String] = Map(
    // s07: the same ±1/√k plane literals (regenerated from (d, k)),
    // dot products via the ordered fold — bit-identical doubles.
    "s07_jl_project" -> {
      val planes = Ann.jlPlanes(64, 8)
      val cols = (0 until 8).map { j =>
        val w = planes(j).map(_.toString).mkString("[", ", ", "]")
        s"${dotSql("de", w, 64)} AS p${j + 1}"
      }
      s"WITH e AS ($embSql)\nSELECT vec_id, ${cols.mkString(", ")} FROM e ORDER BY vec_id"
    },

    // s08: same double-fold cosine kernel as s01/s02; the argmax
    // replays as row_number over (cos DESC, seed) on RAW doubles.
    "s08_cluster_assign" ->
      s"""WITH e AS ($embSql),
         | sd AS (SELECT vec_id AS cluster, de AS se FROM e WHERE vec_id < 8),
         | scored AS (SELECT e.vec_id, sd.cluster,
         |              ${cosSql("e.de", "sd.se", 64)} AS c
         |            FROM e, sd),
         | r AS (SELECT vec_id, cluster, c,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY c DESC, cluster) AS rn
         |       FROM scored)
         |SELECT vec_id, cluster, round(c, 4) AS cos
         |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // s10: both Lloyd rounds replayed as chained CTEs — assignment
    // via the cosSql kernel + row_number (the s08 pattern), centroid
    // update via 1e-6 BIGINT floor-division means (the s04 pattern),
    // rebuilt centroids ordered by dim and FLOAT-folded exactly like
    // stored embeddings.
    "s10_kmeans_refine" ->
      s"""WITH e AS ($embSql),
         | sd0 AS (SELECT vec_id AS cluster, de AS se FROM e WHERE vec_id < 8),
         | sc1 AS (SELECT e.vec_id, sd0.cluster,
         |           ${cosSql("e.de", "sd0.se", 64)} AS c
         |         FROM e, sd0),
         | r1 AS (SELECT vec_id, cluster,
         |          row_number() OVER (PARTITION BY vec_id
         |            ORDER BY c DESC, cluster) AS rn
         |        FROM sc1),
         | a1 AS (SELECT vec_id, cluster FROM r1 WHERE rn = 1),
         | x1 AS (SELECT a1.cluster, di.i AS dim,
         |          CAST(floor(e.de[di.i] * 1000000.0 + 0.5) AS BIGINT) AS qv
         |        FROM e JOIN a1 USING (vec_id),
         |          (SELECT unnest(range(1, 65)) AS i) di),
         | g1 AS (SELECT cluster, dim, CAST(sum(qv) AS BIGINT) AS sq,
         |          CAST(count(*) AS BIGINT) AS n
         |        FROM x1 GROUP BY cluster, dim),
         | c1 AS (SELECT cluster, dim,
         |          (sq - (((sq % n) + n) % n)) // n AS cm
         |        FROM g1),
         | sd1 AS (SELECT cluster,
         |          CAST(CAST(list(CAST(cm AS DOUBLE) / 1000000.0 ORDER BY dim)
         |            AS FLOAT[]) AS DOUBLE[]) AS se
         |        FROM c1 GROUP BY cluster),
         | sc2 AS (SELECT e.vec_id, sd1.cluster,
         |           ${cosSql("e.de", "sd1.se", 64)} AS c
         |         FROM e, sd1),
         | r2 AS (SELECT vec_id, cluster, c,
         |          row_number() OVER (PARTITION BY vec_id
         |            ORDER BY c DESC, cluster) AS rn
         |        FROM sc2)
         |SELECT vec_id, cluster, round(c, 4) AS cos
         |FROM r2 WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // s03: full IVF replay — the s10 quantizer chain (seed, assign,
    // quantized-integer centroid update, FLOAT-folded rebuild,
    // re-assign = the cells), then per-query probe ranking over the
    // rebuilt centroids and in-cell cosine top-k. cosSql's fold
    // divides by zero on a zero norm, which DuckDB yields NULL for —
    // exactly the Spark kernel's zero-norm NULL, so ORDER BY c DESC
    // (nulls last in both engines) ranks identically.
    // s11: all four sub-quantizer chains replayed (the s03 template
    // per 16-dim slice: seed cells = vec_id < 16, cosine argmax via
    // row_number, quantized-integer centroid means, FLOAT-folded
    // rebuild, reassign), then the code join + concatenated-centroid
    // reconstruction and the engine-stable floor rounding.
    "s11_pq_encode" -> {
      def chain(s: Int): String = pqChainSql(s)
      s"""WITH e AS ($embSql),
         | ${(0 until 4).map(chain).mkString(",\n ")},
         | $pqCodesCte,
         | recon AS (SELECT codes.vec_id,
         |             list_concat(list_concat(s0.se, s1.se),
         |                         list_concat(s2.se, s3.se)) AS re
         |           FROM codes
         |             JOIN sd1_0 s0 ON s0.cell = codes.c_0
         |             JOIN sd1_1 s1 ON s1.cell = codes.c_1
         |             JOIN sd1_2 s2 ON s2.cell = codes.c_2
         |             JOIN sd1_3 s3 ON s3.cell = codes.c_3)
         |SELECT codes.vec_id,
         |  CAST(c_0 AS BIGINT) AS c_0, CAST(c_1 AS BIGINT) AS c_1,
         |  CAST(c_2 AS BIGINT) AS c_2, CAST(c_3 AS BIGINT) AS c_3,
         |  floor(${cosSql("e.de", "recon.re", 64)} * 10000.0 + 0.5) / 10000.0
         |    AS recon_cos
         |FROM codes JOIN recon USING (vec_id) JOIN e USING (vec_id)
         |ORDER BY codes.vec_id""".stripMargin
    },

    // s13: the four chains trained on the CORPUS SPLIT only, then the
    // batch's slices argmax-assigned to the frozen rebuilt centroids.
    "s13_pq_incremental" -> {
      val trainFilter = "WHERE (vec_id % 5 + 5) % 5 <> 0"
      s"""WITH e AS ($embSql),
         | ${(0 until 4).map(s => pqChainSql(s, trainFilter)).mkString(",\n ")},
         | b AS (SELECT vec_id, de FROM e WHERE (vec_id % 5 + 5) % 5 = 0),
         | ${(0 until 4).map { s =>
             val lo = s * 16 + 1; val hi = s * 16 + 16
             s"""bs_$s AS (SELECT vec_id, de[$lo:$hi] AS se FROM b),
             | bc_$s AS (SELECT bs_$s.vec_id, sd1_$s.cell,
             |             ${cosSql(s"bs_$s.se", s"sd1_$s.se", 16)} AS c
             |           FROM bs_$s, sd1_$s),
             | br_$s AS (SELECT vec_id, cell,
             |            row_number() OVER (PARTITION BY vec_id
             |              ORDER BY c DESC, cell) AS rn
             |          FROM bc_$s),
             | bb_$s AS (SELECT vec_id, cell FROM br_$s WHERE rn = 1)"""
           }.mkString(",\n ")}
         |SELECT bb_0.vec_id,
         |  CAST(bb_0.cell AS BIGINT) AS c_0, CAST(bb_1.cell AS BIGINT) AS c_1,
         |  CAST(bb_2.cell AS BIGINT) AS c_2, CAST(bb_3.cell AS BIGINT) AS c_3
         |FROM bb_0 JOIN bb_1 USING (vec_id)
         |  JOIN bb_2 USING (vec_id) JOIN bb_3 USING (vec_id)
         |ORDER BY bb_0.vec_id""".stripMargin
    },

    // s12: the same four chains + codes, then the ADC replay — per
    // subspace a (query, cell) lookup table of dot products, score =
    // exact cos(query, reconstruction) assembled from lookups with
    // the identical left-assoc addition order, zero-norm guarded to
    // NULL on both engines.
    "s12_pq_adc" -> {
      s"""WITH e AS ($embSql),
         | ${(0 until 4).map(pqChainSql).mkString(",\n ")},
         | $pqCodesCte,
         | q AS (SELECT vec_id AS qid, de AS qfull FROM e WHERE vec_id < 5),
         | qn AS (SELECT qid, ${dotSql("qfull", "qfull", 64)} AS qn2 FROM q),
         | ${(0 until 4).map { s =>
             val lo = s * 16 + 1; val hi = s * 16 + 16
             s"""qs_$s AS (SELECT qid, qfull[$lo:$hi] AS qe FROM q),
             | dist_$s AS (SELECT qid, cell,
             |               ${dotSql("qe", "se", 16)} AS qd,
             |               ${dotSql("se", "se", 16)} AS ns
             |             FROM qs_$s, sd1_$s)"""
           }.mkString(",\n ")},
         | sc AS (SELECT q.qid, codes.vec_id,
         |          d0.qd + d1.qd + d2.qd + d3.qd AS num,
         |          d0.ns + d1.ns + d2.ns + d3.ns AS dn2,
         |          qn.qn2 AS qn2
         |        FROM codes
         |          CROSS JOIN q
         |          JOIN dist_0 d0 ON d0.qid = q.qid AND d0.cell = codes.c_0
         |          JOIN dist_1 d1 ON d1.qid = q.qid AND d1.cell = codes.c_1
         |          JOIN dist_2 d2 ON d2.qid = q.qid AND d2.cell = codes.c_2
         |          JOIN dist_3 d3 ON d3.qid = q.qid AND d3.cell = codes.c_3
         |          JOIN qn ON qn.qid = q.qid),
         | ad AS (SELECT qid, vec_id,
         |          CASE WHEN qn2 = 0 OR dn2 = 0 THEN NULL
         |               ELSE num / (sqrt(qn2) * sqrt(dn2)) END AS adc
         |        FROM sc),
         | rk AS (SELECT qid, vec_id, adc,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY adc DESC, vec_id) AS rnk
         |        FROM ad)
         |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id,
         |  floor(adc * 10000.0 + 0.5) / 10000.0 AS adc_cos
         |FROM rk WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
    },

    // s14: IVFADC — the s03 coarse chain (verbatim, via
    // coarseChainSql) supplies cells + probe centroids; the s12 PQ
    // chains supply codes + ADC lookup tables; candidates are ONLY
    // codes whose coarse cell is probed. Scoring/ranking text is
    // s12's exactly, applied to the pruned candidate set.
    "s14_ivf_adc" -> {
      s"""WITH e AS ($embSql),
         | $coarseChainSql,
         | ${(0 until 4).map(pqChainSql).mkString(",\n ")},
         | $pqCodesCte,
         | q AS (SELECT vec_id AS qid, de AS qfull FROM e WHERE vec_id < 5),
         | qn AS (SELECT qid, ${dotSql("qfull", "qfull", 64)} AS qn2 FROM q),
         | pc AS (SELECT q.qid, sd1.cell,
         |          ${cosSql("q.qfull", "sd1.se", 64)} AS cd
         |        FROM q, sd1),
         | pr AS (SELECT qid, cell,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY cd DESC, cell) AS rn
         |        FROM pc),
         | pb AS (SELECT qid, cell FROM pr WHERE rn <= 4),
         | ${(0 until 4).map { s =>
             val lo = s * 16 + 1; val hi = s * 16 + 16
             s"""qs_$s AS (SELECT qid, qfull[$lo:$hi] AS qe FROM q),
             | dist_$s AS (SELECT qid, cell,
             |               ${dotSql("qe", "se", 16)} AS qd,
             |               ${dotSql("se", "se", 16)} AS ns
             |             FROM qs_$s, sd1_$s)"""
           }.mkString(",\n ")},
         | cand AS (SELECT pb.qid, codes.vec_id,
         |            codes.c_0, codes.c_1, codes.c_2, codes.c_3
         |          FROM codes JOIN a2 USING (vec_id) JOIN pb USING (cell)),
         | sc AS (SELECT cand.qid, cand.vec_id,
         |          d0.qd + d1.qd + d2.qd + d3.qd AS num,
         |          d0.ns + d1.ns + d2.ns + d3.ns AS dn2,
         |          qn.qn2 AS qn2
         |        FROM cand
         |          JOIN dist_0 d0 ON d0.qid = cand.qid AND d0.cell = cand.c_0
         |          JOIN dist_1 d1 ON d1.qid = cand.qid AND d1.cell = cand.c_1
         |          JOIN dist_2 d2 ON d2.qid = cand.qid AND d2.cell = cand.c_2
         |          JOIN dist_3 d3 ON d3.qid = cand.qid AND d3.cell = cand.c_3
         |          JOIN qn ON qn.qid = cand.qid),
         | ad AS (SELECT qid, vec_id,
         |          CASE WHEN qn2 = 0 OR dn2 = 0 THEN NULL
         |               ELSE num / (sqrt(qn2) * sqrt(dn2)) END AS adc
         |        FROM sc),
         | rk AS (SELECT qid, vec_id, adc,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY adc DESC, vec_id) AS rnk
         |        FROM ad)
         |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id,
         |  floor(adc * 10000.0 + 0.5) / 10000.0 AS adc_cos
         |FROM rk WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
    },

    // s19: s14's replay verbatim down to the ranked ADC scores, the
    // shortlist cut at rnk ≤ 30, then the exact re-rank via the s01
    // kernel (list_cosine_similarity on the defensive double folds,
    // zero-norm guarded to NULL) ordered (cos DESC NULLS LAST,
    // vec_id) — exactly the Spark window's default null placement.
    "s19_ivfadc_rerank" -> {
      s"""WITH e AS ($embSql),
         | $coarseChainSql,
         | ${(0 until 4).map(pqChainSql).mkString(",\n ")},
         | $pqCodesCte,
         | q AS (SELECT vec_id AS qid, de AS qfull, n2 AS qn2 FROM e WHERE vec_id < 5),
         | qn AS (SELECT qid, ${dotSql("qfull", "qfull", 64)} AS qn2 FROM q),
         | pc AS (SELECT q.qid, sd1.cell,
         |          ${cosSql("q.qfull", "sd1.se", 64)} AS cd
         |        FROM q, sd1),
         | pr AS (SELECT qid, cell,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY cd DESC, cell) AS rn
         |        FROM pc),
         | pb AS (SELECT qid, cell FROM pr WHERE rn <= 4),
         | ${(0 until 4).map { s =>
             val lo = s * 16 + 1; val hi = s * 16 + 16
             s"""qs_$s AS (SELECT qid, qfull[$lo:$hi] AS qe FROM q),
             | dist_$s AS (SELECT qid, cell,
             |               ${dotSql("qe", "se", 16)} AS qd,
             |               ${dotSql("se", "se", 16)} AS ns
             |             FROM qs_$s, sd1_$s)"""
           }.mkString(",\n ")},
         | cand AS (SELECT pb.qid, codes.vec_id,
         |            codes.c_0, codes.c_1, codes.c_2, codes.c_3
         |          FROM codes JOIN a2 USING (vec_id) JOIN pb USING (cell)),
         | sc AS (SELECT cand.qid, cand.vec_id,
         |          d0.qd + d1.qd + d2.qd + d3.qd AS num,
         |          d0.ns + d1.ns + d2.ns + d3.ns AS dn2,
         |          qn.qn2 AS qn2
         |        FROM cand
         |          JOIN dist_0 d0 ON d0.qid = cand.qid AND d0.cell = cand.c_0
         |          JOIN dist_1 d1 ON d1.qid = cand.qid AND d1.cell = cand.c_1
         |          JOIN dist_2 d2 ON d2.qid = cand.qid AND d2.cell = cand.c_2
         |          JOIN dist_3 d3 ON d3.qid = cand.qid AND d3.cell = cand.c_3
         |          JOIN qn ON qn.qid = cand.qid),
         | ad AS (SELECT qid, vec_id,
         |          CASE WHEN qn2 = 0 OR dn2 = 0 THEN NULL
         |               ELSE num / (sqrt(qn2) * sqrt(dn2)) END AS adc
         |        FROM sc),
         | rk AS (SELECT qid, vec_id, adc,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY adc DESC, vec_id) AS rnk
         |        FROM ad),
         | sl AS (SELECT qid, vec_id FROM rk WHERE rnk <= 30),
         | rr AS (SELECT sl.qid, sl.vec_id,
         |          CASE WHEN q.qn2 = 0 OR e.n2 = 0 THEN NULL
         |               ELSE list_cosine_similarity(q.qfull, e.de) END AS cos
         |        FROM sl JOIN q ON q.qid = sl.qid
         |          JOIN e ON e.vec_id = sl.vec_id),
         | rk2 AS (SELECT qid, vec_id, cos,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY cos DESC NULLS LAST, vec_id) AS rnk
         |        FROM rr)
         |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id, round(cos, 4) AS cos
         |FROM rk2 WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
    },

    // s18: the residual-IVFADC replay — coarse chain verbatim, the
    // residual relation (double-subtract → FLOAT fold, the stored-
    // embedding convention), the four PQ chains trained ON RESIDUALS
    // (pqChainSql with srcRel = er), probes as s14, and per-subspace
    // (query, cell, code) term tables whose inner sums mirror the
    // Spark column expressions' association exactly.
    "s18_ivfadc_residual" -> {
      val termTables = (0 until 4).map { s =>
        val lo = s * 16 + 1; val hi = s * 16 + 16
        val qs = s"(q.qfull[$lo:$hi])"; val cs = s"(cc.se[$lo:$hi])"
        s"""rt_$s AS (SELECT q.qid, cc.cell, sb.cell AS code,
           |            (${dotSql(qs, cs, 16)} + ${dotSql(qs, "sb.se", 16)}) AS num,
           |            (${dotSql(cs, cs, 16)} + 2 * ${dotSql(cs, "sb.se", 16)}
           |              + ${dotSql("sb.se", "sb.se", 16)}) AS den
           |          FROM q, sd1 cc, sd1_$s sb)"""
      }.mkString(",\n ")
      s"""WITH e AS ($embSql),
         | $coarseChainSql,
         | er AS (SELECT e.vec_id,
         |          list_transform(range(1, 65), ri ->
         |            CAST(CAST(e.de[ri] - cc.se[ri] AS FLOAT) AS DOUBLE)) AS de
         |        FROM e JOIN a2 USING (vec_id) JOIN sd1 cc ON cc.cell = a2.cell),
         | ${(0 until 4).map(s => pqChainSql(s, "", "er")).mkString(",\n ")},
         | $pqCodesCte,
         | q AS (SELECT vec_id AS qid, de AS qfull FROM e WHERE vec_id < 5),
         | qn AS (SELECT qid, ${dotSql("qfull", "qfull", 64)} AS qn2 FROM q),
         | pc AS (SELECT q.qid, sd1.cell,
         |          ${cosSql("q.qfull", "sd1.se", 64)} AS cd
         |        FROM q, sd1),
         | pr AS (SELECT qid, cell,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY cd DESC, cell) AS rn
         |        FROM pc),
         | pb AS (SELECT qid, cell FROM pr WHERE rn <= 4),
         | $termTables,
         | cand AS (SELECT pb.qid, a2.cell, codes.vec_id,
         |            codes.c_0, codes.c_1, codes.c_2, codes.c_3
         |          FROM codes JOIN a2 USING (vec_id) JOIN pb USING (cell)),
         | sc AS (SELECT cand.qid, cand.vec_id,
         |          t0.num + t1.num + t2.num + t3.num AS num,
         |          t0.den + t1.den + t2.den + t3.den AS dn2,
         |          qn.qn2 AS qn2
         |        FROM cand
         |          JOIN rt_0 t0 ON t0.qid = cand.qid AND t0.cell = cand.cell AND t0.code = cand.c_0
         |          JOIN rt_1 t1 ON t1.qid = cand.qid AND t1.cell = cand.cell AND t1.code = cand.c_1
         |          JOIN rt_2 t2 ON t2.qid = cand.qid AND t2.cell = cand.cell AND t2.code = cand.c_2
         |          JOIN rt_3 t3 ON t3.qid = cand.qid AND t3.cell = cand.cell AND t3.code = cand.c_3
         |          JOIN qn ON qn.qid = cand.qid),
         | ad AS (SELECT qid, vec_id,
         |          CASE WHEN qn2 = 0 OR dn2 = 0 THEN NULL
         |               ELSE num / (sqrt(qn2) * sqrt(dn2)) END AS adc
         |        FROM sc),
         | rk AS (SELECT qid, vec_id, adc,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY adc DESC, vec_id) AS rnk
         |        FROM ad)
         |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id,
         |  floor(adc * 10000.0 + 0.5) / 10000.0 AS adc_cos
         |FROM rk WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
    },

    // s23: s03's replay with the predicate cut inside probed cells —
    // the one new line is the label filter on the candidate join.
    "s23_filtered_ivf" ->
      s"""WITH e AS ($embSql),
         | $coarseChainSql,
         | q AS (SELECT vec_id AS qid, de AS qe FROM e WHERE vec_id < 5),
         | pc AS (SELECT q.qid, q.qe, sd1.cell,
         |          ${cosSql("q.qe", "sd1.se", 64)} AS cd
         |        FROM q, sd1),
         | pr AS (SELECT qid, qe, cell,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY cd DESC, cell) AS rn
         |        FROM pc),
         | pb AS (SELECT qid, qe, cell FROM pr WHERE rn <= 4),
         | cand AS (SELECT pb.qid, e2.vec_id,
         |            ${cosSql("pb.qe", "e2.de", 64)} AS c
         |          FROM pb JOIN a2 USING (cell)
         |          JOIN e e2 ON e2.vec_id = a2.vec_id
         |          WHERE ((e2.label % 4) + 4) % 4 = 1),
         | rk AS (SELECT qid, vec_id, c,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY c DESC, vec_id) AS rnk
         |        FROM cand)
         |SELECT qid, rnk, vec_id, round(c, 4) AS cos
         |FROM rk WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,

    "s03_ann_ivf" ->
      s"""WITH e AS ($embSql),
         | $coarseChainSql,
         | q AS (SELECT vec_id AS qid, de AS qe FROM e WHERE vec_id < 5),
         | pc AS (SELECT q.qid, q.qe, sd1.cell,
         |          ${cosSql("q.qe", "sd1.se", 64)} AS cd
         |        FROM q, sd1),
         | pr AS (SELECT qid, qe, cell,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY cd DESC, cell) AS rn
         |        FROM pc),
         | pb AS (SELECT qid, qe, cell FROM pr WHERE rn <= 4),
         | cand AS (SELECT pb.qid, e2.vec_id,
         |            ${cosSql("pb.qe", "e2.de", 64)} AS c
         |          FROM pb JOIN a2 USING (cell)
         |          JOIN e e2 ON e2.vec_id = a2.vec_id),
         | rk AS (SELECT qid, vec_id, c,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY c DESC, vec_id) AS rnk
         |        FROM cand)
         |SELECT qid, rnk, vec_id, round(c, 4) AS cos
         |FROM rk WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,

    // s09: the assignment replay (cosSql kernel + row_number) feeding
    // a cluster-equi self-join; pair cosine via list_cosine_similarity
    // on DOUBLE[] (the d05-proven pairing), threshold on the raw
    // double, display rounded.
    "s09_cluster_pairs" ->
      s"""WITH e AS ($embSql),
         | sd AS (SELECT vec_id AS cluster, de AS se FROM e WHERE vec_id < 8),
         | scored AS (SELECT e.vec_id, sd.cluster,
         |              ${cosSql("e.de", "sd.se", 64)} AS c
         |            FROM e, sd),
         | r AS (SELECT vec_id, cluster,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY c DESC, cluster) AS rn
         |       FROM scored),
         | a AS (SELECT vec_id, cluster FROM r WHERE rn = 1),
         | j AS (SELECT a1.cluster, e1.vec_id AS id_a, e2.vec_id AS id_b,
         |         CASE WHEN e1.n2 = 0 OR e2.n2 = 0 THEN NULL
         |              ELSE list_cosine_similarity(e1.de, e2.de) END AS c
         |       FROM a a1 JOIN a a2
         |         ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
         |       JOIN e e1 ON e1.vec_id = a1.vec_id
         |       JOIN e e2 ON e2.vec_id = a2.vec_id)
         |SELECT cluster, id_a, id_b, round(c, 4) AS cos
         |FROM j WHERE c >= 0.2 ORDER BY id_a, id_b""".stripMargin,

    "s02_ann_lsh" ->
      s"""WITH e AS ($embSql),
         | codes AS (SELECT vec_id, de, ${srpCodeSql("de", 16, 64)} AS code FROM e),
         | cb AS (SELECT vec_id, de, bb.b AS band, (code >> (4 * bb.b)) & 15 AS key
         |        FROM codes, (SELECT unnest(range(4)) AS b) bb),
         | qb AS (SELECT vec_id AS qid, de AS qe, band, key FROM cb WHERE vec_id < 5),
         | cand AS (SELECT DISTINCT qb.qid, qb.qe, cb.vec_id, cb.de
         |          FROM cb JOIN qb ON cb.band = qb.band AND cb.key = qb.key),
         | scored AS (SELECT qid, vec_id, c,
         |              row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS rnk
         |            FROM (SELECT qid, vec_id, ${cosSql("qe", "de", 64)} AS c FROM cand))
         |SELECT qid, rnk, vec_id, round(c, 4) AS cos
         |FROM scored WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,

    "d05_embed_neardup" ->
      s"""WITH e AS ($embSql)
        |SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.de, b.de), 4) AS cos
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE a.n2 > 0 AND b.n2 > 0
        |  AND list_cosine_similarity(a.de, b.de) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    "d12_semantic_keep" ->
      s"""WITH RECURSIVE e AS ($embSql),
        | pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE a.n2 > 0 AND b.n2 > 0
        |    AND list_cosine_similarity(a.de, b.de) >= 0.3),
        | edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        | reach(id, lbl) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e2.src, r.lbl FROM edges e2 JOIN reach r ON e2.dst = r.id),
        | cc AS (SELECT id, min(lbl) AS keep_id FROM reach GROUP BY id)
        |SELECT id AS vec_id, keep_id,
        |  count(*) OVER (PARTITION BY keep_id) AS cluster_size
        |FROM cc ORDER BY keep_id, vec_id""".stripMargin,

    // s21: stage 1 = prefix cosine (dot over the first 16 list
    // positions — exactly the slice the Spark side scores), NULL on a
    // zero-norm prefix; stage 2 = full-dim cosine of the 30-deep
    // shortlist. Both windows tiebreak on vec_id like s01.
    "s21_trunc_rerank" ->
      s"""WITH e AS ($embSql),
        | q AS (SELECT vec_id AS qid, de AS qe, n2 AS qn2 FROM e WHERE vec_id < 5),
        | s1 AS (
        |  SELECT qid, e.vec_id, e.de, e.n2, qe, qn2,
        |    CASE WHEN ${dotSql("qe", "qe", 16)} = 0
        |           OR ${dotSql("e.de", "e.de", 16)} = 0 THEN NULL
        |         ELSE ${cosSql("qe", "e.de", 16)} END AS c1
        |  FROM q CROSS JOIN e),
        | sh AS (SELECT *, row_number() OVER (PARTITION BY qid
        |      ORDER BY c1 DESC NULLS LAST, vec_id) AS r1 FROM s1),
        | rr AS (SELECT qid, vec_id,
        |    CASE WHEN qn2 = 0 OR n2 = 0 THEN NULL
        |         ELSE list_cosine_similarity(qe, de) END AS c
        |  FROM sh WHERE r1 <= 30),
        | sc AS (SELECT qid, vec_id, c, row_number() OVER (PARTITION BY qid
        |      ORDER BY c DESC NULLS LAST, vec_id) AS rnk FROM rr)
        |SELECT qid, rnk, vec_id, round(c, 4) AS cos
        |FROM sc WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,

    // s22: sign bits pack as Σ 2^j in two 32-bit halves (no sign-bit
    // overflow), hamming = popcount of the xors — all integer, then
    // s21's exact-rerank tail verbatim.
    "s22_sign_hamming" ->
      s"""WITH e AS ($embSql),
        | codes AS (SELECT vec_id, de, n2,
        |    CAST(list_aggregate(list_transform(range(1, 33),
        |      i -> CASE WHEN de[i] > 0 THEN CAST(1 AS BIGINT) << (i - 1)
        |                ELSE CAST(0 AS BIGINT) END), 'sum') AS BIGINT) AS lo,
        |    CAST(list_aggregate(list_transform(range(33, 65),
        |      i -> CASE WHEN de[i] > 0 THEN CAST(1 AS BIGINT) << (i - 33)
        |                ELSE CAST(0 AS BIGINT) END), 'sum') AS BIGINT) AS hi
        |  FROM e),
        | q AS (SELECT vec_id AS qid, de AS qe, n2 AS qn2, lo AS qlo, hi AS qhi
        |  FROM codes WHERE vec_id < 5),
        | s1 AS (SELECT qid, c.vec_id, c.de, c.n2, qe, qn2,
        |    bit_count(xor(qlo, c.lo)) + bit_count(xor(qhi, c.hi)) AS ham
        |  FROM q CROSS JOIN codes c),
        | sh AS (SELECT *, row_number() OVER (PARTITION BY qid
        |      ORDER BY ham ASC, vec_id) AS r1 FROM s1),
        | rr AS (SELECT qid, vec_id,
        |    CASE WHEN qn2 = 0 OR n2 = 0 THEN NULL
        |         ELSE list_cosine_similarity(qe, de) END AS c
        |  FROM sh WHERE r1 <= 30),
        | sc AS (SELECT qid, vec_id, c, row_number() OVER (PARTITION BY qid
        |      ORDER BY c DESC NULLS LAST, vec_id) AS rnk FROM rr)
        |SELECT qid, rnk, vec_id, round(c, 4) AS cos
        |FROM sc WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,

    // s24: the sum-vector identity in HUGEINT over the same 1e-6
    // quantization; identical double op order for the final divides.
    "s24_embed_diversity" ->
      """WITH e0 AS (SELECT CAST(label AS BIGINT) AS label,
        |    list_transform(CAST(CAST(embedding AS FLOAT[]) AS DOUBLE[]),
        |      x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS q
        |   FROM embeddings WHERE len(embedding) = 64),
        | sq AS (SELECT label,
        |    CAST(list_aggregate(list_transform(q, x -> x * x), 'sum') AS HUGEINT) AS sqv
        |   FROM e0),
        | base AS (SELECT label, count(*) AS n, sum(sqv) AS sumsq
        |   FROM sq GROUP BY label),
        | dims AS (SELECT label, d.i AS d, CAST(sum(q[d.i]) AS BIGINT) AS sd
        |   FROM e0, (SELECT unnest(range(1, 65)) AS i) d GROUP BY 1, 2),
        | s2 AS (SELECT label, sum(CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT)) AS ssq
        |   FROM dims GROUP BY label)
        |SELECT b.label, CAST(n AS BIGINT) AS n,
        |  floor((CAST(sumsq AS DOUBLE) / CAST(n AS DOUBLE)) / 1000000000000.0
        |    * 1000000.0 + 0.5) / 1000000.0 AS mean_sq_norm,
        |  CASE WHEN n > 1 THEN
        |    floor((CAST(ssq - sumsq AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))
        |      / 1000000000000.0 * 1000000.0 + 0.5) / 1000000.0
        |  END AS mean_pair_dot
        |FROM base b JOIN s2 USING (label) ORDER BY label""".stripMargin,

    "s01_ann_brute" ->
      s"""WITH e AS ($embSql),
        | q AS (SELECT vec_id AS qid, de AS qe, n2 AS qn2 FROM e WHERE vec_id < 5),
        | sc0 AS (
        |  SELECT qid, vec_id,
        |    CASE WHEN qn2 = 0 OR n2 = 0 THEN NULL
        |         ELSE list_cosine_similarity(qe, de) END AS c
        |  FROM q CROSS JOIN e),
        | scored AS (
        |  SELECT qid, vec_id, c,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY c DESC NULLS LAST, vec_id) AS rnk
        |  FROM sc0)
        |SELECT qid, rnk, vec_id, round(c, 4) AS cos
        |FROM scored WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,

    // s20: s05's quantization replayed on BOTH sides, integer dot via
    // the prepend-seeded fold (exact under any order), one
    // multiply-then-divide descale in the same op order as the Spark
    // column expression, zero-scale guarded to NULL, halfUp4 display.
    "s20_int8_topk" ->
      s"""WITH e AS ($embSql),
         | qz AS (SELECT vec_id, de,
         |          list_max(list_transform(de, x -> abs(x))) AS mx FROM e),
         | qq AS (SELECT vec_id,
         |          CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale,
         |          list_transform(de, x -> CAST(floor(x *
         |            (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END) + 0.5)
         |            AS BIGINT)) AS q8
         |        FROM qz),
         | qs AS (SELECT vec_id AS qid, scale AS sq, q8 AS qa
         |        FROM qq WHERE vec_id < 5),
         | sc AS (SELECT qs.qid, c.vec_id, qs.sq, c.scale AS scc,
         |          list_reduce(list_prepend(CAST(0 AS BIGINT),
         |            list_transform(range(1, 65), i -> qa[i] * c.q8[i])),
         |            (a, b) -> a + b) AS idot
         |        FROM qs, qq c),
         | ad AS (SELECT qid, vec_id,
         |          CASE WHEN sq = 0 OR scc = 0 THEN NULL
         |               ELSE CAST(idot AS DOUBLE) / (sq * scc) END AS ip
         |        FROM sc),
         | rk AS (SELECT qid, vec_id, ip,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY ip DESC NULLS LAST, vec_id) AS rnk
         |        FROM ad)
         |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id,
         |  floor(ip * 10000.0 + 0.5) / 10000.0 AS ip
         |FROM rk WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,

    // s27: both arms replayed — s01's exact chain (NULLS LAST
    // tie-break) and s03's coarse-chain IVF probe — folded into a
    // per-query hit count over the exact top-10.
    "s27_ann_recall" ->
      s"""WITH e AS ($embSql),
         | $coarseChainSql,
         | xq AS (SELECT vec_id AS qid, de AS qe, n2 AS qn2 FROM e
         |        WHERE vec_id < 5),
         | xsc AS (SELECT qid, vec_id,
         |    CASE WHEN qn2 = 0 OR n2 = 0 THEN NULL
         |         ELSE list_cosine_similarity(qe, de) END AS c
         |  FROM xq CROSS JOIN e),
         | xr AS (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY c DESC NULLS LAST, vec_id) AS rnk
         |  FROM xsc),
         | xt AS (SELECT qid, vec_id FROM xr WHERE rnk <= 10),
         | q AS (SELECT vec_id AS qid, de AS qe FROM e WHERE vec_id < 5),
         | pc AS (SELECT q.qid, q.qe, sd1.cell,
         |          ${cosSql("q.qe", "sd1.se", 64)} AS cd
         |        FROM q, sd1),
         | pr AS (SELECT qid, qe, cell,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY cd DESC, cell) AS rn
         |        FROM pc),
         | pb AS (SELECT qid, qe, cell FROM pr WHERE rn <= 4),
         | cand AS (SELECT pb.qid, e2.vec_id,
         |            ${cosSql("pb.qe", "e2.de", 64)} AS c
         |          FROM pb JOIN a2 USING (cell)
         |          JOIN e e2 ON e2.vec_id = a2.vec_id),
         | rk AS (SELECT qid, vec_id,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY c DESC, vec_id) AS rnk
         |        FROM cand),
         | sv AS (SELECT qid, vec_id FROM rk WHERE rnk <= 10)
         |SELECT x.qid AS qid,
         |  CAST(count(s.vec_id) AS BIGINT) AS hits,
         |  round(count(s.vec_id) / 10.0, 4) AS recall
         |FROM xt x LEFT JOIN sv s
         |  ON x.qid = s.qid AND x.vec_id = s.vec_id
         |GROUP BY x.qid ORDER BY qid""".stripMargin,

    // s26: both halves' micro means replayed with s04's floor-div
    // formula, the squared diff summed per label — BIGINT throughout.
    "s26_centroid_drift" ->
      s"""WITH e AS ($embSql),
         | x AS (SELECT vec_id, label, di.i AS dim,
         |         CAST(floor(de[di.i] * 1000000.0 + 0.5) AS BIGINT) AS qv
         |       FROM e, (SELECT unnest(range(1, 65)) AS i) di),
         | h AS (SELECT label, dim, (vec_id % 2 + 2) % 2 AS hf,
         |         CAST(sum(qv) AS BIGINT) AS sq, CAST(count(*) AS BIGINT) AS n
         |       FROM x GROUP BY 1, 2, 3),
         | m AS (SELECT label, dim, hf,
         |         (sq - (((sq % n) + n) % n)) // n AS mu FROM h),
         | j AS (SELECT a.label, a.dim, a.mu AS m0, b.mu AS m1
         |       FROM m a JOIN m b ON a.label = b.label AND a.dim = b.dim
         |        AND a.hf = 0 AND b.hf = 1),
         | d AS (SELECT label, CAST(count(*) AS BIGINT) AS n_dims,
         |         CAST(sum((m0 - m1) * (m0 - m1)) AS BIGINT) AS drift_sq_micro
         |       FROM j GROUP BY label),
         | c AS (SELECT label,
         |         CAST(sum(CASE WHEN (vec_id % 2 + 2) % 2 = 0 THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_a,
         |         CAST(sum(CASE WHEN (vec_id % 2 + 2) % 2 = 1 THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_b
         |       FROM e GROUP BY label)
         |SELECT d.label, n_a, n_b, n_dims, drift_sq_micro
         |FROM d JOIN c ON d.label = c.label ORDER BY d.label""".stripMargin,

    // s25: the trained quantizer replayed — per-dim min/max over the
    // corpus, the same clamped-floor encode, integer L2 ranking.
    "s25_sq8_topk" ->
      s"""WITH e AS ($embSql),
         | dims AS (SELECT i, min(de[i]) AS vmin, max(de[i]) AS vmax
         |   FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) GROUP BY i),
         | enc AS (SELECT e.vec_id, d.i,
         |    CASE WHEN d.vmax > d.vmin THEN
         |      least(greatest(CAST(floor((de[d.i] - d.vmin) /
         |        (d.vmax - d.vmin) * 256.0) AS BIGINT), 0), 255)
         |    ELSE 0 END AS q
         |   FROM e CROSS JOIN dims d),
         | qe AS (SELECT vec_id AS qid, i, q FROM enc WHERE vec_id < 5),
         | ds AS (SELECT qe.qid, c.vec_id,
         |    sum((c.q - qe.q) * (c.q - qe.q)) AS dist
         |   FROM enc c JOIN qe ON c.i = qe.i GROUP BY qe.qid, c.vec_id),
         | rk AS (SELECT qid, vec_id, dist,
         |    row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk
         |   FROM ds)
         |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id,
         |  CAST(dist AS BIGINT) AS dist
         |FROM rk WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,

    "s05_quantize" ->
      s"""WITH e AS ($embSql),
        | d AS (SELECT vec_id, de AS v FROM e),
        | m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM d),
        | s AS (SELECT vec_id, v,
        |   CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale FROM m)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  array_to_string(list_transform(v,
        |    x -> CAST(CAST(floor(x * scale + 0.5) AS INTEGER) AS VARCHAR)), ',') AS q
        |FROM s ORDER BY vec_id""".stripMargin,

    // s04: 1e-6-quantized mean — BIGINT sums are order-independent, so
    // this replays labelCentroids exactly regardless of either
    // engine's aggregation order. Op order mirrored: (Σq/1e6)/n.
    "s04_label_centroid" ->
      s"""WITH e AS ($embSql),
        | x AS (SELECT label, di.i AS dim,
        |         CAST(floor(de[di.i] * 1000000.0 + 0.5) AS BIGINT) AS qv
        |       FROM e, (SELECT unnest(range(1, 65)) AS i) di),
        | a AS (SELECT label, dim, CAST(sum(qv) AS BIGINT) AS sq,
        |         CAST(count(*) AS BIGINT) AS n
        |       FROM x GROUP BY label, dim)
        |SELECT label, dim,
        |  (sq - (((sq % n) + n) % n)) // n AS centroid_micro
        |FROM a ORDER BY label, dim""".stripMargin,

    // t29: the t23 BM25 chain + the guarded-cosine arm, each cut by
    // the same total ORDER BY ... LIMIT, ranked, full-outer fused
    // with COALESCEd 1/(60+rank) contributions (double division of
    // bit-equal inputs; IEEE addition is commutative bitwise, so the
    // two-term sum is engine-exact), half-up micro rounding.
    "t29_rrf_hybrid" -> {
      val normSql = PortableHashSql.norm("text")
      s"""WITH tk AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |        string_split($normSql, ' ') AS toks FROM documents),
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
         | ag AS (SELECT doc_id, sum(term) AS s FROM sc GROUP BY doc_id),
         | bm AS (SELECT doc_id,
         |          CAST((CAST(s * 1000000 AS BIGINT) + 50) // 100 AS DOUBLE) / 10000.0 AS bm25
         |        FROM ag),
         | lext AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 100),
         | lexr AS (SELECT doc_id,
         |           row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
         |         FROM lext),
         | e AS ($embSql),
         | q AS (SELECT de AS qe, n2 AS qn2 FROM e WHERE vec_id = 0),
         | sem AS (SELECT e.vec_id AS doc_id,
         |           CASE WHEN q.qn2 = 0 OR e.n2 = 0 THEN NULL
         |                ELSE list_cosine_similarity(q.qe, e.de) END AS c
         |         FROM e CROSS JOIN q),
         | semt AS (SELECT doc_id, c FROM sem ORDER BY c DESC NULLS LAST, doc_id LIMIT 100),
         | semr AS (SELECT doc_id,
         |           row_number() OVER (ORDER BY c DESC NULLS LAST, doc_id) AS sem_rank
         |         FROM semt),
         | fused AS (SELECT COALESCE(lexr.doc_id, semr.doc_id) AS doc_id,
         |            lex_rank, sem_rank,
         |            COALESCE(CAST(1 AS DOUBLE) / (60 + lex_rank), CAST(0 AS DOUBLE)) +
         |            COALESCE(CAST(1 AS DOUBLE) / (60 + sem_rank), CAST(0 AS DOUBLE)) AS rrf
         |          FROM lexr FULL OUTER JOIN semr ON lexr.doc_id = semr.doc_id),
         | top AS (SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT 20)
         |SELECT row_number() OVER (ORDER BY rrf DESC, doc_id) AS rnk,
         |  doc_id, lex_rank, sem_rank,
         |  CAST(floor(rrf * 1000000 + 0.5) AS BIGINT) AS rrf_micro
         |FROM top ORDER BY rnk""".stripMargin
    },

    // m-family oracles are fully BYTE-wise via hex(encode(text)) — 2
    // hex chars per UTF-8 byte — so they agree with Spark's binary
    // slicing/arithmetic for ARBITRARY (non-ASCII) text. md5 digests
    // hash the chunk's hex string (see the m03 query comment).
    "m01_blob_features" ->
      """SELECT doc_id,
        | octet_length(encode(text)) AS n_bytes,
        | md5(text) AS blob_md5,
        | substr(hex(encode(text)), 1, 8) AS prefix_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
      // md5(text): DuckDB's md5 takes VARCHAR and digests its UTF-8
      // bytes — exactly the blob — so this one needs no hex detour.

    // m12: the m03 grid + string_agg reassembly in part order; the
    // digest equality certifies the boundary arithmetic.
    "m12_blob_integrity" ->
      """WITH b AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id,
        |    hex(encode(text)) AS h
        |  FROM documents WHERE octet_length(encode(text)) > 0),
        | o AS (SELECT doc_id, h,
        |    unnest(range(1, length(h) // 2 + 1, 64)) AS off,
        |    unnest(generate_series(1, CAST(ceil((length(h) // 2) / 64.0) AS BIGINT)))
        |      AS cid
        |  FROM b),
        | c AS (SELECT doc_id, h, cid, substr(h, 2 * off - 1, 128) AS p FROM o),
        | re AS (SELECT doc_id, h, CAST(count(*) AS BIGINT) AS n_chunks,
        |    string_agg(p, '' ORDER BY cid) AS rh
        |  FROM c GROUP BY doc_id, h)
        |SELECT doc_id, n_chunks, CAST(length(h) // 2 AS BIGINT) AS n_bytes,
        |  md5(rh) = md5(h) AS intact, md5(h) AS blob_md5
        |FROM re ORDER BY doc_id, blob_md5""".stripMargin,

    // m13: replay from the raw table — member digests via the m03
    // hex convention, the shard via the portable fmix bucket formula
    // (d15's mixture-bucket idiom, modulus 8). Dup-id rows double the
    // member count (2 members per ROW), which the 2*count(*) mirrors.
    "m13_tar_shards" ->
      s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |    coalesce(text, '') AS text, coalesce(lang, 'xx') AS lang
         |  FROM documents)
         |SELECT doc_id, CAST(2 * count(*) AS BIGINT) AS n_members,
         |  ((${PortableHashSql.toSigned(PortableHashSql.fmix(
                PortableHashSql.toUnsigned("doc_id")))} % 8) + 8) % 8 AS shard,
         |  md5(hex(encode(text))) AS txt_md5,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS txt_bytes,
         |  md5(hex(encode('{"doc_id":' || doc_id || ',"lang":"' || lang || '"}')))
         |    AS json_md5
         |FROM d GROUP BY doc_id, text, lang ORDER BY doc_id""".stripMargin,

    "m03_blob_chunks" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS nb
        |  FROM documents WHERE octet_length(encode(text)) > 0),
        | o AS (SELECT doc_id, h, nb,
        |    unnest(range(1, nb + 1, 64)) AS off,
        |    unnest(generate_series(0, CAST(ceil(nb / 64.0) AS BIGINT) - 1))
        |      AS chunk_id
        |  FROM b)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(off - 1 AS BIGINT) AS byte_offset,
        |  CAST(least(64, nb - off + 1) AS BIGINT) AS n_bytes,
        |  md5(substr(h, 2 * off - 1, 128)) AS chunk_md5
        |FROM o ORDER BY doc_id, chunk_id""".stripMargin,

    "m04_frame_sample" ->
      """WITH f AS (SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) // 16 AS n_frames
        |  FROM documents),
        | s AS (SELECT doc_id, h, n_frames,
        |    unnest(range(0, n_frames, 4)) AS frame_id,
        |    unnest(generate_series(0, CAST(ceil(n_frames / 4.0) AS BIGINT) - 1))
        |      AS sample_id
        |  FROM f WHERE n_frames > 0)
        |SELECT doc_id, CAST(sample_id AS BIGINT) AS sample_id,
        |  CAST(frame_id AS BIGINT) AS frame_id,
        |  CAST(frame_id * 16 AS BIGINT) AS byte_offset,
        |  md5(substr(h, frame_id * 32 + 1, 32)) AS frame_md5,
        |  CAST(n_frames AS BIGINT) AS n_frames
        |FROM s ORDER BY doc_id, sample_id""".stripMargin,

    // m07: the PCM formula replayed directly — per-sample
    // floorMod(sid·7 + i·13, 65536) − 32768, integer |s| sum and max
    // per doc. If the WAV writer/reader mangled a header, frame
    // count, or byte order, the Spark side would throw or hash-differ.
    "m07_audio_roundtrip" ->
      """WITH ids AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
        |   FROM documents WHERE doc_id IS NOT NULL),
        | smp AS (SELECT doc_id,
        |   (doc_id % 2147483648 + 2147483648) % 2147483648 AS sid,
        |   unnest(range(0, 256)) AS i FROM ids),
        | v AS (SELECT doc_id,
        |   ((sid * 7 + i * 13) % 65536 + 65536) % 65536 - 32768 AS s FROM smp)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
        |  CAST(max(abs(s)) AS BIGINT) AS peak
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // m08: the m07 PCM formula replayed, then the windowing — samples
    // joined into [start, start+64) ranges, previous sample attached
    // for the sign-flip count, integer aggregates, exact-quotient
    // sqrt for rms (sum_sq/64 exact in double, IEEE sqrt correctly
    // rounded both engines, halfUp4 display).
    // m11: sample formula → 16 non-overlapping 32-sample window
    // energies → integer threshold → islands (seg = win − rank among
    // active windows), per-segment integer sums.
    "m11_vad_segments" ->
      """WITH ids AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
        |   FROM documents WHERE doc_id IS NOT NULL),
        | smp AS (SELECT doc_id,
        |   (doc_id % 2147483648 + 2147483648) % 2147483648 AS sid,
        |   unnest(range(0, 512)) AS i FROM ids),
        | v AS (SELECT doc_id, i, i // 32 AS w,
        |   ((sid * 7 + i * 13) % 65536 + 65536) % 65536 - 32768 AS s FROM smp),
        | en AS (SELECT doc_id, w, CAST(sum(s * s) AS BIGINT) AS sq
        |   FROM v GROUP BY doc_id, w),
        | act AS (SELECT doc_id, w, sq,
        |    w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS isl
        |   FROM en WHERE sq > CAST(358000000 AS BIGINT) * 32),
        | seg AS (SELECT doc_id, isl, CAST(min(w) AS BIGINT) AS start_win,
        |    CAST(max(w) AS BIGINT) AS end_win,
        |    CAST(count(*) AS BIGINT) AS n_wins,
        |    CAST(sum(sq) AS BIGINT) AS energy_sum
        |   FROM act GROUP BY doc_id, isl)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_win) - 1
        |    AS BIGINT) AS seg_id,
        |  start_win, end_win, n_wins, energy_sum
        |FROM seg ORDER BY doc_id, seg_id""".stripMargin,

    // m16: sample formula → the 16-literal cosine table (sin = the
    // same table shifted 12) → re/im sums → powers → windowed argmax
    // with ties to the lowest bin. All integer until the final casts.
    "m16_audio_spectral" ->
      """WITH ids AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
        |   FROM documents WHERE doc_id IS NOT NULL),
        | smp AS (SELECT doc_id,
        |   (doc_id % 2147483648 + 2147483648) % 2147483648 AS sid,
        |   unnest(range(0, 512)) AS i FROM ids),
        | v AS (SELECT doc_id, i,
        |   ((sid * 7 + i * 13) % 65536 + 65536) % 65536 - 32768 AS s FROM smp),
        | w AS (SELECT doc_id, unnest(range(0, 8)) AS win_id FROM ids),
        | kj AS (SELECT kk.i AS k, jj.i AS j,
        |   ([1000,924,707,383,0,-383,-707,-924,-1000,-924,-707,-383,0,383,707,924])
        |     [(kk.i * jj.i) % 16 + 1] AS c,
        |   ([1000,924,707,383,0,-383,-707,-924,-1000,-924,-707,-383,0,383,707,924])
        |     [(kk.i * jj.i + 12) % 16 + 1] AS sn
        |   FROM (SELECT unnest(range(1, 9)) AS i) kk,
        |        (SELECT unnest(range(0, 16)) AS i) jj),
        | ri AS (SELECT w.doc_id, w.win_id, kj.k,
        |     CAST(sum(v.s * kj.c) AS BIGINT) AS re,
        |     CAST(sum(v.s * kj.sn) AS BIGINT) AS im
        |   FROM w CROSS JOIN kj
        |   JOIN v ON v.doc_id = w.doc_id AND v.i = w.win_id * 64 + kj.j
        |   GROUP BY 1, 2, 3),
        | p AS (SELECT doc_id, win_id, k, re * re + im * im AS pw FROM ri),
        | r AS (SELECT doc_id, win_id, k, pw,
        |     sum(pw) OVER (PARTITION BY doc_id, win_id) AS tot,
        |     row_number() OVER (PARTITION BY doc_id, win_id
        |                        ORDER BY pw DESC, k ASC) AS rn
        |   FROM p)
        |SELECT doc_id, CAST(win_id AS BIGINT) AS win_id,
        |  CAST(win_id * 64 AS BIGINT) AS start_sample,
        |  CAST(k AS BIGINT) AS dom_bin, CAST(pw AS BIGINT) AS dom_power,
        |  CAST(tot AS BIGINT) AS tot_power
        |FROM r WHERE rn = 1 ORDER BY doc_id, win_id""".stripMargin,

    "m08_audio_features" ->
      """WITH ids AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
        |   FROM documents WHERE doc_id IS NOT NULL),
        | smp AS (SELECT doc_id,
        |   (doc_id % 2147483648 + 2147483648) % 2147483648 AS sid,
        |   unnest(range(0, 256)) AS i FROM ids),
        | v AS (SELECT doc_id, i,
        |   ((sid * 7 + i * 13) % 65536 + 65536) % 65536 - 32768 AS s FROM smp),
        | w AS (SELECT doc_id, unnest(range(0, 7)) AS win_id FROM ids),
        | wv AS (SELECT w.doc_id, w.win_id, v.i, v.s, p.s AS ps
        |        FROM w JOIN v ON v.doc_id = w.doc_id
        |          AND v.i >= w.win_id * 32 AND v.i < w.win_id * 32 + 64
        |        LEFT JOIN v p ON p.doc_id = v.doc_id AND p.i = v.i - 1),
        | ag AS (SELECT doc_id, win_id,
        |          CAST(sum(s * s) AS BIGINT) AS sum_sq,
        |          CAST(sum(CASE WHEN i > win_id * 32 AND ps * s < 0
        |                        THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
        |          CAST(max(abs(s)) AS BIGINT) AS peak
        |        FROM wv GROUP BY doc_id, win_id)
        |SELECT doc_id, CAST(win_id AS BIGINT) AS win_id,
        |  CAST(win_id * 32 AS BIGINT) AS start_sample, sum_sq, zero_crossings,
        |  peak,
        |  floor(sqrt(CAST(sum_sq AS DOUBLE) / 64.0) * 10000.0 + 0.5) / 10000.0 AS rms
        |FROM ag ORDER BY doc_id, win_id""".stripMargin,

    // m05: the pixel formula replayed directly — per-pixel integer
    // Rec.601 luma with floor division, summed per image; mean is
    // sum·1e4/64 (both factors exact in double) with half-up floor.
    "m05_image_roundtrip" ->
      """WITH ids AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
        |   FROM documents WHERE doc_id IS NOT NULL),
        | px AS (SELECT doc_id,
        |   (doc_id % 2147483648 + 2147483648) % 2147483648 AS sid,
        |   xs.i AS x, ys.i AS y FROM ids,
        |   (SELECT unnest(range(0, 8)) AS i) xs,
        |   (SELECT unnest(range(0, 8)) AS i) ys),
        | lum AS (SELECT doc_id,
        |    ((((sid * 31 + x * 7 + y * 13) % 256 + 256) % 256) * 299 +
        |     (((sid * 17 + x * 3 + y * 5) % 256 + 256) % 256) * 587 +
        |     (((sid * 11 + x * 19 + y * 23) % 256 + 256) % 256) * 114) // 1000 AS l
        |   FROM px),
        | agg AS (SELECT doc_id, CAST(sum(l) AS BIGINT) AS s
        |   FROM lum GROUP BY doc_id)
        |SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |  floor(CAST(s AS DOUBLE) * 10000.0 / 64 + 0.5) / 10000.0 AS mean_luma
        |FROM agg ORDER BY doc_id""".stripMargin,

    // m06: the m05 pixel formula replayed at the nearest-neighbor
    // SAMPLE coordinates only (x·8 // 4 = the source pixel the
    // index-math kernel reads); same integer luma + half-up mean.
    // m10: frame seed = bounded(doc_id)·97 + f (bounded FIRST — the
    // m05 wraparound lesson), per-frame luma sum via the shared pixel
    // formula, lag + |Δ| > 3000 cut detector.
    "m10_scene_cuts" ->
      """WITH ids AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
        |   FROM documents WHERE doc_id IS NOT NULL),
        | fr AS (SELECT doc_id,
        |   ((doc_id % 2147483648 + 2147483648) % 2147483648) * 97 + fs.i AS fid,
        |   fs.i AS f FROM ids, (SELECT unnest(range(0, 6)) AS i) fs),
        | px AS (SELECT doc_id, f, fid % 2147483648 AS sid,
        |   xs.i AS x, ys.i AS y FROM fr,
        |   (SELECT unnest(range(0, 8)) AS i) xs,
        |   (SELECT unnest(range(0, 8)) AS i) ys),
        | sums AS (SELECT doc_id, f, CAST(sum(
        |    ((((sid * 31 + x * 7 + y * 13) % 256 + 256) % 256) * 299 +
        |     (((sid * 17 + x * 3 + y * 5) % 256 + 256) % 256) * 587 +
        |     (((sid * 11 + x * 19 + y * 23) % 256 + 256) % 256) * 114) // 1000)
        |   AS BIGINT) AS s
        |   FROM px GROUP BY doc_id, f),
        | d AS (SELECT doc_id, f, s,
        |    lag(s) OVER (PARTITION BY doc_id ORDER BY f) AS ps FROM sums),
        | c AS (SELECT doc_id, f,
        |    CASE WHEN ps IS NOT NULL AND abs(s - ps) > 3000 THEN 1 ELSE 0 END AS cut
        |   FROM d)
        |SELECT doc_id, CAST(6 AS BIGINT) AS n_frames,
        |  CAST(sum(cut) AS BIGINT) AS n_cuts,
        |  CAST(coalesce(min(CASE WHEN cut = 1 THEN f END), -1) AS BIGINT) AS first_cut
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // m14: full pixel-formula replay — luma grid (with the variant's
    // one-pixel red bump) → integer-mean aHash bits → 16-bit band
    // values → the same band self-join + xor/bit_count verify.
    "m14_image_neardup" ->
      """WITH ids AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
        |   FROM documents WHERE doc_id IS NOT NULL),
        | px AS (SELECT doc_id,
        |   ((doc_id // 4) % 2147483648 + 2147483648) % 2147483648 AS sid,
        |   ((doc_id % 4) + 4) % 4 AS variant, xs.i AS x, ys.i AS y FROM ids,
        |   (SELECT unnest(range(0, 8)) AS i) xs,
        |   (SELECT unnest(range(0, 8)) AS i) ys),
        | lum AS (SELECT doc_id, y * 8 + x AS j,
        |    (((((sid * 31 + x * 7 + y * 13) % 256 + 256) % 256
        |       + CASE WHEN variant > 0 AND x = variant AND y = 0
        |              THEN 100 ELSE 0 END) % 256) * 299 +
        |     (((sid * 17 + x * 3 + y * 5) % 256 + 256) % 256) * 587 +
        |     (((sid * 11 + x * 19 + y * 23) % 256 + 256) % 256) * 114) // 1000 AS l
        |   FROM px),
        | tot AS (SELECT doc_id, sum(l) AS s FROM lum GROUP BY doc_id),
        | bits AS (SELECT lum.doc_id, j // 16 AS bidx,
        |     CASE WHEN l * 64 > s THEN CAST(1 AS BIGINT) << CAST(j % 16 AS INT)
        |          ELSE 0 END AS bit
        |   FROM lum JOIN tot USING (doc_id)),
        | bnd AS (SELECT doc_id, bidx, CAST(sum(bit) AS BIGINT) AS bv
        |   FROM bits GROUP BY doc_id, bidx),
        | hsh AS (SELECT doc_id,
        |     CAST(sum(CASE WHEN bidx = 0 THEN bv END) AS BIGINT) AS v0,
        |     CAST(sum(CASE WHEN bidx = 1 THEN bv END) AS BIGINT) AS v1,
        |     CAST(sum(CASE WHEN bidx = 2 THEN bv END) AS BIGINT) AS v2,
        |     CAST(sum(CASE WHEN bidx = 3 THEN bv END) AS BIGINT) AS v3
        |   FROM bnd GROUP BY doc_id),
        | bb AS (SELECT h.doc_id, b.bidx, b.bv, v0, v1, v2, v3
        |   FROM hsh h JOIN bnd b USING (doc_id)),
        | cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |     bit_count(xor(a.v0, b.v0)) + bit_count(xor(a.v1, b.v1)) +
        |     bit_count(xor(a.v2, b.v2)) + bit_count(xor(a.v3, b.v3)) AS hamming
        |   FROM bb a JOIN bb b ON a.bidx = b.bidx AND a.bv = b.bv
        |     AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        |FROM cand WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,

    // m15: pixel-formula replay → the 9-literal fixed-point cosine
    // table → separable integer DCT (row pass t, column pass sg) →
    // sign bits → the same band self-join as m14. All integer.
    "m15_phash_neardup" ->
      """WITH ids AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
        |   FROM documents WHERE doc_id IS NOT NULL),
        | px AS (SELECT doc_id,
        |   ((doc_id // 4) % 2147483648 + 2147483648) % 2147483648 AS sid,
        |   ((doc_id % 4) + 4) % 4 AS variant, xs.i AS x, ys.i AS y FROM ids,
        |   (SELECT unnest(range(0, 8)) AS i) xs,
        |   (SELECT unnest(range(0, 8)) AS i) ys),
        | lum AS (SELECT doc_id, y * 8 + x AS j,
        |    (((((sid * 31 + x * 7 + y * 13) % 256 + 256) % 256
        |       + CASE WHEN variant > 0 AND x = variant AND y = 0
        |              THEN 100 ELSE 0 END) % 256) * 299 +
        |     (((sid * 17 + x * 3 + y * 5) % 256 + 256) % 256) * 587 +
        |     (((sid * 11 + x * 19 + y * 23) % 256 + 256) % 256) * 114) // 1000 AS l
        |   FROM px),
        | kt AS (SELECT u, x, CASE WHEN r <= 8
        |     THEN ([10000,9808,9239,8315,7071,5556,3827,1951,0])[r + 1]
        |     ELSE -([10000,9808,9239,8315,7071,5556,3827,1951,0])[17 - r] END AS k
        |   FROM (SELECT uu.i AS u, xx.i AS x,
        |       least(((2 * xx.i + 1) * uu.i) % 32,
        |             32 - ((2 * xx.i + 1) * uu.i) % 32) AS r
        |     FROM (SELECT unnest(range(0, 8)) AS i) uu,
        |          (SELECT unnest(range(0, 8)) AS i) xx)),
        | t AS (SELECT l.doc_id, k.u AS u, l.j // 8 AS y,
        |     CAST(sum(l.l * k.k) AS BIGINT) AS tv
        |   FROM lum l JOIN kt k ON k.x = l.j % 8 GROUP BY 1, 2, 3),
        | sg AS (SELECT t.doc_id, t.u, k.u AS v,
        |     CAST(sum(t.tv * k.k) AS BIGINT) AS sv
        |   FROM t JOIN kt k ON k.x = t.y GROUP BY 1, 2, 3),
        | bits AS (SELECT doc_id, (u * 8 + v) // 16 AS bidx,
        |     CASE WHEN sv > 0
        |          THEN CAST(1 AS BIGINT) << CAST((u * 8 + v) % 16 AS INT)
        |          ELSE 0 END AS bit
        |   FROM sg),
        | bnd AS (SELECT doc_id, bidx, CAST(sum(bit) AS BIGINT) AS bv
        |   FROM bits GROUP BY doc_id, bidx),
        | hsh AS (SELECT doc_id,
        |     CAST(sum(CASE WHEN bidx = 0 THEN bv END) AS BIGINT) AS v0,
        |     CAST(sum(CASE WHEN bidx = 1 THEN bv END) AS BIGINT) AS v1,
        |     CAST(sum(CASE WHEN bidx = 2 THEN bv END) AS BIGINT) AS v2,
        |     CAST(sum(CASE WHEN bidx = 3 THEN bv END) AS BIGINT) AS v3
        |   FROM bnd GROUP BY doc_id),
        | bb AS (SELECT h.doc_id, b.bidx, b.bv, v0, v1, v2, v3
        |   FROM hsh h JOIN bnd b USING (doc_id)),
        | cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |     bit_count(xor(a.v0, b.v0)) + bit_count(xor(a.v1, b.v1)) +
        |     bit_count(xor(a.v2, b.v2)) + bit_count(xor(a.v3, b.v3)) AS hamming
        |   FROM bb a JOIN bb b ON a.bidx = b.bidx AND a.bv = b.bv
        |     AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        |FROM cand WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,

    // m09: the m06 pixel-formula replay grouped by patch coordinates
    // (x//4, y//4) — integer luma sum/min/max per tile.
    "m09_image_patches" ->
      """WITH ids AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
        |   FROM documents WHERE doc_id IS NOT NULL),
        | px AS (SELECT doc_id,
        |   (doc_id % 2147483648 + 2147483648) % 2147483648 AS sid,
        |   xs.i AS x, ys.i AS y FROM ids,
        |   (SELECT unnest(range(0, 8)) AS i) xs,
        |   (SELECT unnest(range(0, 8)) AS i) ys),
        | lum AS (SELECT doc_id, y // 4 AS patch_row, x // 4 AS patch_col,
        |    ((((sid * 31 + x * 7 + y * 13) % 256 + 256) % 256) * 299 +
        |     (((sid * 17 + x * 3 + y * 5) % 256 + 256) % 256) * 587 +
        |     (((sid * 11 + x * 19 + y * 23) % 256 + 256) % 256) * 114) // 1000 AS l
        |   FROM px)
        |SELECT doc_id, CAST(patch_row AS INT) AS patch_row,
        |  CAST(patch_col AS INT) AS patch_col,
        |  CAST(sum(l) AS BIGINT) AS sum_luma,
        |  CAST(min(l) AS BIGINT) AS min_luma,
        |  CAST(max(l) AS BIGINT) AS max_luma
        |FROM lum GROUP BY doc_id, patch_row, patch_col
        |ORDER BY doc_id, patch_row, patch_col""".stripMargin,

    "m06_image_resize" ->
      """WITH ids AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
        |   FROM documents WHERE doc_id IS NOT NULL),
        | px AS (SELECT doc_id,
        |   (doc_id % 2147483648 + 2147483648) % 2147483648 AS sid,
        |   (xs.i * 8) // 4 AS x, (ys.i * 8) // 4 AS y FROM ids,
        |   (SELECT unnest(range(0, 4)) AS i) xs,
        |   (SELECT unnest(range(0, 4)) AS i) ys),
        | lum AS (SELECT doc_id,
        |    ((((sid * 31 + x * 7 + y * 13) % 256 + 256) % 256) * 299 +
        |     (((sid * 17 + x * 3 + y * 5) % 256 + 256) % 256) * 587 +
        |     (((sid * 11 + x * 19 + y * 23) % 256 + 256) % 256) * 114) // 1000 AS l
        |   FROM px),
        | agg AS (SELECT doc_id, CAST(sum(l) AS BIGINT) AS s
        |   FROM lum GROUP BY doc_id)
        |SELECT doc_id, CAST(4 AS INT) AS out_w, CAST(4 AS INT) AS out_h,
        |  floor(CAST(s AS DOUBLE) * 10000.0 / 16 + 0.5) / 10000.0 AS mean_luma_resized
        |FROM agg ORDER BY doc_id""".stripMargin,

    // m02: Multimodal.fakeDecode mirrored byte-for-byte — b0/b1 and
    // the byte sum are decoded from hex pairs (16·hi + lo via strpos
    // into the hex alphabet); mean is one exact integer sum and one
    // correctly-rounded double division; half-up rounding is the same
    // floor(x*1e4+0.5)/1e4 IEEE op sequence in both engines.
    "m02_blob_decode" ->
      """WITH hb AS (SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS nb
        |  FROM documents),
        | f AS (
        |  SELECT doc_id, nb,
        |    CASE WHEN nb > 0 THEN
        |      16 * (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1)
        |        + strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1
        |      ELSE 0 END AS b0,
        |    CASE WHEN nb > 1 THEN
        |      16 * (strpos('0123456789ABCDEF', substr(h, 3, 1)) - 1)
        |        + strpos('0123456789ABCDEF', substr(h, 4, 1)) - 1
        |      ELSE 0 END AS b1,
        |    CASE WHEN nb = 0 THEN 0.0
        |         ELSE CAST(list_sum(list_transform(range(1, nb + 1),
        |             i -> 16 * (strpos('0123456789ABCDEF', substr(h, 2*i - 1, 1)) - 1)
        |                  + strpos('0123456789ABCDEF', substr(h, 2*i, 1)) - 1)) AS DOUBLE)
        |              / CAST(nb AS DOUBLE) END AS mean
        |  FROM hb)
        |SELECT doc_id,
        |  64 + (b0 % 64) AS width,
        |  64 + (b1 % 64) AS height,
        |  1 + (nb % 8) AS n_frames,
        |  floor(mean * 10000 + 0.5) / 10000 AS mean_byte
        |FROM f ORDER BY doc_id""".stripMargin
  )
}
