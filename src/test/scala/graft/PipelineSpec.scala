package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FlowCyto
import graft.sources.{FcsSource, TidyIO}

/** End-to-end run of the reference workflow: FCS ingest → spillover
  * compensation → arcsinh transform → gate → per-sample stats → tidy
  * emit. One spec, the whole pipeline surface.
  */
class PipelineSpec extends AnyFunSuite {
  import SharedSpark.spark

  test("full FCS pipeline: ingest, compensate, transform, gate, summarize, emit") {
    val dir = java.nio.file.Files.createTempDirectory("pipeline").toString

    // 1. two FCS "samples" with a spillover matrix
    val spill = Array(Array(1.0, 0.08), Array(0.05, 1.0))
    val kw = Map("$SPILLOVER" -> ("2,FL1,FL2," + spill.flatten.mkString(",")))
    val rnd = new scala.util.Random(7)
    def events(n: Int, scale: Double) = Seq.fill(n) {
      val t1 = math.abs(rnd.nextGaussian()) * scale
      val t2 = math.abs(rnd.nextGaussian()) * scale / 2
      // observed = true × S
      Array(t1 * spill(0)(0) + t2 * spill(1)(0), t1 * spill(0)(1) + t2 * spill(1)(1))
    }
    FcsSource.write(s"$dir/sampleA.fcs", Seq("FL1", "FL2"), events(500, 1000.0), kw)
    FcsSource.write(s"$dir/sampleB.fcs", Seq("FL1", "FL2"), events(300, 200.0), kw)

    // 2. ingest + extract the spillover matrix from the file itself
    val raw = FcsSource.read(spark, s"$dir/*.fcs")
    assert(raw.count() == 800)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/sampleA.fcs"))
    val Some((_, m)) = FcsSource.spilloverMatrix(FcsSource.parseMeta(bytes).keywords)

    // 3. compensate → 4. arcsinh → 5. gate → 6. per-sample stats
    val comp = FlowCyto.compensate(raw, Seq(col("FL1"), col("FL2")), m,
      Seq("cFL1", "cFL2"), round_ = 6)
    val scaled = comp
      .withColumn("aFL1", FlowCyto.arcsinhChannel(col("cFL1"), 150.0))
      .withColumn("sample", regexp_extract(col("file"), "sample([AB])", 1))
    val gated = scaled.filter(
      FlowCyto.rectGate(col("cFL1"), col("cFL2"), 100.0, 1e9, 0.0, 1e9))
    val stats = FlowCyto.channelStats(gated, col("aFL1"), Seq("sample"))
      .orderBy("sample")

    val rows = stats.collect()
    assert(rows.map(_.getAs[String]("sample")).toSeq == Seq("A", "B"))
    // sample A has 5× the scale → higher arcsinh'd median
    val medA = rows(0).getAs[Double]("median")
    val medB = rows(1).getAs[Double]("median")
    assert(medA > medB, s"medA=$medA medB=$medB")
    // compensation recovered positive true signals; arcsinh monotone →
    // every gated event has aFL1 within [asinh(100/150), asinh(max)]
    assert(gated.filter(col("aFL1") <= 0).count() == 0)

    // 7. tidy emit (partitioned by sample) and read-back equality
    TidyIO.writeClustered(stats.toDF(), s"$dir/tidy", Seq("sample"), Seq("n"))
    val back = spark.read.parquet(s"$dir/tidy")
    assert(back.count() == 2)
    assert(back.columns.toSet == stats.columns.toSet)
  }

  test("writeShards emits deterministic balanced shards with a faithful manifest") {
    val docs = Graft.table(spark, SharedSpark.sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    val manifest = TidyIO.writeShards(docs, "doc_id", "text", 8, dir).collect()
    // manifest totals match the corpus
    assert(manifest.map(_.getLong(1)).sum == docs.count())
    val expBytes = docs.agg(sum(length(col("text")).cast("long")))
      .head().getLong(0)
    assert(manifest.map(_.getLong(2)).sum == expBytes)
    // every shard non-empty and within 3x of fair share (hash balance)
    assert(manifest.length == 8)
    val fair = docs.count() / 8.0
    assert(manifest.forall(r => r.getLong(1) > 0 && r.getLong(1) < 3 * fair))
    // round trip: same rows, and each row sits in its hash shard
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    val misplaced = back.filter(
      col("shard") =!= graft.operators.Sampling.hashBucket(col("doc_id"), 8)).count()
    assert(misplaced == 0)
    // one file per shard (repartition on the shard key before write)
    val files = new java.io.File(dir).listFiles.filter(_.getName.startsWith("shard="))
      .map(d => d.getName -> d.listFiles.count(_.getName.endsWith(".parquet")))
    assert(files.length == 8 && files.forall(_._2 == 1), files.toSeq.toString)
  }

  test("clustered layout prunes partitions statically and dynamically (DPP)") {
    val sfDir = SharedSpark.sfDir
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val orders = Graft.table(spark, sfDir, "orders")
    TidyIO.writeClustered(orders, dir,
      partitionBy = Seq("o_orderpriority"), sortBy = Seq("o_orderkey"))
    val fact = spark.read.parquet(dir)
    val nPrio = orders.select("o_orderpriority").distinct().count()

    // static pruning: a literal partition predicate reaches the scan
    // as a PartitionFilter and cuts the files actually read (the
    // numFiles metric — Dataset.inputFiles lists pre-filter files)
    def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
      val qe = df.queryExecution
      qe.toRdd.count()   // run THIS plan so its scan metrics populate
      val plan = qe.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.getOrElse(sys.error(s"no file scan in:\n$plan"))
    }
    val one = fact.filter(col("o_orderpriority") === "1-URGENT")
    val staticScan = one.queryExecution.executedPlan.toString
    assert(staticScan.contains("PartitionFilters"), staticScan)
    assert(scanFiles(one) < scanFiles(fact),
      s"${scanFiles(one)} vs ${scanFiles(fact)}")

    // dynamic partition pruning: the partition predicate only exists
    // on the dim side at runtime; the fact scan still prunes via the
    // dynamicpruning subquery (broadcast reuse)
    val dim = orders.select(col("o_orderpriority").as("prio")).distinct()
      .withColumn("keep", col("prio").startsWith("1"))
    val joined = fact.join(dim.filter(col("keep")),
      fact("o_orderpriority") === dim("prio"))
    val n = joined.count()
    val dppScan = joined.queryExecution.executedPlan.toString
    assert(dppScan.contains("dynamicpruning"), dppScan)
    assert(n == orders.filter(col("o_orderpriority").startsWith("1")).count())
    assert(nPrio > 1)   // pruning actually had alternatives to skip
  }

  test("bucketed tables join without an Exchange (pre-shuffled layout)") {
    val sfDir = SharedSpark.sfDir
    val orders = Graft.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val items = Graft.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    TidyIO.writeBucketed(orders, "g_orders_b", "o_orderkey", 8,
      sortCols = Seq("o_orderkey"))
    TidyIO.writeBucketed(items, "g_items_b", "o_orderkey", 8,
      sortCols = Seq("o_orderkey"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the shuffle-join path so an Exchange WOULD appear if
      // bucketing didn't already co-locate the keys
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("g_orders_b")
        .join(spark.table("g_items_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      // (a per-partition Sort remains: since SPARK-28632 Spark ignores
      // bucket sort metadata at read time because one-file-per-bucket
      // isn't tracked in the catalog — the in-bucket sortBy still
      // pre-pays the work, the re-sort is over already-sorted runs)
      // and the result is the plain join's result
      val expected = orders.join(items, "o_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_items_b")
    }
  }

  test("persisted LSH index: probe is Exchange-free on the index side and equals the recompute form") {
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = Graft.table(spark, SharedSpark.sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val isBatch = pmod(col("doc_id"), lit(5)) === 0
    val batch = docs.filter(isBatch)
    val corpus = docs.filter(!isBatch)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      Dedup.writeLshIndex(corpus, "doc_id", "text", "g_lsh",
        numHashes = 32, bands = 8, shingleN = 3, cap = 100, buckets = 8)
      spark.catalog.clearCache()
      // force the shuffle-join path so an Exchange WOULD appear on the
      // index side if the bucketed layout didn't already co-locate it
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = Dedup.probeLshIndex(batch, "doc_id", "text", "g_lsh",
        threshold = 0.8, numHashes = 32, bands = 8, shingleN = 3)
      val exec = p.queryExecution.executedPlan
      def indexScans(pl: SparkPlan) = pl.collect {
        case s: FileSourceScanExec if s.tableIdentifier.exists(t =>
          t.table == "g_lsh_bands" || t.table == "g_lsh_sets") => s
      }
      assert(indexScans(exec).size == 2, s"expected both index scans:\n$exec")
      assert(exec.toString.contains("Bucketed: true"),
        s"bucketed scan not used:\n$exec")
      // each join child whose ONLY leaves are index-table scans (the
      // index side of the candidate and verify joins) must contain no
      // ShuffleExchange — only the batch side is allowed to shuffle
      val joins = exec.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      val indexSides = joins.flatMap(_.children).filter { c =>
        val leaves = c.collectLeaves()
        leaves.nonEmpty && leaves.forall {
          case s: FileSourceScanExec => s.tableIdentifier.exists(t =>
            t.table == "g_lsh_bands" || t.table == "g_lsh_sets")
          case _ => false
        }
      }
      assert(indexSides.size == 2,
        s"expected the two index-side join subtrees:\n$exec")
      indexSides.foreach { c =>
        assert(c.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          s"Exchange on the index side:\n$c")
      }
      val got = p.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      spark.catalog.clearCache()
      // equality with the pure recompute form (d27's oracle contract)
      val ref = Dedup.minhashAgainstIndex(batch, corpus, "doc_id", "text",
          threshold = 0.8, numHashes = 32, bands = 8, shingleN = 3, cap = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == ref, s"probe=${got.size} recompute=${ref.size}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.catalog.clearCache()
      spark.sql("DROP TABLE IF EXISTS g_lsh_bands")
      spark.sql("DROP TABLE IF EXISTS g_lsh_sets")
    }
  }

  test("purged LSH index probes exactly like an index built from the purged corpus") {
    // d37's deletion-propagation contract. One deliberate asymmetry:
    // the hot-bucket cap is applied AT BUILD — a purge only shrinks
    // buckets and never resurrects build-dropped rows — so the
    // reference build uses the SAME keep set (cap high enough here
    // that no bucket caps, making purge-then-probe and
    // build-from-purged identical).
    import graft.operators.Dedup
    val docs = Graft.table(spark, SharedSpark.sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val isBatch = pmod(col("doc_id"), lit(5)) === 0
    val batch = docs.filter(isBatch)
    val corpus = docs.filter(!isBatch)
    val isTomb = pmod(col("doc_id"), lit(17)) === 3
    try {
      Dedup.writeLshIndex(corpus, "doc_id", "text", "g_pg_v1",
        numHashes = 64, bands = 8, shingleN = 1, cap = 100000, buckets = 8)
      Dedup.purgeLshIndex(spark, "g_pg_v1", "g_pg_v2",
        docs.filter(isTomb).select(col("doc_id").as("id")), buckets = 8)
      spark.catalog.clearCache()
      def pairs(prefix: String) =
        Dedup.probeLshIndex(batch, "doc_id", "text", prefix,
            threshold = 0.9, numHashes = 64, bands = 8, shingleN = 1)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val purged = pairs("g_pg_v2")
      // 1. no output row references a tombstoned corpus id
      assert(purged.forall { case (_, cid, _) => cid % 17 != 3 })
      // 2. the purge actually removed something on this instance
      val v1 = pairs("g_pg_v1")
      assert(v1.exists { case (_, cid, _) => cid % 17 == 3 },
        "test instance too easy: no tombstoned pair existed pre-purge")
      assert(purged == v1.filter { case (_, cid, _) => cid % 17 != 3 })
      // 3. equality with an index BUILT from the purged corpus
      Dedup.writeLshIndex(corpus.filter(!isTomb), "doc_id", "text", "g_pg_ref",
        numHashes = 64, bands = 8, shingleN = 1, cap = 100000, buckets = 8)
      spark.catalog.clearCache()
      assert(pairs("g_pg_ref") == purged)
    } finally {
      spark.catalog.clearCache()
      Seq("g_pg_v1", "g_pg_v2", "g_pg_ref").foreach { p =>
        spark.sql(s"DROP TABLE IF EXISTS ${p}_bands")
        spark.sql(s"DROP TABLE IF EXISTS ${p}_sets")
      }
    }
  }
}
