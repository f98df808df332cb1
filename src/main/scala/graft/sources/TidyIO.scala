package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tidy-table emit/ingest (the reference pipeline's output step:
  * analysis-ready CSV/parquet tables).
  *
  * Scale notes: `writeClustered` is the 100 TB-friendly layout —
  * partition directories on a low-cardinality key for partition
  * pruning, rows sorted within files on the query key so min/max
  * row-group stats prune reads. CSV is for interop/export only.
  */
object TidyIO {

  /** pid-suffixed /tmp scratch dir for driver-verified IO queries
    * (q53's avro round-trip, d29's persisted LSH index). Returns
    * `/tmp/<tag>_<pid>` after deleting (a) any remnant at that exact
    * path — a recycled pid must not read a dead run's files — and
    * (b) every sibling `<tag>_<otherPid>` whose owning process is no
    * longer alive, so contended Bench/Verify invocations never
    * interleave yet nothing accumulates across runs. The query's own
    * dir is reclaimed by the NEXT invocation's sweep (it cannot be
    * deleted eagerly: the returned DataFrame is lazy, the read
    * happens at the driver's action).
    */
  def scratchDir(tag: String): String = {
    val self = ProcessHandle.current().pid()
    val re = (java.util.regex.Pattern.quote(tag) + "_(\\d+)").r
    Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
      .foreach { f =>
        f.getName match {
          case re(p) =>
            val pid = p.toLong
            val alive = pid != self && {
              val h = ProcessHandle.of(pid)
              h.isPresent && h.get.isAlive
            }
            if (!alive) deleteRecursively(f.toPath)
          case _ => ()
        }
      }
    s"/tmp/${tag}_$self"
  }

  /** Best-effort recursive delete (never throws — scratch cleanup
    * must not fail a query).
    */
  def deleteRecursively(root: java.nio.file.Path): Unit =
    try {
      import java.nio.file.Files
      import scala.jdk.CollectionConverters._
      if (Files.exists(root)) {
        Files.walk(root).iterator().asScala.toSeq.reverseIterator
          .foreach(p => Files.deleteIfExists(p))
      }
    } catch { case _: Throwable => () }

  /** Partition-pruned, sorted parquet layout. */
  def writeClustered(df: DataFrame, path: String,
                     partitionBy: Seq[String], sortBy: Seq[String]): Unit =
    df.repartition(partitionBy.map(df.col): _*)
      .sortWithinPartitions((partitionBy ++ sortBy).map(df.col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionBy: _*)
      .parquet(path)

  /** Bucketed managed table: pre-shuffled storage layout. Both fact
    * tables of a recurring join written with the SAME bucket count on
    * the join key make every future join between them SHUFFLE-FREE —
    * Spark matches bucket files pairwise instead of exchanging rows.
    * At 100 TB this moves the join's O(|data|) network cost to write
    * time, paid once and amortized over every downstream query; with
    * `sortCols` the per-bucket sort is pre-paid too (the read side
    * still inserts a defensive per-partition Sort — Spark ignores
    * bucket sort metadata since SPARK-28632 because one-file-per-
    * bucket isn't catalog-tracked — but it runs over already-sorted
    * runs). PipelineSpec asserts the Exchange-free bucketed plan.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit =
    writeBucketedCols(df, table, Seq(bucketCol), buckets, sortCols)

  /** Composite-key form of [[writeBucketed]] (e.g. an LSH index
    * bucketed on (band, bucket) — see Dedup.writeLshIndex): a join on
    * exactly these columns reads the table with no Exchange on this
    * side.
    */
  def writeBucketedCols(df: DataFrame, table: String, bucketCols: Seq[String],
                        buckets: Int, sortCols: Seq[String] = Nil,
                        path: Option[String] = None): Unit = {
    require(bucketCols.nonEmpty)
    // Pre-shuffle on the bucket columns (same murmur3 hash as the
    // bucket id): ONE file per bucket instead of tasks×buckets small
    // files — and Spark only elides the downstream Sort for sorted
    // buckets when each bucket is a single file. With `path` the
    // table is EXTERNAL (data at the path, bucketing metadata in the
    // catalog) — what driver runs use so nothing lands in the
    // session's default warehouse directory.
    val w0 = df.repartition(buckets, bucketCols.map(df.col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val w = path.fold(w0)(p => w0.option("path", p))
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Training-shard writer: the final corpus-emit step of an LLM data
    * pipeline — N deterministic shards assigned by the portable id
    * hash (so the same row lands in the same shard on any engine or
    * rerun), one file per shard, plus a manifest of per-shard row and
    * payload-byte counts. Downstream loaders stream shard files
    * round-robin; the hash assignment balances shards to ±O(√(n/N))
    * without any global sort or size-measuring pass. Returns the
    * manifest (shard, n_rows, n_payload_bytes).
    */
  def writeShards(df: DataFrame, idCol: String, payloadCol: String,
                  nShards: Int, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val sharded = df.withColumn("shard",
      graft.operators.Sampling.hashBucket(col(idCol), nShards))
    sharded.repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    sharded.groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        sum(length(col(payloadCol)).cast("long")).as("n_payload_bytes"))
      .orderBy("shard")
  }

  /** CSV export with header (the reference's tabular emit format). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)

  /** CSV ingest with schema inference disabled by default — pass an
    * explicit DDL schema for production reads (inference is a full
    * extra pass over the data).
    */
  def readCsv(spark: SparkSession, path: String, schemaDdl: Option[String] = None): DataFrame = {
    val r = spark.read.option("header", "true")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    schemaDdl.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  /** CSV ingest with the PERMISSIVE quarantine path — readJsonl's
    * twin for the OTHER format 100 TB corpora actually arrive in.
    * Malformed records land in `_corrupt_record` instead of killing
    * the job; unlike JSON (where a broken line loses every field),
    * the CSV parser PARTIALLY RECOVERS a bad record — leading fields
    * that tokenize and type-check are kept, only the missing/
    * type-invalid ones are NULLed — which q66 certifies
    * value-for-value. FAILFAST remains the strict alternative via a
    * plain `spark.read.option("mode","FAILFAST")`.
    */
  def readCsvQuarantine(spark: SparkSession, path: String, schemaDdl: String,
                        header: Boolean = false): DataFrame =
    spark.read.option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schemaDdl + ", _corrupt_record STRING")
      .csv(path)

  /** JSON-Lines export — the interchange format LLM corpora ship in.
    * One JSON object per line; gzip keeps the files splittable-enough
    * in practice (one file per task, sized by upstream repartition).
    */
  def writeJsonl(df: DataFrame, path: String, gzip: Boolean = false): Unit = {
    val w = df.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** JSON-Lines ingest. Always pass the DDL schema in production:
    * schema inference reads the whole dataset once before the real
    * job, and a drifting inferred schema breaks downstream plans.
    * Corrupt lines land in `_corrupt_record` instead of failing the
    * 100 TB job (PERMISSIVE mode).
    */
  def readJsonl(spark: SparkSession, path: String,
                schemaDdl: Option[String] = None): DataFrame = {
    val r = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    schemaDdl.fold(r)(s => r.schema(s + ", _corrupt_record STRING")).json(path)
  }

  /** ORC export — the other columnar interchange format warehouses
    * speak. Same pushdown/pruning properties as parquet (min/max
    * stripe stats, column projection), zlib-compressed by default.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** ORC ingest — predicate pushdown and column pruning apply exactly
    * as with parquet (`spark.sql.orc.filterPushdown` is on by
    * default in Spark 4).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
