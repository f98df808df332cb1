package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.LongType

/** Drive a transform through the REAL Structured Streaming engine and
  * hand the result back as a batch DataFrame.
  *
  * `events` is re-read as a file-source stream (explicit schema — file
  * streams don't infer), the transform's plan runs under
  * MicroBatchExecution with `Trigger.AvailableNow()` (process all
  * files that exist now, then stop), and the output lands in a memory
  * sink whose table we return. This is what lets the driver's DuckDB
  * oracle check the *incremental* execution path — the executed plan
  * is a MicroBatchWrite epoch over StateStoreSave/StreamingDeduplicate
  * /StreamingSymmetricHashJoin operators (see StreamRunSpec).
  *
  * Determinism contract (what makes these oracle-checkable):
  *   - Complete-mode aggregations re-emit the whole state each
  *     trigger, so the final table equals the batch aggregate no
  *     matter how the input was chopped into micro-batches.
  *   - Append-mode *inner* joins emit a match in whichever batch
  *     completes the pair — the final SET of rows is batch-equal
  *     (watermarks only govern state cleanup, not inner-join output).
  *   - Append-mode dropDuplicates emits exactly one row per key; we
  *     only expose the key columns, because WHICH duplicate arrives
  *     at the state store first is arrival-order-dependent.
  * Aggregations whose *row payloads* depend on arrival order (keep-
  * first dedup) or need rank-over-closed-window (sliding top-k) stay
  * batch twins + stateful specs — see StreamQueries' per-query notes.
  *
  * Scale note: the memory sink is the verification harness, not the
  * production path — a real deployment points the same `writeStream`
  * at a parquet/kafka sink with a durable checkpoint dir. All state
  * here is bounded: complete-mode aggregates are O(groups), the
  * interval join's buffer is trimmed by its watermarks.
  */
object StreamRun {

  /** Physical plan of the most recent micro-batch execution — evidence
    * for specs/PERF audits that the incremental engine (MicroBatchScan
    * + StateStore operators) ran, not a batch rewrite. Captured via the
    * public `StreamingQuery.explain()` (prints lastExecution).
    */
  @volatile var lastPlan: String = ""

  /** Sink description of the most recent [[runToSink]] query — spec
    * evidence that the ENGINE drove the named sink (not a foreachBatch
    * shim).
    */
  @volatile var lastSinkDescription: String = ""

  /** Streamed read of `<dir>/<table>.parquet`: explicit schema from a
    * metadata-only batch read (file streams don't infer); the events
    * table's TIMESTAMP(NANOS) arrives as long and is truncated to
    * micro timestamps exactly like Graft.table does for batch. The
    * driver's tables are single .parquet FILES, and the file stream
    * source only accepts a non-glob path if it is a directory (it
    * force-sets basePath to it) — a glob path skips that check, so
    * the last character becomes a one-char character class.
    */
  def source(s: SparkSession, dir: String, table: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/$table.parquet"
    val schema = graft.Graft.inferredSchema(s, path)
    val globPath = path.dropRight(1) + "[" + path.last + "]"
    val raw = s.readStream.schema(schema).parquet(globPath)
    schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        // Same normalization as Graft.table: UTC session makes the
        // NTZ→TIMESTAMP cast a pure reinterpretation, and watermarks
        // require TIMESTAMP.
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Run `transform` on a streamed read of `<dir>/<table>.parquet`,
    * collect into a memory sink, return the sink contents.
    */
  def onTable(s: SparkSession, dir: String, table: String, mode: OutputMode)
             (transform: DataFrame => DataFrame): DataFrame =
    onSource(s, source(s, dir, table), mode)(transform)

  /** Run `transform` over an ARBITRARY streaming source DataFrame
    * (e.g. a binaryFile stream over tar shards — st22) through the
    * real engine; same memory-sink/checkpoint/plan-capture contract
    * as [[onTable]].
    */
  def onSource(s: SparkSession, src: DataFrame, mode: OutputMode)
              (transform: DataFrame => DataFrame): DataFrame = {
    val name = "graft_sink_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    // Stateful streaming cost here is dominated by per-partition state
    // stores (each maintains, snapshots, and commits one HDFS-backed
    // map per trigger — the interval join keeps FOUR stores per
    // partition), not by CPU: run the stream with fewer shuffle
    // partitions than the batch queries use. On a real cluster this is
    // the knob you size to state volume, not to core count.
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    // Checkpoint (offset WAL + per-partition state snapshots + commit
    // log — fsync'd once per store per trigger) goes to tmpfs when the
    // host has one: this harness's streams are verification runs whose
    // checkpoints are deleted on completion, so durability buys
    // nothing and the disk fsyncs are pure fixed cost. A production
    // deployment points this at durable storage — that knob is exactly
    // what `checkpointLocation` is.
    val ckptBase = sys.env.get("SPARK_GRAFT_STREAM_CKPT").orElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-ckpt") else None
    }
    val ckptDir = ckptBase.map(b => s"$b/$name")
    val q = try {
      val w = transform(src).writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
      ckptDir.foreach(d => w.option("checkpointLocation", d))
      w.start()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    // explicit checkpoint locations are not auto-deleted (unlike the
    // engine's temporary ones) — clean up in finally so tmpfs never
    // accumulates even when the run fails or is killed mid-stream.
    // (The dir name embeds this run's UUID, so a failed run can never
    // be *resumed* by a later one — the finally guards leakage only.)
    try q.awaitTermination()
    finally ckptDir.foreach { d =>
      try {
        import java.nio.file.{Files, Path}
        import scala.jdk.CollectionConverters._
        val root = Path.of(d)
        if (Files.exists(root)) {
          Files.walk(root).iterator().asScala.toSeq.reverseIterator
            .foreach(p => Files.deleteIfExists(p))
        }
      } catch { case _: Throwable => () }
    }
    try {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) { q.explain() }
      lastPlan = buf.toString
    } catch { case _: Throwable => lastPlan = "" }
    // Dataset construction analyzes eagerly, so the memory-sink
    // relation is captured in the plan and the temp view can go.
    val out = s.table(name)
    s.catalog.dropTempView(name)
    out
  }

  def onEvents(s: SparkSession, dir: String, mode: OutputMode)
              (transform: DataFrame => DataFrame): DataFrame =
    onTable(s, dir, "events", mode)(transform)

  /** Run `fn` as a `foreachBatch` sink over a streaming source — the
    * Structured Streaming pattern for sinks the built-in writers
    * can't express (MERGE upkeep, multi-table writes, upserts into a
    * store). Each micro-batch's DataFrame is handed to `fn` on the
    * driver with its batch id; the engine guarantees ids are
    * monotonically increasing and, under a checkpoint, that a batch
    * is re-delivered with the SAME id on recovery — so `fn` must be
    * idempotent per id (the commit-version-per-batch discipline st25
    * uses gets this for free: re-running batch k just re-creates
    * version k's state from the same inputs).
    *
    * Same checkpoint/trigger/plan-capture/cleanup contract as
    * [[onSource]]; returns the number of micro-batches executed.
    */
  /** Drive `src` into a format SINK (st33's native graftlog sink)
    * through the real engine under Trigger.AvailableNow — the
    * no-user-code twin of [[runForeachBatch]]. Returns the sink's
    * appId default input (the checkpoint location used), so callers
    * can replay a batch against the same identity.
    */
  def runToSink(s: SparkSession, src: DataFrame, fmt: String,
                options: Map[String, String],
                mode: OutputMode = OutputMode.Append()): Option[String] = {
    val name = "graft_sink_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    val ckptBase = sys.env.get("SPARK_GRAFT_STREAM_CKPT").orElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-ckpt") else None
    }
    val ckptDir = ckptBase.map(b => s"$b/$name")
    val q = try {
      val w = src.writeStream.queryName(name).format(fmt)
        .outputMode(mode).trigger(Trigger.AvailableNow())
      options.foreach { case (k, v) => w.option(k, v) }
      ckptDir.foreach(d => w.option("checkpointLocation", d))
      w.start()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try q.awaitTermination()
    finally ckptDir.foreach { d =>
      try {
        import java.nio.file.{Files, Path}
        import scala.jdk.CollectionConverters._
        val root = Path.of(d)
        if (Files.exists(root))
          Files.walk(root).iterator().asScala.toSeq.reverseIterator
            .foreach(p => Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }
    try {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) { q.explain() }
      lastPlan = buf.toString
    } catch { case _: Throwable => lastPlan = "" }
    lastSinkDescription =
      Option(q.lastProgress).map(_.sink.description).getOrElse("")
    ckptDir
  }

  /** Drive `src` into a CATALOG TABLE by name through the real engine
    * (`writeStream.format("graftlog").toTable(name)` — the fmt is
    * required because Spark's V1-fallback sink path insists the
    * writer's format match the table's provider, Delta's documented
    * shape too). Same checkpoint/trigger contract as [[runToSink]].
    */
  def runToTable(s: SparkSession, src: DataFrame, table: String,
                 options: Map[String, String] = Map.empty,
                 mode: OutputMode = OutputMode.Append()): Unit = {
    val name = "graft_tbl_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    val ckptBase = sys.env.get("SPARK_GRAFT_STREAM_CKPT").orElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-ckpt") else None
    }
    val ckptDir = ckptBase.map(b => s"$b/$name")
    val q = try {
      val w = src.writeStream.queryName(name).format("graftlog")
        .outputMode(mode).trigger(Trigger.AvailableNow())
      options.foreach { case (k, v) => w.option(k, v) }
      ckptDir.foreach(d => w.option("checkpointLocation", d))
      w.toTable(table)
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try q.awaitTermination()
    finally ckptDir.foreach { d =>
      try {
        import java.nio.file.{Files, Path}
        import scala.jdk.CollectionConverters._
        val root = Path.of(d)
        if (Files.exists(root))
          Files.walk(root).iterator().asScala.toSeq.reverseIterator
            .foreach(p => Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }
  }

  def runForeachBatch(s: SparkSession, src: DataFrame)
                     (fn: (DataFrame, Long) => Unit): Long = {
    val name = "graft_feb_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    val ckptBase = sys.env.get("SPARK_GRAFT_STREAM_CKPT").orElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-ckpt") else None
    }
    val ckptDir = ckptBase.map(b => s"$b/$name")
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = try {
      val w = src.writeStream
        .queryName(name)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          batches.incrementAndGet(); fn(df, id)
        }
        .trigger(Trigger.AvailableNow())
      ckptDir.foreach(d => w.option("checkpointLocation", d))
      w.start()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try q.awaitTermination()
    finally ckptDir.foreach { d =>
      try {
        import java.nio.file.{Files, Path}
        import scala.jdk.CollectionConverters._
        val root = Path.of(d)
        if (Files.exists(root)) {
          Files.walk(root).iterator().asScala.toSeq.reverseIterator
            .foreach(p => Files.deleteIfExists(p))
        }
      } catch { case _: Throwable => () }
    }
    try {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) { q.explain() }
      lastPlan = buf.toString
    } catch { case _: Throwable => lastPlan = "" }
    batches.get()
  }
}
