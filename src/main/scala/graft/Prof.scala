package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job wall-clock profiler for one or more SparkEntry queries:
  * prints every Spark job's duration with its call site, so a
  * multi-action operator (DML commits, store lifecycles) can be
  * attributed line-by-line. Warmup run first (JIT/codegen), then the
  * timed run — mirrors the bench's steady-state methodology.
  *
  * Usage: runMain graft.Prof <sfDir> <name>[,<name>...]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) = args match {
      case Array(d, n) => (d, n)
      case _ => System.err.println("usage: graft.Prof <sfDir> <name>[,...]"); sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val epoch = new java.util.concurrent.atomic.AtomicLong(System.currentTimeMillis())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // the result stage's name is the action's call site
        // ("collect at TableLog.scala:2676") — exact attribution
        val site = js.stageInfos.sortBy(_.stageId).lastOption
          .map(_.name).getOrElse("?")
        val nTasks = js.stageInfos.map(_.numTasks).sum
        starts.put(js.jobId, (js.time, s"$site tasks=$nTasks"))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, site) =>
          val rel0 = (t0 - epoch.get()) / 1000.0
          println(f"[prof] job ${je.jobId}%4d ${(je.time - t0) / 1000.0}%8.3f s  @+$rel0%8.3f  $site")
        }
      }
    })
    // reset the relative-timestamp epoch at each query's timed-run start
    def resetEpoch(): Unit = epoch.set(System.currentTimeMillis())
    names.split(",").foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query $n"))
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        System.err.println(s"[prof] warmup $n failed: ${e.getMessage}") }
      spark.catalog.clearCache()
      // let listener-bus drain so warmup jobs don't interleave the header
      Thread.sleep(500)
      println(s"==== $n ====")
      resetEpoch()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[prof] TOTAL $n $dt%.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
