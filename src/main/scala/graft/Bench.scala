package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=d03,q01 → bench just matching queries (debug).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
    }
    // Untimed warmup: exercise the parquet reader, shuffle machinery,
    // window path, and codegen/JIT infra so the timed runs measure
    // steady-state throughput, not first-call compilation. Interpreted
    // expression trees JIT-warm at ~8× their steady cost, so each
    // query's own code path is exercised once at the smallest SF
    // (sibling sf0.001 dir when present, else a limited slice of the
    // bench SF). SPARK_GRAFT_WARMUP=0 disables.
    if (!sys.env.get("SPARK_GRAFT_WARMUP").contains("0")) {
      val small = {
        val sib = new java.io.File(new java.io.File(sfDir).getParent, "sf0.001")
        if (sib.isDirectory) sib.getAbsolutePath else sfDir
      }
      selected.foreach { case (_, fn) =>
        try { fn(spark, small).count() } catch { case _: Throwable => }
        spark.catalog.clearCache()
      }
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // Operators that persist intermediates (self-join reuse) must not
      // carry that cache into the next query's measurement.
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
