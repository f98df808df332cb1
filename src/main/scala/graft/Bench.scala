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
    // Untimed warmup: exercise the parquet reader, shuffle machinery,
    // window path, and codegen/JIT infra once so the first timed query
    // doesn't pay cold-start costs.
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val li = graft.Graft.table(spark, sfDir, "lineitem").limit(50000)
      li.groupBy("l_returnflag").agg(sum("l_quantity")).count()
      li.withColumn("rn",
        row_number().over(Window.partitionBy("l_suppkey").orderBy("l_orderkey"))).count()
      val o = graft.Graft.table(spark, sfDir, "orders").limit(50000)
      li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    } catch { case _: Throwable => }
    // SPARK_GRAFT_ONLY=d03,q01 → bench just matching queries (debug).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
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
