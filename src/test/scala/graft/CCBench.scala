package graft

/** One-off measurement harness (Test scope): minLabel vs
  * alternatingStar on the REAL d07 dup-pair graph. Run with
  *   sbt "Test/runMain graft.CCBench /root/testdata/sf0.1"
  * Results feed the PERF.md decision of which round body d07/d09/d12
  * should use — this is a measurement tool, not a benchmark the
  * driver runs.
  */
object CCBench {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session()
    spark.sparkContext.setLogLevel("WARN")
    val pairs = graft.operators.Dedup.jaccardPairs(
      Graft.table(spark, dir, "documents"), "doc_id", "text",
      Seq(col("lang"), expr("n_chars div 100")), threshold = 0.9)
      .select("id_a", "id_b").persist()
    println(s"pairs: ${pairs.count()}")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warm both paths once at tiny scale is skipped — interleave 2 reps
    for (rep <- 1 to 2) {
      time(s"minLabel rep$rep") {
        graft.operators.ConnectedComponents.minLabel(pairs).count()
      }
      spark.catalog.clearCache(); pairs.persist().count()
      time(s"alternatingStar rep$rep") {
        graft.operators.ConnectedComponents.alternatingStar(pairs).count()
      }
      spark.catalog.clearCache(); pairs.persist().count()
    }
    spark.stop()
  }
}
