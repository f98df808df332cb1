package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for each query so
  * pushdown (PushedFilters/ReadSchema), broadcast joins, and
  * whole-stage-codegen spans can be inspected. Usage:
  *   runMain graft.Explain <sfDir> [queryPrefix,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only = args.lift(1).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.exists(name.startsWith))) {
        println(s"\n===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
