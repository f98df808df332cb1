package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** R98 — the SQL maintenance surface: Spark 4 stored procedures
  * (`CALL graft.system.<proc>(...)`) over the registered
  * ProcedureCatalog, each delegating to the SAME TableLog primitive
  * its programmatic twin uses. Pins the end-to-end CALL path for the
  * operational verbs (compact, vacuum incl. dry-run, analyze,
  * restore, history, rename/drop column, clone, sync), value
  * equality with the API, and the loud unknown-procedure error.
  */
class GraftCatalogSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._
  import graft.sources.TableLog

  private def freshRoot(tag: String): String = {
    val p = s"/tmp/graftcat_${tag}_${ProcessHandle.current().pid()}"
    graft.sources.TidyIO.deleteRecursively(java.nio.file.Paths.get(p))
    p
  }
  private def mkDf(ks: Seq[Long]) = ks.map(k => (k, k * 10 + 1)).toDF("k", "cents")
  private def rows(root: String): Set[(Long, Long)] =
    TableLog.read(spark, root).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("CALL compact/vacuum/history: the maintenance loop end to end through SQL") {
    val root = freshRoot("maint")
    TableLog.commit(mkDf(0L until 100L), root, expr("k div 25"), 4, "overwrite")
    TableLog.commit(mkDf(100L until 120L), root, expr("k div 25"), 2, "append")
    // compact through CALL: one new version, content preserved
    val v = spark.sql(
      s"CALL graft.system.compact(path => '$root', order_col => 'k')")
      .head().getLong(0)
    assert(v == 2L && rows(root) == mkDf(0L until 120L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    // dry-run vacuum reports without deleting; real vacuum matches it
    val dry = spark.sql(
      s"CALL graft.system.vacuum(path => '$root', keep_from => 2, dry_run => true)")
      .collect().map(_.getString(0)).toSeq
    assert(dry.nonEmpty)
    assert(TableLog.read(spark, root, Some(0L)).count() == 100L,
      "dry run must not delete")
    val real = spark.sql(
      s"CALL graft.system.vacuum(path => '$root', keep_from => 2)")
      .collect().map(_.getString(0)).toSeq
    assert(real == dry, s"real vacuum must match the dry run: $dry vs $real")
    // history through CALL equals the API frame
    val hist = spark.sql(s"CALL graft.system.history(path => '$root')")
      .orderBy("version").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(hist.map(_._1).toSeq == Seq(2L) && hist.head._2 == "compact")
  }

  test("CALL restore/rename_column/drop_column/analyze: schema + state verbs") {
    val root = freshRoot("schema")
    TableLog.commit(mkDf(0L until 50L), root, expr("k div 25"), 2, "overwrite")
    spark.sql(s"CALL graft.system.rename_column(path => '$root', " +
      "from => 'cents', to => 'price')")
    assert(TableLog.read(spark, root).columns.toSeq == Seq("k", "price"))
    val art = spark.sql(
      s"CALL graft.system.analyze(path => '$root', columns => 'k,price')")
      .head().getString(0)
    assert(art.contains("_stats"))
    assert(TableLog.statsRowCount(spark, root).contains(50L))
    spark.sql(s"CALL graft.system.drop_column(path => '$root', column => 'price')")
    assert(TableLog.read(spark, root).columns.toSeq == Seq("k"))
    // restore below both schema changes brings the old shape back
    val v = spark.sql(
      s"CALL graft.system.restore(path => '$root', version => 0)")
      .head().getLong(0)
    assert(v == 3L && TableLog.read(spark, root).columns.toSeq == Seq("k", "cents"))
  }

  test("CALL clone/sync: replication verbs; unknown procedure is loud") {
    val src = freshRoot("rep_src")
    val dst = freshRoot("rep_dst")
    val dst2 = freshRoot("rep_dst2")
    TableLog.commit(mkDf(0L until 30L), src, expr("k div 25"), 1, "overwrite")
    spark.sql(s"CALL graft.system.clone(source => '$src', target => '$dst')")
    assert(rows(dst) == rows(src))
    TableLog.commit(mkDf(30L until 40L), src, expr("k div 25"), 1, "append")
    val v = spark.sql(
      s"CALL graft.system.sync(source => '$src', target => '$dst2')")
      .head().getLong(0)
    assert(v == 1L && rows(dst2) == rows(src))
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.nope(path => '$src')") }
    assert(e.getMessage.contains("unknown procedure") ||
      e.getMessage.toLowerCase.contains("nope"), e.getMessage)
  }
}
