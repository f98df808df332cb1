/*
 * Table-NAME streaming + the table_changes TVF (round-14 missing-item
 * 2): `spark.readStream.table("graft.db.t")`,
 * `writeStream.toTable(...)` and `SELECT * FROM table_changes(t, a,
 * b)` — Delta's three name-addressed change surfaces. Lives under
 * org.apache.spark.sql.* because the rewrite targets
 * StreamingRelationV2/StreamingRelation/DataSource, which are
 * internal planner nodes (same rule as ../graftx/bridge.scala).
 */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.datasources.DataSource
import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation
import org.apache.spark.sql.types.{LongType, StringType}

/** Public bridge over the `private[sql]` [[org.apache.spark.sql
  * .connector.catalog.V2TableWithV1Fallback]] trait so the graftlog
  * table class (package graft.sources) can implement the streaming
  * write fallback `writeStream.toTable` dispatches on — same
  * visibility device as [[StreamBridge]].
  */
trait V1FallbackTable
    extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** Resolve `spark.readStream.table("graft.db.t")` onto the graftlog
  * DSv1 streaming source — WITH the reader's options (Spark's own
  * V1-fallback route drops them, so `readChangeFeed=true` /
  * `startingVersion` / `maxVersionsPerBatch` by table name need this
  * rule). The analyzer hands us a [[StreamingRelationV2]] whose table
  * is a graftlog table (matched through the public TableInfo hook —
  * the class itself is private to the sources package); we rebuild it
  * as the DSv1 [[StreamingRelation]] over the SAME provider the
  * path-based `readStream.format("graftlog")` uses, so there is
  * exactly ONE streaming read path.
  *
  * Attribute discipline: base columns KEEP the relation's original
  * exprIds (references above may already be bound to them in an
  * earlier fixed-point iteration); the CDF mode appends fresh
  * attributes for the two stamps — they were absent from the V2
  * output, so nothing upstream can hold a stale reference.
  */
case class GraftStreamTableRule(session: SparkSession) extends Rule[LogicalPlan] {
  import graft.sources.GraftLogProvider

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case s @ StreamingRelationV2(_, _, GraftLogProvider.TableInfo(root, _, tt),
                                 opts, output, _, _, _) =>
      require(!tt, "graftlog: streaming read of a time-traveled " +
        "relation is not supported — a snapshot does not change")
      import scala.jdk.CollectionConverters._
      val params = opts.asScala.toMap + ("path" -> root)
      val cdf = params.exists { case (k, v) =>
        k.equalsIgnoreCase("readChangeFeed") && v.equalsIgnoreCase("true") }
      val out: Seq[Attribute] =
        if (!cdf) output
        else output.map(_.withNullability(true)) ++ Seq(
          AttributeReference("_change_type", StringType, nullable = true)(),
          AttributeReference("_commit_version", LongType, nullable = true)())
      StreamingRelation(
        DataSource(session, className = "graftlog", options = params),
        "graftlog", out)
  }
}

/** `table_changes(table, from[, to])` — Delta's CDF table-valued
  * function, registered session-wide via
  * SparkSessionExtensions.injectTableFunction: resolves the table
  * (a `catalog.db.t` name through the graft catalog, or a raw table
  * root path) and returns the batch change-feed relation the
  * path-based `option("changeFeed", true)` read builds — one CDF
  * read path, now SQL-addressable by name. Arguments must be
  * literals (the TVF is resolved at analysis); versions are longs,
  * `to` defaults to the table head.
  */
object TableChangesFunction {

  val identifier: FunctionIdentifier = FunctionIdentifier("table_changes")

  val info: ExpressionInfo = new ExpressionInfo("graft", null,
    "table_changes",
    "table_changes(table, from[, to]) - change-data-feed rows of a " +
      "graft table between commit versions (inclusive), stamped " +
      "_change_type/_commit_version", "")

  private def lit(e: Expression, what: String): Any = e match {
    case Literal(v, _) if v != null => v
    case other => throw new IllegalArgumentException(
      s"table_changes: $what must be a non-null literal, got $other")
  }

  private def asLong(v: Any, what: String): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString.toLong
    case other => throw new IllegalArgumentException(
      s"table_changes: $what must be an integral version, got $other")
  }

  /** `catalog.db.t` / `db.t` (graft catalog) / raw path → table root
    * — the ONE resolver the maintenance procedures also use
    * ([[graft.sources.GraftCatalog.resolveTarget]]).
    */
  def resolveRoot(spark: SparkSession, name: String): String =
    try graft.sources.GraftCatalog.resolveTarget(spark, name)
    catch { case e: IllegalArgumentException =>
      throw new IllegalArgumentException(s"table_changes: ${e.getMessage}", e)
    }

  def build(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 2 || exprs.length == 3,
      s"table_changes(table, from[, to]) takes 2 or 3 arguments, " +
        s"got ${exprs.length}")
    val spark = SparkSession.active
    val name = lit(exprs.head, "table").toString
    val root = resolveRoot(spark, name)
    val from = asLong(lit(exprs(1), "from"), "from")
    val reader = spark.read.format("graftlog")
      .option("path", root).option("changeFeed", "true")
      .option("startingVersion", from)
    val bounded = exprs.lift(2).fold(reader)(e =>
      reader.option("endingVersion", asLong(lit(e, "to"), "to")))
    bounded.load().queryExecution.analyzed
  }
}
