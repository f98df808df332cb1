package graft.sources

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, ProcedureCatalog}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** R98 — the SQL MAINTENANCE surface: Spark 4's stored-procedure API
  * (SPARK-44167, the `CALL` statement over a [[ProcedureCatalog]])
  * exposing the store's operational commands the way Iceberg's
  * `CALL catalog.system.rewrite_data_files(...)` and Delta's
  * `OPTIMIZE`/`VACUUM` SQL do — the other half of the SQL story next
  * to R96's DML: a SQL-first operator can now run compaction,
  * retention, statistics, restore, schema changes and replication
  * without touching the Scala API. Register once:
  * `spark.sql.catalog.graft = graft.sources.GraftCatalog`, then
  * `CALL graft.system.compact(path => '/t', order_col => 'k', ...)`.
  *
  * Every procedure delegates to the SAME TableLog primitive its
  * programmatic twin uses (one write path, the R87/R96 rule), runs
  * driver-side exactly like the API call would, and returns its
  * outcome as rows (version numbers, deleted files, history) through
  * a [[LocalScan]]. Scale: procedures move metadata or delegate to
  * operations whose scale story is documented on the primitive —
  * nothing here adds driver state.
  */
class GraftCatalog extends CatalogPlugin with ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.TableCatalog
    with org.apache.spark.sql.connector.catalog.SupportsNamespaces {
  import GraftCatalog._
  import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
  import org.apache.spark.sql.connector.catalog.{Table, TableChange}
  import org.apache.spark.sql.connector.expressions.Transform
  import java.nio.file.{Files, Paths}

  private var catalogName: String = "graft"
  private var warehouse: String = _
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
  }
  override def name(): String = catalogName

  /** Spark gates `ALTER TABLE … ADD CONSTRAINT` on this capability
    * (the R102 surface — alterTable receives the Check TableChange).
    */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  /** NAMED tables (R99): identifiers map onto warehouse paths
    * (`graft.db.t` → `<warehouse>/db/t`), loadTable returns the SAME
    * GraftLogTable the path-based reader builds — so catalog reads,
    * INSERT, the R96 DML trio and the R88/R92 statistics surfaces all
    * work on `graft.db.t` with zero extra code (the DML rule matches
    * the table class, not the resolution route). CREATE TABLE writes
    * an empty v0 under the declared schema; ALTER TABLE
    * ADD/RENAME/DROP COLUMN delegate to the metadata-only store
    * primitives (column mapping included); DROP/RENAME TABLE move
    * directories. Partitioned CREATE is rejected loudly — layout is a
    * write option in this store, not a table property.
    */
  private def tablePath(ident: Identifier): String =
    // dots INSIDE a namespace part split like namespace levels, so
    // the dotted-database identity the streaming V1 fallback carries
    // (TableIdentifier has one database slot — v1Ident joins nested
    // namespaces with '.') round-trips to the same directory
    (warehouse +: ident.namespace().toSeq.flatMap(_.split('.')).toSeq
      :+ ident.name()).mkString("/")

  private def requireExists(ident: Identifier): String = {
    val p = tablePath(ident)
    if (TableLog.currentVersion(p) < 0) throw new NoSuchTableException(ident)
    p
  }

  // ---- namespaces (CREATE/SHOW/DROP NAMESPACE, USE graft.db) ------
  // A namespace IS a warehouse directory level — metadata-free
  // (Delta's path-first shape): CREATE mkdirs, SHOW lists child dirs,
  // DROP removes an empty one (or cascades), USE just validates.

  private def nsPath(ns: Array[String]): java.nio.file.Path =
    Paths.get((warehouse +: ns.toSeq.flatMap(_.split('.'))).mkString("/"))

  override def listNamespaces(): Array[Array[String]] = {
    val d = Paths.get(warehouse)
    if (!Files.isDirectory(d)) Array.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
      Files.list(d).forEach { c =>
        if (Files.isDirectory(c) &&
            TableLog.currentVersion(c.toString) < 0) // a table is not a ns
          out += Array(c.getFileName.toString)
      }
      out.sortBy(_.mkString(".")).toArray
    }
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val d = nsPath(namespace)
    if (!Files.isDirectory(d))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(name() +: namespace.toSeq)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    Files.list(d).forEach { c =>
      if (Files.isDirectory(c) && TableLog.currentVersion(c.toString) < 0)
        out += (namespace :+ c.getFileName.toString)
    }
    out.sortBy(_.mkString(".")).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    Files.isDirectory(nsPath(namespace))

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(name() +: namespace.toSeq)
    java.util.Collections.singletonMap("location",
      nsPath(namespace).toString)
  }

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NamespaceAlreadyExistsException((name() +: namespace.toSeq).toArray)
    Files.createDirectories(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val d = nsPath(namespace)
    if (!Files.isDirectory(d)) false
    else {
      val nonEmpty = Files.list(d).findFirst().isPresent
      if (nonEmpty && !cascade)
        throw new org.apache.spark.sql.catalyst.analysis
          .NonEmptyNamespaceException((name() +: namespace.toSeq).toArray)
      TidyIO.deleteRecursively(d)
      true
    }
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = Paths.get((warehouse +: namespace.toSeq).mkString("/"))
    if (!Files.isDirectory(d)) Array.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Identifier]
      Files.list(d).forEach { c =>
        if (Files.isDirectory(c) &&
            TableLog.currentVersion(c.toString) >= 0)
          out += Identifier.of(namespace, c.getFileName.toString)
      }
      out.toArray
    }
  }

  /** The table's 3-part identity, threaded into the V1 streaming
    * fallback so the engine's micro-batch re-resolution of the sink
    * table lands back on THIS catalog (a bare db.t would resolve
    * against the session catalog and fail).
    */
  private def v1Ident(ident: Identifier) =
    org.apache.spark.sql.catalyst.TableIdentifier(ident.name(),
      Some(ident.namespace().mkString(".")), Some(catalogName))

  override def loadTable(ident: Identifier): Table = {
    val p = requireExists(ident)
    val head = TableLog.currentVersion(p)
    new GraftLogTable(p, head,
      StructType.fromDDL(TableLog.schemaDdlOf(p, head)),
      catalogIdent = Some(v1Ident(ident)))
  }

  /** SQL time travel by table NAME (Delta's headline syntax): `SELECT
    * … FROM graft.db.t VERSION AS OF 3` resolves through this
    * overload — Spark's analyzer rewrites the temporal clause into
    * `loadTable(ident, version)`. Same snapshot semantics as the
    * path-based `versionAsOf` option (the DSv2 relation pins the
    * version at load; the manifest is the isolation boundary), and the
    * returned table is marked time-traveled so DML/writes against it
    * reject loudly. Missing or vacuumed versions fail here, at
    * resolution, naming the head — not deep inside the scan.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = requireExists(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft catalog: VERSION AS OF expects a numeric version, got '$version'")
    }
    val head = TableLog.currentVersion(p)
    require(TableLog.versionExists(p, v),
      s"graft catalog: version $v of ${ident.toString} does not exist " +
        s"(head is $head; older versions may have been vacuumed)")
    new GraftLogTable(p, v,
      StructType.fromDDL(TableLog.schemaDdlOf(p, v)), timeTraveled = true)
  }

  /** `TIMESTAMP AS OF …` by table name: Spark hands the evaluated
    * instant in MICROSECONDS since the epoch; resolution is the same
    * latest-at-or-below boundary search the path option uses
    * ([[TableLog.versionAtTimestamp]] — loud before the first commit
    * or past retention).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val p = requireExists(ident)
    val v = TableLog.versionAtTimestamp(p,
      Math.floorDiv(timestampMicros, 1000L))
    new GraftLogTable(p, v,
      StructType.fromDDL(TableLog.schemaDdlOf(p, v)), timeTraveled = true)
  }

  /** The on-disk table root an identifier maps to — the bridge for
    * callers that mix the catalog surface with path-based store
    * primitives (history, headerTsOf, spec introspection).
    */
  def tableLocation(ident: Identifier): String = tablePath(ident)

  /** `CLUSTER BY (…)` columns → the store's layout expression
    * (Delta's liquid-clustering declaration folded onto R105
    * properties): one column clusters directly, two interleave
    * through the zorder2 Morton key (numeric columns — the q68
    * layout), more are rejected (pick two, or set the `layout`
    * property to any SQL expression).
    */
  private def clusterLayout(cols: Seq[String]): String = cols match {
    case Seq(c)    => c
    case Seq(a, b) => s"zorder2($a, $b)"
    case more => throw new UnsupportedOperationException(
      s"graft catalog: CLUSTER BY supports 1 or 2 columns, got $more — " +
        "set the 'layout' table property to a SQL expression instead")
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    import org.apache.spark.sql.connector.expressions.ClusterByTransform
    val (clusters, others) = partitions.partition(
      _.isInstanceOf[ClusterByTransform])
    require(others.isEmpty,
      "graft catalog: partitioned CREATE TABLE is not supported — " +
        "use CLUSTER BY or the 'layout' WRITE option instead")
    // CLUSTER BY persists as the layout property (R105), so every
    // write path clusters by it with no per-write option
    val clusterProps: Map[String, String] =
      clusters.headOption.map(_.asInstanceOf[ClusterByTransform]) match {
        case Some(cb) =>
          val cols = cb.columnNames.map(_.fieldNames().mkString("."))
          Map("clusterBy" -> cols.mkString(","),
            "layout" -> clusterLayout(cols.toSeq))
        case None => Map.empty
      }
    val p = tablePath(ident)
    if (TableLog.currentVersion(p) >= 0)
      throw new TableAlreadyExistsException(ident)
    Files.createDirectories(Paths.get(p))
    // user TBLPROPERTIES persist in the manifest header (R105);
    // Spark's reserved/engine-internal entries are not table config
    import scala.jdk.CollectionConverters._
    val userProps = properties.asScala.toMap.filterNot { case (k, _) =>
      GraftCatalog.reservedProps(k.toLowerCase(java.util.Locale.ROOT)) }
    TableLog.createEmpty(p, schema.toDDL, props = userProps ++ clusterProps)
    loadTable(ident)
  }

  override def createTable(ident: Identifier,
                           columns: Array[org.apache.spark.sql.connector.catalog.Column],
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    // CatalogV2Util is private[sql]; rebuild the struct by hand (the
    // v2 Column carries name/dataType/nullable/comment)
    val st = StructType(columns.toSeq.map { c =>
      val f = StructField(c.name(), c.dataType(), c.nullable())
      Option(c.comment()).fold(f)(f.withComment)
    })
    createTable(ident, st, partitions, properties)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = requireExists(ident)
    changes.foreach {
      case rc: TableChange.RenameColumn =>
        require(rc.fieldNames().length == 1,
          "graft catalog: nested column changes are not supported")
        TableLog.renameColumn(p, rc.fieldNames()(0), rc.newName())
      case dc: TableChange.DeleteColumn =>
        require(dc.fieldNames().length == 1,
          "graft catalog: nested column changes are not supported")
        TableLog.dropColumn(p, dc.fieldNames()(0))
      case ac: TableChange.AddColumn =>
        require(ac.fieldNames().length == 1,
          "graft catalog: nested column changes are not supported")
        TableLog.addColumn(p, ac.fieldNames()(0), ac.dataType().sql)
      // R102: `ALTER TABLE graft.db.t ADD CONSTRAINT c CHECK (…)` —
      // Spark 4's constraint TableChanges land on the store's
      // declared-constraint surface: validated against existing rows,
      // persisted in the manifest header, enforced on every write
      case addc: TableChange.AddConstraint =>
        addc.constraint() match {
          case chk: org.apache.spark.sql.connector.catalog.constraints.Check =>
            TableLog.addConstraint(SparkSession.active, p,
              chk.name(), chk.predicateSql())
          case other => throw new UnsupportedOperationException(
            s"graft catalog: only CHECK constraints are supported, got " +
              other.getClass.getSimpleName)
        }
      case dropc: TableChange.DropConstraint =>
        TableLog.dropConstraint(p, dropc.name())
      // R105: ALTER TABLE … SET/UNSET TBLPROPERTIES — metadata-only
      // property commits (batched per statement by Spark; each change
      // lands as its own version, fine for the ALTER cadence)
      case sp: TableChange.SetProperty =>
        TableLog.setProperties(p, Map(sp.property() -> sp.value()))
      case rp: TableChange.RemoveProperty =>
        if (TableLog.tableProperties(p).contains(rp.property()))
          TableLog.unsetProperties(p, Seq(rp.property()))
      // `ALTER TABLE … CLUSTER BY (…)` re-declares the layout
      // property; `CLUSTER BY NONE` retires it. Existing files keep
      // their layout until the next compact/recluster — Delta's rule.
      case cb: TableChange.ClusterBy =>
        val cols = cb.clusteringColumns().toSeq
          .map(_.fieldNames().mkString("."))
        if (cols.isEmpty) {
          val have = TableLog.tableProperties(p)
          val drop = Seq("clusterBy", "layout").filter(have.contains)
          if (drop.nonEmpty) TableLog.unsetProperties(p, drop)
        } else TableLog.setProperties(p, Map(
          "clusterBy" -> cols.mkString(","),
          "layout" -> clusterLayout(cols)))
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER ${other.getClass.getSimpleName}")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    if (TableLog.currentVersion(p) < 0) false
    else { TidyIO.deleteRecursively(Paths.get(p)); true }
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val src = requireExists(from)
    val dst = tablePath(to)
    if (TableLog.currentVersion(dst) >= 0)
      throw new TableAlreadyExistsException(to)
    Files.createDirectories(Paths.get(dst).getParent)
    Files.move(Paths.get(src), Paths.get(dst))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    procedures.keys.toArray.sorted
      .map(n => Identifier.of(Array("system"), n))

  override def loadProcedure(ident: Identifier): UnboundProcedure =
    procedures.getOrElse(ident.name().toLowerCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(
        s"graft catalog: unknown procedure ${ident.name()} " +
          s"(have: ${procedures.keys.toSeq.sorted.mkString(", ")})"))
}

object GraftCatalog {

  /** Spark-reserved / engine-internal CREATE TABLE property keys —
    * not user table configuration, never persisted.
    */
  private[sources] val reservedProps: Set[String] =
    Set("location", "comment", "provider", "owner", "external",
      "is_managed_location", "option.path", "path")

  private def p(n: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(n, dt).build()
  private def pOpt(n: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(n, dt).defaultValue(default).build()

  private def utf8(s: String) = UTF8String.fromString(s)

  /** One-row (or N-row) in-memory result. */
  private final class RowsScan(schema: StructType,
                               data: Array[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = data
    override def readSchema(): StructType = schema
    override def description(): String = "graft-procedure-result"
  }

  private def result(schema: StructType,
                     rows: Seq[InternalRow]): java.util.Iterator[Scan] =
    Collections.singletonList(
      new RowsScan(schema, rows.toArray): Scan).iterator()

  private val versionSchema = StructType(Seq(StructField("version", LongType)))
  private def versionResult(v: Long): java.util.Iterator[Scan] =
    result(versionSchema, Seq(InternalRow(v)))

  /** A procedure defined by (name, parameters, body). Bound form =
    * unbound form: parameters are static (no overloading).
    */
  private final class Proc(procName: String, params: Seq[ProcedureParameter],
                           outSchema: StructType,
                           body: InternalRow => Seq[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false // mutates / reads live state
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      result(outSchema, body(input))
  }

  private def spark: SparkSession = SparkSession.active

  /** A procedure/TVF target: a raw table root path, or a catalog
    * table NAME (`db.t` defaults to the `graft` catalog;
    * `catalog.db.t` names one explicitly) — Iceberg's
    * `CALL catalog.system.rewrite_data_files(table => 'db.sales')`
    * ergonomics folded onto the existing `path` parameter, so every
    * maintenance verb is name-addressable with zero signature churn.
    */
  def resolveTarget(spark: SparkSession, nameOrPath: String,
                    mustExist: Boolean = true): String =
    // anything with a path separator (absolute OR relative) or a
    // scheme is a filesystem path, passed through verbatim; only
    // slash-free dotted names resolve through a catalog
    if (nameOrPath.contains('/') || nameOrPath.startsWith("file:"))
      nameOrPath
    else {
      val parts = nameOrPath.split('.')
      val (catName, rest) =
        if (parts.length >= 3) (parts.head, parts.tail) else ("graft", parts)
      val cat = try spark.sessionState.catalogManager.catalog(catName) catch {
        case _: Exception => throw new IllegalArgumentException(
          s"graft: unknown catalog '$catName' in '$nameOrPath'")
      }
      cat match {
        case g: GraftCatalog =>
          require(rest.length >= 1, s"graft: bad table name '$nameOrPath'")
          val root = g.tableLocation(
            org.apache.spark.sql.connector.catalog.Identifier
              .of(rest.init, rest.last))
          require(!mustExist || TableLog.currentVersion(root) >= 0L,
            s"graft: no committed table at '$nameOrPath' ($root)")
          root
        case other => throw new IllegalArgumentException(
          s"graft: catalog '$catName' is not a graft catalog " +
            s"(${other.getClass.getName})")
      }
    }

  /** Procedure-body form of [[resolveTarget]] (active session). */
  private def target(nameOrPath: String): String =
    resolveTarget(spark, nameOrPath)

  /** [[target]] for a DESTINATION that may not exist yet (clone/sync
    * targets): a name maps to its warehouse location without the
    * committed-table requirement; a path passes through.
    */
  private def targetNew(nameOrPath: String): String =
    resolveTarget(spark, nameOrPath, mustExist = false)

  private val procedures: Map[String, UnboundProcedure] = Map(
    "compact" -> new Proc("compact",
      Seq(p("path", StringType), p("order_col", StringType),
        pOpt("target_rows", LongType, "1000000"),
        pOpt("small_rows", LongType, "9223372036854775807")),
      versionSchema,
      in => Seq(InternalRow(TableLog.compact(spark, target(in.getString(0)),
        in.getString(1), in.getLong(2), in.getLong(3))))),

    "recluster" -> new Proc("recluster",
      Seq(p("path", StringType), p("layout", StringType),
        pOpt("num_files", IntegerType, "8")),
      versionSchema,
      in => Seq(InternalRow(TableLog.recluster(spark, target(in.getString(0)),
        expr(in.getString(1)), in.getInt(2))))),

    "vacuum" -> new Proc("vacuum",
      Seq(p("path", StringType), pOpt("keep_from", LongType, "-1"),
        pOpt("dry_run", BooleanType, "false"),
        pOpt("older_than_millis", LongType, "-1")),
      StructType(Seq(StructField("deleted", StringType))),
      in => {
        // version-addressed (keep_from) or AGE-addressed
        // (older_than_millis — R85's retention boundary); exactly one
        val root = target(in.getString(0))
        val keepFrom = in.getLong(1)
        val olderThan = in.getLong(3)
        require((keepFrom >= 0L) != (olderThan >= 0L),
          "vacuum: pass exactly one of keep_from / older_than_millis")
        val deleted =
          if (olderThan >= 0L) TableLog.vacuumOlderThan(root, olderThan)
          else if (in.getBoolean(2)) TableLog.vacuumDryRun(root, keepFrom)
          else TableLog.vacuum(root, keepFrom)
        deleted.sorted.map(d => InternalRow(utf8(d)))
      }),

    "analyze" -> new Proc("analyze",
      Seq(p("path", StringType), p("columns", StringType)),
      StructType(Seq(StructField("artifact", StringType))),
      in => Seq(InternalRow(utf8(TableLog.analyze(spark, target(in.getString(0)),
        in.getString(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq))))),

    "restore" -> new Proc("restore",
      Seq(p("path", StringType), p("version", LongType)),
      versionSchema,
      in => Seq(InternalRow(TableLog.restore(target(in.getString(0)), in.getLong(1))))),

    "history" -> new Proc("history",
      Seq(p("path", StringType)),
      StructType(Seq(StructField("version", LongType),
        StructField("action", StringType), StructField("kind", StringType),
        StructField("n_files", LongType), StructField("n_rows", LongType),
        StructField("ts_millis", LongType))),
      in => TableLog.history(spark, target(in.getString(0))).collect().toSeq
        .map(r => InternalRow(r.getLong(0), utf8(r.getString(1)),
          utf8(r.getString(2)), r.getLong(3), r.getLong(4), r.getLong(5)))),

    "rename_column" -> new Proc("rename_column",
      Seq(p("path", StringType), p("from", StringType), p("to", StringType)),
      versionSchema,
      in => Seq(InternalRow(TableLog.renameColumn(target(in.getString(0)),
        in.getString(1), in.getString(2))))),

    "drop_column" -> new Proc("drop_column",
      Seq(p("path", StringType), p("column", StringType)),
      versionSchema,
      in => Seq(InternalRow(TableLog.dropColumn(target(in.getString(0)),
        in.getString(1))))),

    "add_constraint" -> new Proc("add_constraint",
      Seq(p("path", StringType), p("name", StringType),
        p("check_expr", StringType)),
      versionSchema,
      in => Seq(InternalRow(TableLog.addConstraint(spark, target(in.getString(0)),
        in.getString(1), in.getString(2))))),

    "drop_constraint" -> new Proc("drop_constraint",
      Seq(p("path", StringType), p("name", StringType)),
      versionSchema,
      in => Seq(InternalRow(TableLog.dropConstraint(target(in.getString(0)),
        in.getString(1))))),

    "detail" -> new Proc("detail",
      Seq(p("path", StringType)),
      StructType(Seq(StructField("version", LongType),
        StructField("n_files", LongType), StructField("n_rows", LongType),
        StructField("size_bytes", LongType),
        StructField("schema_ddl", StringType),
        StructField("cluster_by", StringType),
        StructField("n_checks", LongType), StructField("n_props", LongType))),
      in => {
        // DESCRIBE DETAIL (Delta's operational snapshot row): pure
        // metadata — one manifest resolve, no data IO
        val root = target(in.getString(0))
        val v = TableLog.currentVersion(root)
        val m = TableLog.readManifest(root, v)
        Seq(InternalRow(v, m.files.size.toLong,
          m.files.map(_.liveRows).sum,
          TableLog.dataBytes(root, m.files),
          utf8(m.schemaDdl), utf8(m.props.getOrElse("clusterBy", "")),
          m.checks.size.toLong, m.props.size.toLong))
      }),

    "set_property" -> new Proc("set_property",
      Seq(p("path", StringType), p("key", StringType),
        p("value", StringType)),
      versionSchema,
      in => Seq(InternalRow(TableLog.setProperties(target(in.getString(0)),
        Map(in.getString(1) -> in.getString(2)))))),

    "unset_property" -> new Proc("unset_property",
      Seq(p("path", StringType), p("key", StringType)),
      versionSchema,
      in => Seq(InternalRow(TableLog.unsetProperties(target(in.getString(0)),
        Seq(in.getString(1)))))),

    "clone" -> new Proc("clone",
      Seq(p("source", StringType), p("target", StringType)),
      versionSchema,
      in => { TableLog.cloneShallow(target(in.getString(0)), targetNew(in.getString(1)))
        Seq(InternalRow(0L)) }),

    "sync" -> new Proc("sync",
      Seq(p("source", StringType), p("target", StringType)),
      versionSchema,
      in => Seq(InternalRow(TableLog.syncShallow(target(in.getString(0)),
        targetNew(in.getString(1)))))))
}
