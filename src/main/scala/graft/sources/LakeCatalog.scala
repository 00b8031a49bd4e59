package graft.sources

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange,
  SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.Lake

/** Catalog plugin for the [[Lake]] table format — the step past the
  * path-based relation: register once
  * (`spark.sql.catalog.<name>=graft.sources.LakeCatalog` plus
  * `spark.sql.catalog.<name>.warehouse=<root>`) and every table under
  * the warehouse is addressable as `<name>.<ns>.<table>` in plain SQL:
  * `CREATE TABLE` / CTAS, `INSERT INTO` (key-merge upsert), `INSERT
  * OVERWRITE` (snapshot replace), `SELECT`, `DROP`/`RENAME TABLE` —
  * and the TIME TRAVEL syntax comes with the interface: Spark routes
  * `VERSION AS OF n` to `loadTable(ident, version)` and `TIMESTAMP AS
  * OF ts` to `loadTable(ident, epochMicros)`, both answered from the
  * delta log ([[Lake.versionAt]]). Unlike a temp view over the
  * path-based relation (which pins the version it loaded), catalog
  * resolution re-loads the table per query, so a SELECT after an
  * INSERT sees the new version with no re-registration.
  *
  * Layout: `<warehouse>/<namespace...>/<table>/` is a Lake table root
  * (`_manifests` log + data subdirs). Namespaces are directories;
  * [[SupportsNamespaces]] is implemented over them so `CREATE
  * NAMESPACE` / `SHOW TABLES IN` work. `alterTable` supports ADD
  * COLUMNS (a metadata-only declared-schema commit, [[Lake.addColumns]]);
  * non-additive changes are rejected descriptively.
  *
  * CREATE TABLE requires the clustering key as a table property or
  * option (`key` / `option.key`): the manifest is keyed from birth, so
  * every later write range-clusters and every read can skip files —
  * there is deliberately no unkeyed state in the format's lifecycle. */
class LakeCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  /** [[org.apache.spark.sql.connector.catalog.FunctionCatalog]]:
    * resolving a scan's `bucket(n, key)` partition transform
    * ([[LakeScan]] reports it for [[graft.lake.Lake.compactBucketed]]
    * layouts) loads `bucket` from the TABLE's catalog — exposing
    * [[GraftBucketFunction]] here is what makes storage-partitioned
    * joins plan (a path-based `format("graft-lake")` read has no
    * function catalog, so SPJ is a catalog-table capability). */
  override def listFunctions(namespace: Array[String])
      : Array[Identifier] = Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name == "bucket") GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires option spark.sql.catalog.$name.warehouse"))
    // SQL UPDATE rides a planner strategy (LakeDml); sessions built
    // without GraftExtensions get it the moment the catalog loads
    // (idempotent registration, same device as the TopK operator API)
    try org.apache.spark.sql.GraftSqlShim.addStrategy(
      org.apache.spark.sql.SparkSession.active, LakeDmlStrategy)
    catch { case _: IllegalStateException => () } // no active session: extensions route covers it
    // registry-wide view recovery (round 13, VERDICT r12 #6): a
    // restarted session's catalog restores its whole serving plane
    // from the warehouse's sidecars — no per-view recover CALLs.
    // Best-effort: a missing/unreadable warehouse is not a catalog
    // failure, and recoverAll itself skips broken sidecars.
    try { graft.lake.MatView.recoverAll(warehouse); () }
    catch { case _: Exception => () }
  }

  override def name(): String = catalogName

  /** Path-traversal guard: identifiers become directory names. */
  private def safe(part: String): String = {
    require(part.nonEmpty && part.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*"),
      s"illegal identifier part: $part")
    part
  }

  private def nsDir(namespace: Array[String]) =
    Paths.get(warehouse, namespace.map(safe): _*)

  private def tableDir(ident: Identifier): String =
    nsDir(ident.namespace).resolve(safe(ident.name)).toString

  /** [[LakeProcedures]]' door to table paths (same guards). */
  private[sources] def tableDirOf(namespace: Array[String], name: String): String =
    tableDir(Identifier.of(namespace, name))

  private def isTable(dir: String): Boolean = Lake.latestVersion(dir) > 0L

  override def tableExists(ident: Identifier): Boolean = isTable(tableDir(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = nsDir(namespace).toFile
    if (!d.isDirectory) throw new NoSuchNamespaceException(namespace)
    d.listFiles().filter(f => f.isDirectory && isTable(f.getAbsolutePath))
      .map(f => Identifier.of(namespace, f.getName)).sortBy(_.name)
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val spark = SparkSession.active
    val v = Lake.latestVersion(dir)
    new LakeTable(dir, v, Lake.snapshotSchema(spark, dir, v))
  }

  /** `VERSION AS OF <v>` — a pinned (read-only) snapshot. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft-lake versions are integers, got: $version")
    }
    new LakeTable(dir, v, Lake.snapshotSchema(SparkSession.active, dir, v),
      pinned = true)
  }

  /** `TIMESTAMP AS OF <ts>` (Spark hands epoch MICROS) — the newest
    * version whose commit published at or before the instant. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = Lake.versionAt(dir, Math.floorDiv(timestampMicros, 1000L))
    new LakeTable(dir, v, Lake.snapshotSchema(SparkSession.active, dir, v),
      pinned = true)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    require(partitions.isEmpty,
      "graft-lake range-clusters by its key; PARTITIONED BY is not supported")
    val props = properties.asScala
    val key = props.get("key").orElse(props.get(TableCatalog.OPTION_PREFIX + "key"))
      .getOrElse(throw new IllegalArgumentException(
        s"CREATE TABLE $ident requires the clustering key, e.g. " +
          "TBLPROPERTIES ('key'='o_orderkey')"))
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    Files.createDirectories(Paths.get(dir))
    Lake.createEmpty(SparkSession.active, dir, schema, key)
    new LakeTable(dir, 1L, schema)
  }

  /** DECLARED SCHEMA EVOLUTION (round 11 — the full Delta/Iceberg
    * ALTER surface, every form a METADATA-ONLY delta-log commit; time
    * travel below any of them serves the old shape):
    *
    *  - `ADD COLUMNS (…)` — existing rows null-fill; the new column
    *    mints a fresh physical name, so a re-add after a DROP can
    *    never resurrect dropped data ([[Lake.addColumns]]);
    *  - `RENAME COLUMN a TO b` — the logical field re-labels over a
    *    stable physical name ([[Lake.renameColumn]]);
    *  - `DROP COLUMN c` — the field leaves the declaration; dependent
    *    materialized views invalidate ([[Lake.dropColumn]]);
    *  - `ALTER COLUMN c TYPE t` — lossless widening only (int→long,
    *    int→double, float→double); files keep their narrow encoding
    *    and the vectorized reader promotes ([[Lake.widenColumn]]).
    *
    * Key columns refuse all three mutations (the manifest, file
    * skipping, and the merge joins address them physically). Property
    * updates and nested fields are rejected descriptively. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val spark = SparkSession.active
    def topLevel(fieldNames: Array[String], what: String): String = {
      require(fieldNames.length == 1,
        s"graft-lake ALTER TABLE $what supports top-level columns only, " +
          s"got ${fieldNames.mkString(".")}")
      fieldNames.head
    }
    // ADD COLUMNS arrives as one change per column; batch them so the
    // declaration commits once
    val adds = changes.collect { case a: TableChange.AddColumn =>
      require(a.isNullable,
        s"added column ${a.fieldNames.head} must be nullable " +
          "(existing rows null-fill)")
      org.apache.spark.sql.types.StructField(
        topLevel(a.fieldNames, "ADD COLUMNS"), a.dataType, nullable = true)
    }
    if (adds.nonEmpty) Lake.addColumns(spark, dir, adds)
    changes.foreach {
      case _: TableChange.AddColumn => // handled above
      case r: TableChange.RenameColumn =>
        Lake.renameColumn(spark, dir,
          topLevel(r.fieldNames, "RENAME COLUMN"), r.newName)
      case d: TableChange.DeleteColumn =>
        Lake.dropColumn(spark, dir, topLevel(d.fieldNames, "DROP COLUMN"))
        ()
      case t: TableChange.UpdateColumnType =>
        Lake.widenColumn(spark, dir,
          topLevel(t.fieldNames, "ALTER COLUMN TYPE"), t.newDataType)
      case other => throw new UnsupportedOperationException(
        s"graft-lake ALTER TABLE supports ADD/RENAME/DROP COLUMN and " +
          s"lossless type widening, got ${other.getClass.getSimpleName}")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) return false
    graft.Scratch.rm(new java.io.File(dir))
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    val to = tableDir(newIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(Paths.get(to).getParent)
    Files.move(Paths.get(from), Paths.get(to))
  }

  // ---- stored procedures: the maintenance surface ----

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    ident.name.toLowerCase match {
      case "optimize" => LakeProcedures.optimize(this)
      case "zorder" => LakeProcedures.zorder(this)
      case "vacuum" => LakeProcedures.vacuum(this)
      case "compact_small" => LakeProcedures.compactSmall(this)
      case "bucket" => LakeProcedures.bucket(this)
      case "delete_mor" => LakeProcedures.deleteMor(this)
      case "rewrite_dvs" => LakeProcedures.rewriteDvs(this)
      case "create_mv" => LakeProcedures.createMv(this)
      case "refresh_mv" => LakeProcedures.refreshMv(this)
      case "create_mv_join" => LakeProcedures.createMvJoin(this)
      case "refresh_mv_join" => LakeProcedures.refreshMvJoin(this)
      case "refresh_mv_dims" => LakeProcedures.refreshMvDims(this)
      case "create_mv_distinct" => LakeProcedures.createMvDistinct(this)
      case "create_mv_distinct_star" => LakeProcedures.createMvDistinctStar(this)
      case "refresh_mv_distinct" => LakeProcedures.refreshMvDistinct(this)
      case "mvd_status" => LakeProcedures.mvdStatus(this)
      case "auto_maintenance" => LakeProcedures.autoMaintenance(this)
      case "analyze" => LakeProcedures.analyze(this)
      case "auto_compact" => LakeProcedures.autoCompact(this)
      case "recover_views" => LakeProcedures.recoverViews(this)
      case "mv_status" => LakeProcedures.mvStatus(this)
      case "history" => LakeProcedures.history(this)
      case other => throw new UnsupportedOperationException(
        s"no procedure $other in catalog $catalogName " +
          "(available: optimize, compact_small, bucket, zorder, vacuum, " +
          "history, delete_mor, rewrite_dvs, create_mv, refresh_mv, " +
          "create_mv_join, refresh_mv_join, refresh_mv_dims, mv_status)")
    }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    Array("optimize", "compact_small", "bucket", "zorder", "vacuum", "history",
        "delete_mor", "rewrite_dvs", "create_mv", "refresh_mv",
        "create_mv_join", "refresh_mv_join", "refresh_mv_dims", "mv_status",
        "auto_maintenance", "analyze", "auto_compact",
        "create_mv_distinct_star", "recover_views")
      .map(Identifier.of(namespace, _))

  // ---- namespaces = directories under the warehouse ----

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || nsDir(namespace).toFile.isDirectory

  override def listNamespaces(): Array[Array[String]] = {
    val root = Paths.get(warehouse).toFile
    if (!root.isDirectory) Array.empty
    else root.listFiles().filter(f => f.isDirectory && !isTable(f.getAbsolutePath))
      .map(f => Array(f.getName)).sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] =
    if (namespaceExists(namespace)) Map.empty[String, String].asJava
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    Files.createDirectories(nsDir(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft-lake namespaces are plain directories; nothing to alter")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(namespace).toFile
    if (!d.isDirectory) throw new NoSuchNamespaceException(namespace)
    if (!cascade && d.listFiles().nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    graft.Scratch.rm(d)
    true
  }
}
