package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, EqualTo,
  Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  PrunedFilteredScan, RelationProvider}
import org.apache.spark.sql.types.StructType

import graft.lake.Lake

/** SQL surface for the [[graft.lake.Lake]] table format:
  * `spark.read.format("graft-lake").option("path", dir)` (plus
  * optional `versionAsOf`) yields a relation any `spark.sql` query can
  * consume — and Catalyst's pushed filters drive MANIFEST-STAT FILE
  * SKIPPING, so `WHERE key BETWEEN a AND b` over a SQL view opens only
  * the intersecting files, the same pruning [[Lake.readRange]] gives
  * the programmatic API.
  *
  * Design: a V1 `PrunedFilteredScan` that DELEGATES row decoding to
  * Spark's own parquet reader over the pruned file list (hand-rolling
  * a parquet decoder inside a V2 `PartitionReader` would be slower and
  * wrong — vectorized decoding, predicate pushdown into row groups,
  * and schema merge all come from the delegated scan). Correctness
  * never depends on the pruning: `unhandledFilters` returns every
  * filter, so Catalyst re-applies them post-scan; the manifest bounds
  * only decide which files CANNOT match and are skipped. Leading-key
  * comparisons (`=`, `<`, `<=`, `>`, `>=`) tighten the [lo, hi] prune
  * window; any other predicate leaves it open. Column pruning flows
  * through `requiredColumns` into the delegated select, so the parquet
  * scan reads only requested columns. */
class LakeSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-lake"
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val dir = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-lake requires option 'path'"))
    val version = parameters.get("versionAsOf").map(_.toLong).getOrElse(0L)
    new LakeRelation(sqlContext, dir, version)
  }
}

class LakeRelation(val sqlContext: SQLContext, dir: String, versionAsOf: Long)
    extends BaseRelation with PrunedFilteredScan {

  private val resolvedVersion =
    if (versionAsOf == 0L) Lake.latestVersion(dir) else versionAsOf
  private val snapshot = Lake.manifest(dir, resolvedVersion)
  private val leadingKey = snapshot.key.split(',').head.trim

  override val schema: StructType =
    Lake.read(sqlContext.sparkSession, dir, resolvedVersion).schema

  /** The [lo, hi] prune window the pushed filters imply for the
    * leading key column (None = unconstrained on that side). */
  private def bounds(filters: Array[Filter]): (Option[Long], Option[Long]) =
    filters.foldLeft((Option.empty[Long], Option.empty[Long])) {
      case ((lo, hi), f) => f match {
        case EqualTo(`leadingKey`, v: Number) =>
          val x = v.longValue()
          (Some(lo.fold(x)(math.max(_, x))), Some(hi.fold(x)(math.min(_, x))))
        case GreaterThan(`leadingKey`, v: Number) =>
          (Some(lo.fold(v.longValue + 1)(math.max(_, v.longValue + 1))), hi)
        case GreaterThanOrEqual(`leadingKey`, v: Number) =>
          (Some(lo.fold(v.longValue)(math.max(_, v.longValue))), hi)
        case LessThan(`leadingKey`, v: Number) =>
          (lo, Some(hi.fold(v.longValue - 1)(math.min(_, v.longValue - 1))))
        case LessThanOrEqual(`leadingKey`, v: Number) =>
          (lo, Some(hi.fold(v.longValue)(math.min(_, v.longValue))))
        case _ => (lo, hi)
      }
    }

  /** Files surviving manifest-stat pruning (exposed for the spec's
    * skipping assertion). */
  private[graft] def prunedFiles(filters: Array[Filter]): Seq[Lake.FileEntry] = {
    val (lo, hi) = bounds(filters)
    snapshot.files.filter(f =>
      lo.forall(f.maxKey >= _) && hi.forall(f.minKey <= _))
  }

  // every filter is re-applied by Spark post-scan: the manifest prune
  // is a pure file-skipping optimization, never a correctness gate
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val spark = sqlContext.sparkSession
    val hit = prunedFiles(filters)
    val base =
      if (hit.isEmpty)
        Lake.read(spark, dir, resolvedVersion).filter(lit(false))
      else
        spark.read.option("mergeSchema", "true").parquet(
          hit.map(f => java.nio.file.Paths.get(dir, f.name).toString): _*)
    // column pruning reaches the delegated parquet scan; an empty
    // projection (COUNT(*)) still needs one column to count rows on
    val cols =
      if (requiredColumns.nonEmpty) requiredColumns.toSeq
      else schema.fieldNames.take(1).toSeq
    val projected = base.select(cols.map(col): _*)
    val out = projected.rdd
    if (requiredColumns.nonEmpty) out
    else out.map(_ => Row.empty)
  }
}
