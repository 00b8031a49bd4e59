package graft.lake

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MATERIALIZED VIEWS over [[Lake]] tables, with transparent query
  * rewrite ([[graft.plans.MatViewRewrite]]) and incremental refresh.
  *
  * A view definition is `GROUP BY groupCols` + `count(*)` + one
  * `sum(col)` per declared sum column — the Σ-maintainable aggregate
  * family: every commit's effect on the view is computable from the
  * change feed alone (inserts and update postimages add, deletes and
  * update preimages subtract), so both [[refresh]] and the rewrite
  * rule's stale-compensation path cost O(Δ), never O(table). The view
  * itself is a lake table keyed on the group columns (one row per
  * group), so it versions, time-travels, and file-skips like any
  * other table.
  *
  * Freshness is decided from the delta log: the definition records the
  * source version it was built at (`builtVersion`, durably in an
  * `_mv` sidecar beside the view's `_manifests`), and the rewrite rule
  * compares it to the version the query's relation PINNED at load.
  * Equal → scan the view directly. Snapshot ahead of the view → serve
  * `view ⊕ Σ(changes(builtVersion → snapshot])` — the IVM rule as an
  * optimizer rewrite, reading only the commits the view hasn't
  * absorbed. Snapshot BEHIND the view → no rewrite (a time-travel
  * read below the build point must see the old state; subtracting
  * history back out would need the feed reversed — correct but never
  * cheaper than the pruned direct read).
  *
  * Scale shape: the 100 TB deployment keeps one nightly-refreshed
  * rollup per dashboard aggregate; queries between refreshes pay the
  * day's delta, not the table. Both compensation and refresh plan as
  * (tiny view scan) ∪ (delta-file scan) → one hash aggregate on the
  * group key — no shuffle wider than the view itself.
  *
  * Limitations (by construction, all checked at [[define]] time or by
  * the rule's matcher): aggregate family is count(*)/sum(col) over
  * int/long/double columns (min/max are not Σ-maintainable under
  * deletes); sum columns must be non-null (a group whose every value
  * is NULL sums to NULL in SQL but to 0 through Σ-maintenance);
  * rewrite-eligible queries group on exactly the declared columns,
  * and any residual filter may reference group columns only (it then
  * commutes with the aggregate and applies to the view scan).
  */
object MatView {

  /** STAR-JOIN view dimension: the view pre-joins `sourceDir ⋈ dimDir
    * ON factKey = dimKey` before aggregating, and `dimVersion` pins
    * the dimension snapshot the registers were computed against.
    * Σ-maintenance through the FACT feed stays exact because the join
    * key is a fact column and the dimension is static at its pinned
    * version: every fact change row maps to at most one dimension row
    * (or drops, exactly as it dropped from the view), so signed
    * contributions survive the join unchanged. A query against a
    * DIFFERENT dimension version refuses — dimension churn invalidates
    * the registers and only a re-define can absorb it. */
  case class DimSpec(dimDir: String, factKey: String, dimKey: String,
      dimVersion: Long)

  /** One registered view: `mvDir` holds the aggregate of
    * `sourceDir` (pre-joined with every `dims` entry when present —
    * a star: each dimension joins the FACT directly) grouped by
    * `groupCols`, as of source `builtVersion`. */
  case class MvDef(sourceDir: String, mvDir: String,
      groupCols: Seq[String], sumCols: Seq[String], builtVersion: Long,
      dims: Seq[DimSpec] = Nil)

  /** View-table column names: the count register plus one sum, min,
    * and max register per declared column. Prefixed so they can never
    * collide with source columns (graft identifiers are lowercase
    * ASCII). Sum/count are Σ-maintainable under ANY history; min/max
    * are maintainable under INSERTS only (a delete can remove the
    * extremum), so their maintenance and rewrite eligibility are
    * gated on the delta log — see [[compensated]] and
    * [[graft.plans.MatViewRewrite]]. */
  val countCol = "__mv_n"
  def sumCol(c: String): String = s"__mv_sum_$c"
  def minCol(c: String): String = s"__mv_min_$c"
  def maxCol(c: String): String = s"__mv_max_$c"

  /** Is the source history over `(fromVersion, toVersion]` INSERT-ONLY?
    * Decided from the delta log alone ([[Lake.history]]): every
    * copy-on-write update or delete removes at least one file, so a
    * slice whose commits removed nothing introduced rows and nothing
    * else — the condition under which min/max roll forward by
    * least/greatest against the feed. Metadata-sized, no data read. */
  def appendOnlySlice(dir: String, fromVersion: Long, toVersion: Long): Boolean =
    Lake.history(dir)
      .filter(c => c.version > fromVersion && c.version <= toVersion)
      .forall(_.removedFiles == 0)

  private val reg = new ConcurrentHashMap[String, MvDef]()

  /** Registry key: plain views key on the source dir; star views on
    * source⋈sorted-dims, so one source can carry several shapes
    * simultaneously. */
  private def regKey(sourceDir: String, dimDirs: Seq[String]): String =
    if (dimDirs.isEmpty) sourceDir
    else s"$sourceDir|${dimDirs.sorted.mkString("|")}"

  /** Last rewrite the optimizer rule performed: (source dir,
    * "direct" | "compensated") — the observability device the
    * registered queries pin into their result rows and the specs
    * assert on (same pattern as [[graft.sources.LakeScan.lastRuntimeFilter]]). */
  val lastRewrite = new AtomicReference[(String, String)]()

  def get(sourceDir: String): Option[MvDef] = Option(reg.get(sourceDir))
  def getStar(sourceDir: String, dimDirs: Seq[String]): Option[MvDef] =
    Option(reg.get(regKey(sourceDir, dimDirs)))
  def isEmpty: Boolean = reg.isEmpty
  def unregister(sourceDir: String): Unit = reg.remove(sourceDir)
  def unregisterJoined(sourceDir: String, dimDir: String): Unit =
    reg.remove(regKey(sourceDir, Seq(dimDir)))
  def unregisterStar(sourceDir: String, dimDirs: Seq[String]): Unit =
    reg.remove(regKey(sourceDir, dimDirs))
  def clear(): Unit = reg.clear()

  /** Build the view table from a source snapshot (the current one, or
    * `asOfVersion` — a view built below the head starts stale and
    * serves through compensation until refreshed), register it for
    * rewrite, and persist the definition sidecar. Idempotent: an
    * existing view at `mvDir` is replaced. */
  def define(spark: SparkSession, sourceDir: String, mvDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      asOfVersion: Long = 0L): MvDef =
    defineImpl(spark, sourceDir, mvDir, groupCols, sumCols, asOfVersion, Nil)

  /** STAR-JOIN view: materialize `source ⋈ dim ON factKey = dimKey`
    * (inner, dim broadcast) aggregated by `groupCols` — columns from
    * EITHER side. The dimension pins at its current version; queries
    * joining a different dim version refuse to rewrite, and refresh
    * compensates fact changes only (see [[DimSpec]]). */
  def defineJoined(spark: SparkSession, sourceDir: String, dimDir: String,
      factKey: String, dimKey: String, mvDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      asOfVersion: Long = 0L): MvDef =
    defineStar(spark, sourceDir, Seq((dimDir, factKey, dimKey)), mvDir,
      groupCols, sumCols, asOfVersion)

  /** MULTI-DIMENSION star view: every `(dimDir, factKey, dimKey)`
    * joins the fact directly (a star, not a snowflake — dims never
    * join each other). Each dimension pins at its current version. */
  def defineStar(spark: SparkSession, sourceDir: String,
      dims: Seq[(String, String, String)], mvDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      asOfVersion: Long = 0L): MvDef = {
    val specs = dims.map { case (dimDir, fk, dk) =>
      val dv = Lake.latestVersion(dimDir)
      require(dv > 0L, s"no lake table at $dimDir")
      DimSpec(dimDir, fk, dk, dv)
    }
    defineImpl(spark, sourceDir, mvDir, groupCols, sumCols, asOfVersion,
      specs)
  }

  /** The view's input frame at a source version: the fact read, joined
    * with every pinned dimension for star views. */
  private def sourceFrame(spark: SparkSession, sourceDir: String,
      version: Long, dims: Seq[DimSpec]): DataFrame = {
    val fact = Lake.read(spark, sourceDir, version)
    dims.foldLeft(fact) { (df, ds) =>
      df.join(broadcast(Lake.read(spark, ds.dimDir, ds.dimVersion)),
        col(ds.factKey) === col(ds.dimKey))
    }
  }

  private def defineImpl(spark: SparkSession, sourceDir: String,
      mvDir: String, groupCols: Seq[String], sumCols: Seq[String],
      asOfVersion: Long, dim: Seq[DimSpec]): MvDef = {
    require(groupCols.nonEmpty && sumCols.nonEmpty, "empty MV definition")
    val v = if (asOfVersion == 0L) Lake.latestVersion(sourceDir) else asOfVersion
    require(v > 0L, s"no lake table at $sourceDir")
    val src = sourceFrame(spark, sourceDir, v, dim)
    val numeric = Set("integer", "long", "double")
    sumCols.foreach { c =>
      val dt = src.schema(c).dataType.typeName
      require(numeric(dt), s"MV sum column $c has non-Σ-maintainable type $dt")
    }
    val agg = src.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(countCol),
        sumCols.flatMap(c => Seq(sum(col(c)).as(sumCol(c)),
          min(col(c)).as(minCol(c)), max(col(c)).as(maxCol(c)))): _*)
    graft.Scratch.rm(new java.io.File(mvDir))
    Lake.create(agg, mvDir, groupCols.mkString(","), targetFiles = 1)
    val d = MvDef(sourceDir, mvDir, groupCols, sumCols, v, dim)
    writeSidecar(d)
    reg.put(regKey(sourceDir, dim.map(_.dimDir)), d)
    d
  }

  /** [[define]]/[[defineStar]] with the BUILD memoized on storage:
    * when `mvDir` already holds a sidecar for the SAME definition
    * (source, grouping, sums, dim dirs+keys — the built/dim versions
    * may legitimately differ: a refresh advances them), re-register
    * from it instead of re-aggregating the source. This is the
    * shared-fixture policy applied to view builds: a production
    * deployment builds a view once and serves/refreshes it
    * thereafter; the per-query cost is the view LIFECYCLE, not the
    * build. Bench's cold pass removes the view dirs with the source
    * history, so the full build cost stays published alongside. */
  def defineOrRecover(spark: SparkSession, sourceDir: String,
      dims: Seq[(String, String, String)], mvDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      asOfVersion: Long = 0L): MvDef = {
    val sidecar = java.nio.file.Paths.get(mvDir, "_mv")
    if (java.nio.file.Files.exists(sidecar)) {
      val d = recover(mvDir)
      val same = d.sourceDir == sourceDir &&
        d.groupCols.map(_.toLowerCase) == groupCols.map(_.toLowerCase) &&
        d.sumCols.map(_.toLowerCase) == sumCols.map(_.toLowerCase) &&
        d.dims.map(ds => (ds.dimDir, ds.factKey.toLowerCase,
          ds.dimKey.toLowerCase)) ==
          dims.map(t => (t._1, t._2.toLowerCase, t._3.toLowerCase))
      if (same) return d
      reg.remove(regKey(d.sourceDir, d.dims.map(_.dimDir)))
    }
    if (dims.isEmpty)
      define(spark, sourceDir, mvDir, groupCols, sumCols, asOfVersion)
    else defineStar(spark, sourceDir, dims, mvDir, groupCols, sumCols,
      asOfVersion)
  }

  /** Re-register a view from its `_mv` sidecar (a restarted session
    * recovering its rewrite registry from storage). */
  def recover(mvDir: String): MvDef = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(mvDir, "_mv")).toArray(Array.empty[String])
    val kv = lines.filter(_.contains("=")).map { l =>
      val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    // dims ride indexed sidecar keys: dim0=dir|factKey|dimKey|version
    val dims = kv.keys.filter(_.matches("dim\\d+")).toSeq.sortBy(_.drop(3).toInt)
      .map { k =>
        val Array(dd, fk, dk, dv) = kv(k).split('|')
        DimSpec(dd, fk, dk, dv.toLong)
      }
    val d = MvDef(kv("source"), mvDir, kv("group").split(",").toSeq,
      kv("sums").split(",").toSeq, kv("builtVersion").toLong, dims)
    reg.put(regKey(d.sourceDir, dims.map(_.dimDir)), d)
    d
  }

  private def writeSidecar(d: MvDef): Unit = {
    val p = java.nio.file.Paths.get(d.mvDir, "_mv")
    val tmp = java.nio.file.Paths.get(d.mvDir, "_mv.tmp")
    val dimLines = d.dims.zipWithIndex.map { case (ds, i) =>
      s"dim$i=${ds.dimDir}|${ds.factKey}|${ds.dimKey}|${ds.dimVersion}\n"
    }.mkString
    java.nio.file.Files.write(tmp,
      (s"source=${d.sourceDir}\ngroup=${d.groupCols.mkString(",")}\n" +
        s"sums=${d.sumCols.mkString(",")}\nbuiltVersion=${d.builtVersion}\n" +
        dimLines)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** How a compensation/refresh derives the min/max registers for the
    * rolled-forward view:
    *  - [[MinMaxFeed]] — the missed slice is insert-only
    *    ([[appendOnlySlice]]): least/greatest of the stored register
    *    and the feed's per-group extremum. O(Δ).
    *  - [[MinMaxRecompute]] — the slice holds updates/deletes: a
    *    removed row may have BEEN the extremum, so the groups the
    *    delta touched re-derive min/max from the source snapshot
    *    (filtered to those groups — the price min/max pays under
    *    deletes in every IVM system). Used by [[refresh]] only.
    *  - [[MinMaxNone]] — don't produce min/max columns at all. The
    *    rewrite rule uses this when the query asks only for
    *    Σ-maintainable aggregates, keeping the compensation plan
    *    feed-sized whatever the slice contains.
    */
  private[graft] sealed trait MinMaxMode
  private[graft] case object MinMaxFeed extends MinMaxMode
  private[graft] case object MinMaxRecompute extends MinMaxMode
  private[graft] case object MinMaxNone extends MinMaxMode

  /** The view's rows rolled forward by the source's change feed over
    * `(fromVersion, toVersion]` — the shared Σ-maintenance plan both
    * [[refresh]] (which then commits it) and the rewrite rule's
    * compensation path (which serves it directly) consume. Groups
    * whose row count reaches zero are dropped (a group with no rows
    * does not appear in a real aggregate). */
  private[graft] def compensated(spark: SparkSession, d: MvDef,
      toVersion: Long, minMax: MinMaxMode = MinMaxNone): DataFrame = {
    // star views join the FACT feed with the pinned dimensions before
    // re-aggregating: each change row maps to ≤1 row per dim (or drops,
    // exactly as it dropped from the view), so the signed contribution
    // algebra is unchanged and dim group columns become available
    val factFeed = Lake.changes(spark, d.sourceDir, d.builtVersion, toVersion)
    val feed = d.dims.foldLeft(factFeed) { (df, ds) =>
      df.join(broadcast(Lake.read(spark, ds.dimDir, ds.dimVersion)),
        col(ds.factKey) === col(ds.dimKey))
    }
    val insertExtrema: Seq[org.apache.spark.sql.Column] =
      if (minMax != MinMaxFeed) Nil
      else d.sumCols.flatMap(c => Seq(
        min(when(col("_change_type") === "insert", col(c))).as(s"__dmin_$c"),
        max(when(col("_change_type") === "insert", col(c))).as(s"__dmax_$c")))
    val delta = feed
      .withColumn("__sign",
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
      .groupBy(d.groupCols.map(col): _*)
      .agg(sum(col("__sign")).as("__dn"),
        (d.sumCols.map(c =>
          sum(col("__sign") * col(c)).as(s"__ds_$c")) ++ insertExtrema): _*)
    val cur = Lake.read(spark, d.mvDir)
    val rolled = cur.join(delta, d.groupCols, "full_outer")
      .select(d.groupCols.map(col) ++
        Seq((coalesce(col(countCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(countCol)) ++
        d.sumCols.flatMap { c =>
          val sumPart =
            (coalesce(col(sumCol(c)), lit(0L).cast(cur.schema(sumCol(c)).dataType)) +
              coalesce(col(s"__ds_$c"), lit(0L).cast(cur.schema(sumCol(c)).dataType)))
              .as(sumCol(c))
          minMax match {
            // least/greatest skip nulls, so a group new to the feed
            // takes the feed extremum and an untouched group keeps
            // its stored register
            case MinMaxFeed => Seq(sumPart,
              least(col(minCol(c)), col(s"__dmin_$c")).as(minCol(c)),
              greatest(col(maxCol(c)), col(s"__dmax_$c")).as(maxCol(c)))
            case MinMaxRecompute => Seq(sumPart,
              col(minCol(c)).as(minCol(c)), col(maxCol(c)).as(maxCol(c)))
            case MinMaxNone => Seq(sumPart)
          }
        }: _*)
      .filter(col(countCol) > 0L)
    minMax match {
      case MinMaxRecompute =>
        // groups the delta touched re-derive min/max from the source
        // snapshot; untouched groups carry their stored registers
        val affected = feed.select(d.groupCols.map(col): _*).distinct()
        val recAggs = d.sumCols.flatMap(c => Seq(
          min(col(c)).as(s"__rmin_$c"), max(col(c)).as(s"__rmax_$c")))
        val rec = sourceFrame(spark, d.sourceDir, toVersion, d.dims)
          .join(broadcast(affected), d.groupCols, "left_semi")
          .groupBy(d.groupCols.map(col): _*)
          .agg(recAggs.head, recAggs.tail: _*)
        rolled.join(rec, d.groupCols, "left_outer")
          .select(d.groupCols.map(col) ++ Seq(col(countCol)) ++
            d.sumCols.flatMap(c => Seq(col(sumCol(c)),
              coalesce(col(s"__rmin_$c"), col(minCol(c))).as(minCol(c)),
              coalesce(col(s"__rmax_$c"), col(maxCol(c))).as(maxCol(c)))): _*)
      case _ => rolled
    }
  }

  /** Incrementally roll the view forward to the source's CURRENT
    * version: changed groups upsert and emptied groups delete in ONE
    * atomic [[Lake.merge]] commit (a reader between two separate
    * commits would otherwise see refreshed registers beside
    * should-be-gone groups), then the sidecar advances. Cost is
    * O(changes since builtVersion), never a source re-scan. No-op
    * when already current. */
  def refresh(spark: SparkSession, sourceDir: String,
      dimDirs: Seq[String] = Nil): MvDef = {
    val d = reg.get(regKey(sourceDir, dimDirs))
    require(d != null, s"no registered MV for $sourceDir (dims=$dimDirs)")
    val v = Lake.latestVersion(sourceDir)
    if (v == d.builtVersion) return d
    require(v > d.builtVersion, s"source $sourceDir regressed below MV build")
    // insert-only slice → min/max roll via the feed; otherwise the
    // affected groups recompute from the snapshot (delta-log decided)
    val mode =
      if (appendOnlySlice(sourceDir, d.builtVersion, v)) MinMaxFeed
      else MinMaxRecompute
    val next = compensated(spark, d, v, mode).persist()
    try {
      val cur = Lake.read(spark, d.mvDir)
      // emptied groups: present now, absent from the rolled-forward view
      val dead = cur.select(d.groupCols.map(col): _*)
        .except(next.select(d.groupCols.map(col): _*))
      Lake.merge(spark, d.mvDir, next, dead, targetFiles = 1)
      val nd = d.copy(builtVersion = v)
      writeSidecar(nd)
      reg.put(regKey(sourceDir, dimDirs), nd)
      nd
    } finally next.unpersist()
  }
}
