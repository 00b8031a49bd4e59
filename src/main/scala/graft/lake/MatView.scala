package graft.lake

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * DERIVED COLUMNS (round 11): both group and sum columns may be
  * declared as named SQL expressions over the source (star: source ⋈
  * dims) schema — `"revenue" -> "l_extendedprice * (1 - l_discount)"`,
  * `"day" -> "date_trunc('day', o_ts)"`. The registers are computed
  * over the derived values, Σ-maintenance applies the same expressions
  * to the change feed (an expression of a changed row changes with
  * it), and the rewrite rule matches query aggregates/groupings by
  * CANONICALIZED expression equality, not by name — so
  * `sum(price * (1 - disc))` in a query text-independently hits the
  * declared register.
  *
  * Freshness is decided from the delta log: the definition records the
  * source version it was built at (`builtVersion`, durably in an
  * `_mv` sidecar beside the view's `_manifests` AND in the view
  * table's own commit log via a txn marker — see [[refresh]]), and the
  * rewrite rule compares it to the version the query's relation PINNED
  * at load. Equal → scan the view directly. Snapshot ahead of the view
  * → serve `view ⊕ Σ(changes(builtVersion → snapshot])`. Snapshot
  * BEHIND the view → no rewrite (a time-travel read below the build
  * point must see the old state).
  *
  * Scale shape: the 100 TB deployment keeps one nightly-refreshed
  * rollup per dashboard aggregate; queries between refreshes pay the
  * day's delta, not the table. Both compensation and refresh plan as
  * (tiny view scan) ∪ (delta-file scan) → one hash aggregate on the
  * group key — no shuffle wider than the view itself.
  *
  * NULL semantics (ADVICE r10): each sum column also carries a
  * NON-NULL COUNT register (`__mv_nn_<c>`), maintained with the same
  * signed algebra, so a group whose surviving values are all NULL
  * serves `sum = NULL` exactly like the direct aggregate would — the
  * register itself stores 0 and the serve path derives NULL-ness from
  * the count, which (unlike a stored NULL) stays well-defined under
  * subtraction. AVG divides by the non-null count, Spark's own
  * denominator. Group columns must be NULL-FREE: checked against the
  * view rows at define time (one view-sized scan), and the
  * compensation join is null-safe regardless, so a NULL group
  * introduced by post-build commits still serves correctly — it just
  * refuses to [[refresh]] into the lake-keyed view table.
  *
  * Limitations (by construction, all checked at define time or by
  * the rule's matcher): aggregate family is count(*)/sum over
  * int/long/double values (min/max registers exist but are only
  * Σ-maintainable under insert-only slices); rewrite-eligible queries
  * group on a subset of the declared columns, and any residual filter
  * must be a deterministic function of declared group columns.
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
    * DIFFERENT dimension version refuses to rewrite — but dimension
    * churn no longer forces a re-define: [[refreshDim]] advances the
    * pin incrementally from the dimension's change feed and the
    * per-dimension AUX rollup, never re-scanning the fact table. */
  case class DimSpec(dimDir: String, factKey: String, dimKey: String,
      dimVersion: Long)

  /** One registered view: `mvDir` holds the aggregate of
    * `sourceDir` (pre-joined with every `dims` entry when present —
    * a star: each dimension joins the FACT directly) grouped by
    * `groupCols`, as of source `builtVersion`. `derived` maps declared
    * column names to SQL expressions over the (joined) source schema,
    * applied before grouping; a groupCol/sumCol naming a derived entry
    * aggregates the expression. */
  case class MvDef(sourceDir: String, mvDir: String,
      groupCols: Seq[String], sumCols: Seq[String], builtVersion: Long,
      dims: Seq[DimSpec] = Nil, derived: Seq[(String, String)] = Nil) {
    def derivedExpr(name: String): Option[String] =
      derived.find(_._1.equalsIgnoreCase(name)).map(_._2)
  }

  /** View-table column names: the count register plus one sum,
    * non-null-count, min, and max register per declared column.
    * Prefixed so they can never collide with source columns (graft
    * identifiers are lowercase ASCII). Sum/count are Σ-maintainable
    * under ANY history; min/max are maintainable under INSERTS only
    * (a delete can remove the extremum), so their maintenance and
    * rewrite eligibility are gated on the delta log — see
    * [[compensated]] and [[graft.plans.MatViewRewrite]]. */
  val countCol = "__mv_n"
  def sumCol(c: String): String = s"__mv_sum_$c"
  def nnCol(c: String): String = s"__mv_nn_$c"
  def minCol(c: String): String = s"__mv_min_$c"
  def maxCol(c: String): String = s"__mv_max_$c"

  /** Sidecar format version: bumped whenever the VIEW TABLE schema the
    * registers live in changes shape (round 11 added the non-null
    * count registers), so [[defineOrRecover]] rebuilds instead of
    * recovering a sidecar whose table lacks the new registers. */
  private val SidecarFmt = 2

  /** Is the source history over `(fromVersion, toVersion]` INSERT-ONLY?
    * Decided from the delta log alone ([[Lake.history]]): every
    * copy-on-write update or delete removes at least one file, so a
    * slice whose commits removed nothing introduced rows and nothing
    * else — the condition under which min/max roll forward by
    * least/greatest against the feed. Metadata-sized, no data read. */
  def appendOnlySlice(dir: String, fromVersion: Long, toVersion: Long): Boolean =
    Lake.history(dir)
      .filter(c => c.version > fromVersion && c.version <= toVersion)
      // row-preserving maintenance (compaction etc.) removes files but
      // not ROWS — it can't have removed an extremum
      .forall(c => c.removedFiles == 0 || Lake.rewriteOnly(dir, c.version))

  /** Is every commit in `(fromVersion, toVersion]` row-preserving
    * maintenance ([[Lake.RewriteOnlyTxn]])? Then a view built at
    * `fromVersion` is EXACT at `toVersion` — the rewrite serves the
    * view DIRECTLY across a nightly OPTIMIZE instead of paying a
    * compensation whose feed nets to zero. */
  def rowPreservingSlice(dir: String, fromVersion: Long, toVersion: Long): Boolean =
    ((fromVersion + 1L) to toVersion).forall(Lake.rewriteOnly(dir, _))

  /** The version the rewrite should treat a pinned snapshot as: the
    * pin itself, unless everything past the view's build is
    * row-preserving maintenance — then the build version (a DIRECT
    * serve). */
  def effectiveVersion(dir: String, built: Long, pinned: Long): Long =
    if (pinned > built && rowPreservingSlice(dir, built, pinned)) built
    else pinned

  private val reg = new ConcurrentHashMap[String, MvDef]()
  private val dreg = new ConcurrentHashMap[String, DistinctDef]()

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
  def isEmpty: Boolean = reg.isEmpty && dreg.isEmpty
  def unregister(sourceDir: String): Unit = reg.remove(sourceDir)
  def unregisterDistinct(mvDir: String): Unit = dreg.remove(mvDir)
  def unregisterJoined(sourceDir: String, dimDir: String): Unit =
    reg.remove(regKey(sourceDir, Seq(dimDir)))
  def unregisterStar(sourceDir: String, dimDirs: Seq[String]): Unit =
    reg.remove(regKey(sourceDir, dimDirs))
  def clear(): Unit = { reg.clear(); dreg.clear() }

  /** Every registered view whose SOURCE is `dir` — the dependency
    * lookup schema evolution consults: dropping a column a view's
    * declaration references must invalidate the view
    * ([[invalidateReferencing]]). */
  def viewsOver(dir: String): Seq[MvDef] = {
    import scala.jdk.CollectionConverters._
    reg.values.asScala.filter(_.sourceDir == dir).toSeq
  }

  /** Every version of `dir` some registered view still PINS — its
    * build version when `dir` is the view's fact source (plain,
    * star, or distinct), its dim pin when `dir` is a star dimension.
    * [[Lake.vacuum]] consults this: expiring a pinned version would
    * break the view's compensation feed (`changes(pin → head)` reads
    * the expired commits' files), so vacuum refuses instead —
    * VERDICT r11 #7. Returns (view dir, pinned version) pairs. */
  def pinsOn(dir: String): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    reg.values.asScala.flatMap { d =>
      (if (d.sourceDir == dir) Seq(d.mvDir -> d.builtVersion) else Nil) ++
        d.dims.filter(_.dimDir == dir).map(ds => d.mvDir -> ds.dimVersion)
    }.toSeq ++
      dreg.values.asScala.filter(_.sourceDir == dir)
        .map(d => d.mvDir -> d.builtVersion).toSeq
  }

  /** Unregister (and report) every view over `dir` whose declaration
    * references `colName` — as a raw group/sum column or inside a
    * derived expression. Called by the lake's DROP COLUMN path: a view
    * whose register inputs no longer exist cannot be maintained or
    * served, and silently keeping it registered would let the rewrite
    * rule serve stale semantics. Conservative on derived expressions:
    * a word-boundary name match over the SQL text (identifiers are
    * lowercase ASCII word characters here). */
  def invalidateReferencing(dir: String, colName: String): Seq[String] = {
    val lc = colName.toLowerCase
    val hit = viewsOver(dir).filter { d =>
      val raw = (d.groupCols ++ d.sumCols ++ d.dims.map(_.factKey))
        .exists(_.equalsIgnoreCase(lc))
      val inDerived = d.derived.exists { case (_, e) =>
        s"\\b${java.util.regex.Pattern.quote(lc)}\\b".r
          .findFirstIn(e.toLowerCase).isDefined
      }
      raw || inDerived
    }
    hit.foreach(d => reg.remove(regKey(d.sourceDir, d.dims.map(_.dimDir))))
    hit.map(_.mvDir)
  }

  /** Build the view table from a source snapshot (the current one, or
    * `asOfVersion` — a view built below the head starts stale and
    * serves through compensation until refreshed), register it for
    * rewrite, and persist the definition sidecar. Idempotent: an
    * existing view at `mvDir` is replaced. */
  def define(spark: SparkSession, sourceDir: String, mvDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      asOfVersion: Long = 0L, derived: Seq[(String, String)] = Nil): MvDef =
    defineImpl(spark, sourceDir, mvDir, groupCols, sumCols, asOfVersion, Nil,
      derived)

  /** STAR-JOIN view: materialize `source ⋈ dim ON factKey = dimKey`
    * (inner, dim broadcast) aggregated by `groupCols` — columns from
    * EITHER side. The dimension pins at its current version; queries
    * joining a different dim version refuse to rewrite until
    * [[refreshDim]] advances the pin (see [[DimSpec]]). */
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
      asOfVersion: Long = 0L, derived: Seq[(String, String)] = Nil): MvDef = {
    val specs = dims.map { case (dimDir, fk, dk) =>
      val dv = Lake.latestVersion(dimDir)
      require(dv > 0L, s"no lake table at $dimDir")
      DimSpec(dimDir, fk, dk, dv)
    }
    defineImpl(spark, sourceDir, mvDir, groupCols, sumCols, asOfVersion,
      specs, derived)
  }

  /** Apply the declared derived columns to a (joined) source frame.
    * Derived expressions see the raw source/dim columns only — not
    * each other (checked at define). */
  private def withDerived(df: DataFrame, derived: Seq[(String, String)]): DataFrame =
    derived.foldLeft(df) { case (d, (n, e)) => d.withColumn(n, expr(e)) }

  /** The view's input frame at a source version: the fact read, joined
    * with every pinned dimension for star views, derived columns
    * applied. */
  private def sourceFrame(spark: SparkSession, sourceDir: String,
      version: Long, dims: Seq[DimSpec],
      derived: Seq[(String, String)]): DataFrame = {
    val fact = Lake.read(spark, sourceDir, version)
    withDerived(dims.foldLeft(fact) { (df, ds) =>
      df.join(broadcast(Lake.read(spark, ds.dimDir, ds.dimVersion)),
        col(ds.factKey) === col(ds.dimKey))
    }, derived)
  }

  /** The register aggregate list over a prepared (joined + derived)
    * frame: count(*), then per sum column sum / non-null count / min /
    * max. Shared by [[defineImpl]] and the AUX builds so the register
    * algebra exists in exactly one place. */
  private def registerAggs(sumCols: Seq[String]): Seq[Column] =
    count(lit(1)).as(countCol) +:
      sumCols.flatMap(c => Seq(sum(col(c)).as(sumCol(c)),
        count(col(c)).as(nnCol(c)),
        min(col(c)).as(minCol(c)), max(col(c)).as(maxCol(c))))

  private def defineImpl(spark: SparkSession, sourceDir: String,
      mvDir: String, groupCols: Seq[String], sumCols: Seq[String],
      asOfVersion: Long, dim: Seq[DimSpec],
      derived: Seq[(String, String)]): MvDef = {
    require(groupCols.nonEmpty && sumCols.nonEmpty, "empty MV definition")
    derived.foreach { case (n, e) =>
      require(!derived.exists { case (m, _) =>
        (m ne n) && e.toLowerCase.matches(s".*\\b${java.util.regex.Pattern.quote(m.toLowerCase)}\\b.*")
      }, s"derived column $n references another derived column — " +
        "derived expressions may reference source columns only")
    }
    val v = if (asOfVersion == 0L) Lake.latestVersion(sourceDir) else asOfVersion
    require(v > 0L, s"no lake table at $sourceDir")
    val src = sourceFrame(spark, sourceDir, v, dim, derived)
    val numeric = Set("integer", "long", "double")
    sumCols.foreach { c =>
      val dt = src.schema(c).dataType.typeName
      require(numeric(dt), s"MV sum column $c has non-Σ-maintainable type $dt")
    }
    val agg = src.groupBy(groupCols.map(col): _*)
      .agg(registerAggs(sumCols).head, registerAggs(sumCols).tail: _*)
    graft.Scratch.rm(new java.io.File(mvDir))
    invalidatePlanMemoFor(mvDir)
    createViewTable(spark, agg, mvDir, groupCols)
    // group columns must be NULL-FREE (the doc'd contract): the lake
    // key machinery and the refresh merge key on them. Checked against
    // the WRITTEN view — one view-sized read, not a second source scan.
    val nullGroups = Lake.read(spark, mvDir)
      .filter(groupCols.map(col(_).isNull).reduce(_ || _)).limit(1).count()
    if (nullGroups > 0L) {
      graft.Scratch.rm(new java.io.File(mvDir))
      sys.error(s"MV group columns ${groupCols.mkString(",")} contain NULLs " +
        s"in $sourceDir@v$v — a NULL group cannot key the view table")
    }
    val d = MvDef(sourceDir, mvDir, groupCols, sumCols, v, dim, derived)
    // star views additionally materialize ONE aux rollup at the grain
    // of (every dim's fact-side join key × the fact-owned group
    // columns) — deliberately DIM-ATTRIBUTE-FREE, so it can never go
    // stale under dimension churn; [[refreshDim]] re-labels its
    // subtotals through the dims alone, never re-scanning the fact.
    // Only buildable when the sum registers are fact-side expressions
    // (a register mixing dim columns cannot live at fact grain) —
    // otherwise the view still works, but churn requires a re-define.
    if (dim.nonEmpty && auxSupported(spark, d))
      buildAux(spark, d, auxDir(mvDir))
    writeSidecar(d)
    reg.put(regKey(sourceDir, dim.map(_.dimDir)), d)
    d
  }

  /** Land a register/aux frame as a lake table, handling the EMPTY
    * case (round 12): a view defined over a just-created (or fully
    * filtered) source has zero register rows, and a zero-row frame
    * cannot land through [[Lake.create]] (parquet writes no part
    * files) — it anchors via [[Lake.createEmpty]] instead, so a view
    * can be declared on a brand-new table and auto-maintenance fills
    * it as commits arrive (the streaming-ingest define-then-fill
    * shape). The emptiness probe is a LIMIT-1 count over the register
    * aggregate — view-sized, at define time only. */
  private def createViewTable(spark: SparkSession, agg: DataFrame,
      dir: String, keyColumns: Seq[String]): Unit = {
    if (agg.limit(1).count() == 0L)
      Lake.createEmpty(spark, dir, agg.schema, keyColumns.mkString(","))
    else Lake.create(agg, dir, keyColumns.mkString(","), targetFiles = 1)
    ()
  }

  private[lake] def auxDir(mvDir: String): String = s"$mvDir-aux"

  /** Column names of one dimension's schema (at its pinned version). */
  private def dimFields(spark: SparkSession, ds: DimSpec): Set[String] =
    Lake.snapshotSchema(spark, ds.dimDir, ds.dimVersion)
      .fieldNames.map(_.toLowerCase).toSet

  /** Does `name` (a declared group/sum column) derive purely from the
    * FACT side? Plain columns check dim-schema membership; derived
    * expressions are fact-side iff they reference no dim field. */
  private def factSide(spark: SparkSession, d: MvDef, name: String): Boolean = {
    val allDimFields = d.dims.flatMap(dimFields(spark, _)).toSet
    d.derivedExpr(name) match {
      case Some(e) => !allDimFields.exists(f =>
        s"\\b${java.util.regex.Pattern.quote(f)}\\b".r
          .findFirstIn(e.toLowerCase).isDefined)
      case None => !allDimFields.contains(name.toLowerCase)
    }
  }

  /** Churn support requires every sum register to live at fact grain,
    * and every group column to be PURE fact-side or PURE dim-side (a
    * mixed derived grouping could not be re-labeled from either the
    * aux or the dims alone). */
  private def auxSupported(spark: SparkSession, d: MvDef): Boolean =
    d.sumCols.forall(factSide(spark, d, _)) &&
      d.groupCols.forall { g =>
        factSide(spark, d, g) || {
          d.derivedExpr(g) match {
            case Some(e) =>
              // pure dim-side: references no FACT field
              val factFields = Lake.snapshotSchema(spark, d.sourceDir,
                d.builtVersion).fieldNames.map(_.toLowerCase).toSet --
                d.dims.map(_.factKey.toLowerCase)
              !factFields.exists(f =>
                s"\\b${java.util.regex.Pattern.quote(f)}\\b".r
                  .findFirstIn(e.toLowerCase).isDefined)
            case None => true // a plain dim column
          }
        }
      }

  /** The aux rollup's grouping: every dim's fact-side join key plus
    * the fact-owned group columns. */
  private def auxGroupCols(spark: SparkSession, d: MvDef): Seq[String] =
    (d.dims.map(_.factKey) ++
      d.groupCols.filter(factSide(spark, d, _))).distinct

  private def buildAux(spark: SparkSession, d: MvDef, dir: String): Unit = {
    val gcols = auxGroupCols(spark, d)
    val factDerived = d.derived.filter { case (n, _) => factSide(spark, d, n) }
    // fact grain: no dim joins — the aux must stay valid whatever the
    // dims later do
    val src = withDerived(
      Lake.read(spark, d.sourceDir, d.builtVersion), factDerived)
    val agg = src.groupBy(gcols.map(col): _*)
      .agg(registerAggs(d.sumCols).head, registerAggs(d.sumCols).tail: _*)
    graft.Scratch.rm(new java.io.File(dir))
    createViewTable(spark, agg, dir, gcols)
  }

  /** [[define]]/[[defineStar]] with the BUILD memoized on storage:
    * when `mvDir` already holds a sidecar for the SAME definition
    * (source, grouping, sums, derived, dim dirs+keys — the built/dim
    * versions may legitimately differ: a refresh advances them),
    * re-register from it instead of re-aggregating the source. This is
    * the shared-fixture policy applied to view builds: a production
    * deployment builds a view once and serves/refreshes it
    * thereafter; the per-query cost is the view LIFECYCLE, not the
    * build. Bench's cold pass removes the view dirs with the source
    * history, so the full build cost stays published alongside. */
  def defineOrRecover(spark: SparkSession, sourceDir: String,
      dims: Seq[(String, String, String)], mvDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      asOfVersion: Long = 0L, derived: Seq[(String, String)] = Nil): MvDef = {
    val sidecar = java.nio.file.Paths.get(mvDir, "_mv")
    if (java.nio.file.Files.exists(sidecar)) {
      recoverIfCurrent(mvDir) match {
        case Some(d) =>
          val same = d.sourceDir == sourceDir &&
            d.groupCols.map(_.toLowerCase) == groupCols.map(_.toLowerCase) &&
            d.sumCols.map(_.toLowerCase) == sumCols.map(_.toLowerCase) &&
            d.derived.map { case (n, e) => (n.toLowerCase, e) } ==
              derived.map { case (n, e) => (n.toLowerCase, e) } &&
            d.dims.map(ds => (ds.dimDir, ds.factKey.toLowerCase,
              ds.dimKey.toLowerCase)) ==
              dims.map(t => (t._1, t._2.toLowerCase, t._3.toLowerCase))
          if (same) return d
          reg.remove(regKey(d.sourceDir, d.dims.map(_.dimDir)))
        case None => // stale sidecar format: fall through to rebuild
      }
    }
    if (dims.isEmpty)
      define(spark, sourceDir, mvDir, groupCols, sumCols, asOfVersion, derived)
    else defineStar(spark, sourceDir, dims, mvDir, groupCols, sumCols,
      asOfVersion, derived)
  }

  /** Re-register a view from its `_mv` sidecar (a restarted session
    * recovering its rewrite registry from storage). Reconciles the
    * built version against the view table's own commit log: a crash
    * between [[refresh]]'s data commit and its sidecar write leaves
    * the txn marker AHEAD of the sidecar, and the marker wins — the
    * registers already absorbed that slice, so trusting the sidecar
    * would re-apply (double-count) it (ADVICE r10). */
  def recover(mvDir: String): MvDef =
    recoverIfCurrent(mvDir).getOrElse(sys.error(
      s"sidecar at $mvDir predates format $SidecarFmt — re-define the view"))

  /** REGISTRY-WIDE RECOVERY (round 13, VERDICT r12 #6): sweep `root`
    * for `_mv`/`_mvd` sidecars and re-register every recoverable view
    * in one call — a restarted session restores its whole serving
    * plane instead of each owner remembering each view path
    * ([[recover]]/[[recoverDistinct]] one at a time). Tolerant by
    * design: stale-format or unreadable sidecars are SKIPPED and
    * reported, never thrown — one broken view must not hold the rest
    * of the plane hostage. Walk cost is metadata-plane: directories
    * holding a `_manifests` (lake tables — views never nest inside
    * them) or a sidecar stop the descent, and depth is bounded.
    * Returns (recovered mvDirs, skipped mvDirs). SQL surface:
    * `CALL graft.recover_views(root => '…')`; also swept
    * automatically when a [[graft.sources.LakeCatalog]] initializes
    * over its warehouse. */
  def recoverAll(root: String): (Seq[String], Seq[String]) = {
    val recovered = scala.collection.mutable.ArrayBuffer[String]()
    val skipped = scala.collection.mutable.ArrayBuffer[String]()
    def walk(f: java.io.File, depth: Int): Unit = {
      if (!f.isDirectory || depth > 8) return
      val dir = f.getAbsolutePath
      val hasMv = new java.io.File(f, "_mv").isFile
      val hasMvd = new java.io.File(f, "_mvd").isFile
      if (hasMv || hasMvd) {
        val ok =
          try {
            if (hasMv) recoverIfCurrent(dir).isDefined
            else { recoverDistinct(dir); true }
          } catch { case _: Exception => false }
        (if (ok) recovered else skipped) += dir
      } else if (!new java.io.File(f, "_manifests").isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .foreach(walk(_, depth + 1))
    }
    walk(new java.io.File(root), 0)
    (recovered.toSeq.sorted, skipped.toSeq.sorted)
  }

  /** Test seam: drop every in-memory registration (sidecars stay — the
    * restarted-session state [[recoverAll]] recovers from). */
  private[graft] def clearRegistry(): Unit = { reg.clear(); dreg.clear() }

  private def recoverIfCurrent(mvDir: String): Option[MvDef] = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(mvDir, "_mv")).toArray(Array.empty[String])
    val kv = lines.filter(_.contains("=")).map { l =>
      val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    if (!kv.get("fmt").contains(SidecarFmt.toString)) return None
    // dims ride indexed sidecar keys: dim0=dir|factKey|dimKey|version
    val dims = kv.keys.filter(_.matches("dim\\d+")).toSeq.sortBy(_.drop(3).toInt)
      .map { k =>
        val Array(dd, fk, dk, dv) = kv(k).split('|')
        DimSpec(dd, fk, dk, dv.toLong)
      }
    // derived columns: derN=name|hex(expr) — hex keeps the line format
    // separator-safe whatever the expression text contains
    val derived = kv.keys.filter(_.matches("der\\d+")).toSeq.sortBy(_.drop(3).toInt)
      .map { k =>
        val Array(n, hx) = kv(k).split('|')
        n -> hexToStr(hx)
      }
    val sidecarVersion = kv("builtVersion").toLong
    val txnVersion = Lake.manifest(mvDir, Lake.latestVersion(mvDir))
      .txns.getOrElse(RefreshTxnApp, 0L)
    val d = MvDef(kv("source"), mvDir, kv("group").split(",").toSeq,
      kv("sums").split(",").toSeq, math.max(sidecarVersion, txnVersion), dims,
      derived)
    if (txnVersion > sidecarVersion) writeSidecar(d) // heal the sidecar
    reg.put(regKey(d.sourceDir, dims.map(_.dimDir)), d)
    Some(d)
  }

  /** The txn-marker app id [[refresh]] commits its absorbed source
    * version under — atomic with the register merge, the durable half
    * of the freshness record. */
  private val RefreshTxnApp = "graft-mv-built"

  private def strHex(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02x").mkString
  private def hexToStr(h: String): String =
    new String(h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
      java.nio.charset.StandardCharsets.UTF_8)

  private def writeSidecar(d: MvDef): Unit = {
    val p = java.nio.file.Paths.get(d.mvDir, "_mv")
    val tmp = java.nio.file.Paths.get(d.mvDir, "_mv.tmp")
    val dimLines = d.dims.zipWithIndex.map { case (ds, i) =>
      s"dim$i=${ds.dimDir}|${ds.factKey}|${ds.dimKey}|${ds.dimVersion}\n"
    }.mkString
    val derLines = d.derived.zipWithIndex.map { case ((n, e), i) =>
      s"der$i=$n|${strHex(e)}\n"
    }.mkString
    java.nio.file.Files.write(tmp,
      (s"fmt=$SidecarFmt\nsource=${d.sourceDir}\n" +
        s"group=${d.groupCols.mkString(",")}\n" +
        s"sums=${d.sumCols.mkString(",")}\nbuiltVersion=${d.builtVersion}\n" +
        dimLines + derLines)
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
    * does not appear in a real aggregate). The view⋈delta join is
    * NULL-SAFE on every group column (ADVICE r10): plain equality
    * would split a NULL group into a stored row and a delta row. */
  private[graft] def compensated(spark: SparkSession, d: MvDef,
      toVersion: Long, minMax: MinMaxMode = MinMaxNone): DataFrame = {
    // star views join the FACT feed with the pinned dimensions before
    // re-aggregating: each change row maps to ≤1 row per dim (or drops,
    // exactly as it dropped from the view), so the signed contribution
    // algebra is unchanged and dim group columns become available
    val factFeed = Lake.changes(spark, d.sourceDir, d.builtVersion,
      toVersion, skipRewriteOnly = true)
    val feed = withDerived(d.dims.foldLeft(factFeed) { (df, ds) =>
      df.join(broadcast(Lake.read(spark, ds.dimDir, ds.dimVersion)),
        col(ds.factKey) === col(ds.dimKey))
    }, d.derived)
    val insertExtrema: Seq[Column] =
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
        (d.sumCols.flatMap(c => Seq(
          sum(col("__sign") * col(c)).as(s"__ds_$c"),
          sum(when(col(c).isNotNull, col("__sign")).otherwise(0L))
            .as(s"__dnn_$c"))) ++ insertExtrema): _*)
    val cur = Lake.read(spark, d.mvDir)
    rollForward(cur, delta, d, minMax,
      recompute = if (minMax == MinMaxRecompute) Some((affected: DataFrame) => {
        val recAggs = d.sumCols.flatMap(c => Seq(
          min(col(c)).as(s"__rmin_$c"), max(col(c)).as(s"__rmax_$c")))
        sourceFrame(spark, d.sourceDir, toVersion, d.dims, d.derived)
          .join(broadcast(affected), d.groupCols, "left_semi")
          .groupBy(d.groupCols.map(col): _*)
          .agg(recAggs.head, recAggs.tail: _*)
      }) else None,
      affectedGroups = feed.select(d.groupCols.map(col): _*).distinct())
  }

  /** The shared roll-forward algebra: stored registers ⊕ a signed
    * per-group delta frame (`__dn`, `__ds_<c>`, `__dnn_<c>`, optional
    * `__dmin/__dmax`), joined NULL-SAFELY on the group columns.
    * `recompute`, when set, re-derives min/max for the groups in
    * `affectedGroups` via the supplied snapshot aggregation (the
    * delete-slice path); [[MinMaxFeed]] rolls extrema via
    * least/greatest instead. Used by both fact compensation and the
    * dimension-churn path ([[refreshDim]]), which produce delta frames
    * from different inputs but share this exact merge. */
  private def rollForward(cur: DataFrame, delta: DataFrame, d: MvDef,
      minMax: MinMaxMode, recompute: Option[DataFrame => DataFrame],
      affectedGroups: DataFrame): DataFrame = {
    val v = cur.alias("__v")
    val dl = delta.alias("__d")
    val joinCond = d.groupCols
      .map(c => col(s"__v.$c") <=> col(s"__d.$c")).reduce(_ && _)
    val rolled = v.join(dl, joinCond, "full_outer")
      .select(d.groupCols.map(c =>
        coalesce(col(s"__v.$c"), col(s"__d.$c")).as(c)) ++
        Seq((coalesce(col(countCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(countCol)) ++
        d.sumCols.flatMap { c =>
          val st = cur.schema(sumCol(c)).dataType
          val sumPart =
            (coalesce(col(sumCol(c)), lit(0L).cast(st)) +
              coalesce(col(s"__ds_$c"), lit(0L).cast(st)))
              .as(sumCol(c))
          val nnPart =
            (coalesce(col(nnCol(c)), lit(0L)) +
              coalesce(col(s"__dnn_$c"), lit(0L))).as(nnCol(c))
          minMax match {
            // least/greatest skip nulls, so a group new to the feed
            // takes the feed extremum and an untouched group keeps
            // its stored register
            case MinMaxFeed => Seq(sumPart, nnPart,
              least(col(minCol(c)), col(s"__dmin_$c")).as(minCol(c)),
              greatest(col(maxCol(c)), col(s"__dmax_$c")).as(maxCol(c)))
            case MinMaxRecompute => Seq(sumPart, nnPart,
              col(minCol(c)).as(minCol(c)), col(maxCol(c)).as(maxCol(c)))
            case MinMaxNone => Seq(sumPart, nnPart)
          }
        }: _*)
      .filter(col(countCol) > 0L)
    recompute match {
      case Some(rec0) =>
        // groups the delta touched re-derive min/max from the source
        // snapshot; untouched groups carry their stored registers. The
        // recompute frame carries a membership marker so an affected
        // group whose surviving values are all NULL takes the (NULL)
        // recomputed extremum instead of falling back to the stale
        // stored one (ADVICE r10 NULL semantics).
        val rec = rec0(affectedGroups).withColumn("__raff", lit(true))
        rolled.alias("__r").join(rec.alias("__c"),
            d.groupCols.map(c => col(s"__r.$c") <=> col(s"__c.$c"))
              .reduce(_ && _), "left_outer")
          .select(d.groupCols.map(c => col(s"__r.$c").as(c)) ++
            Seq(col(countCol)) ++
            d.sumCols.flatMap(c => Seq(col(sumCol(c)), col(nnCol(c)),
              when(col("__raff").isNotNull, col(s"__rmin_$c"))
                .otherwise(col(minCol(c))).as(minCol(c)),
              when(col("__raff").isNotNull, col(s"__rmax_$c"))
                .otherwise(col(maxCol(c))).as(maxCol(c)))): _*)
      case None => rolled
    }
  }

  /** Incrementally roll the view forward to the source's CURRENT
    * version: changed groups upsert and emptied groups delete in ONE
    * atomic [[Lake.merge]] commit (a reader between two separate
    * commits would otherwise see refreshed registers beside
    * should-be-gone groups) that ALSO carries the absorbed source
    * version as a txn marker — so a crash before the sidecar advance
    * is reconciled by [[recover]] instead of double-applying the slice
    * (ADVICE r10). Cost is O(changes since builtVersion), never a
    * source re-scan. Star views roll their per-dimension AUX rollups
    * forward in the same call (each its own table, same feed). No-op
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
      require(next.filter(d.groupCols.map(col(_).isNull).reduce(_ || _))
          .limit(1).count() == 0L,
        s"refresh of ${d.mvDir}: the missed slice introduced NULL group " +
          "values, which cannot key the view table — re-define instead")
      val cur = Lake.read(spark, d.mvDir)
      // emptied groups: present now, absent from the rolled-forward view
      val dead = cur.select(d.groupCols.map(col): _*)
        .except(next.select(d.groupCols.map(col): _*))
      Lake.merge(spark, d.mvDir, next, dead, targetFiles = 1,
        txn = Some(RefreshTxnApp -> v))
      // star views: roll the aux rollup forward with the same fact
      // feed (its own grouping — rebuild-free dim churn depends on
      // the aux staying fact-fresh)
      if (d.dims.nonEmpty && Lake.latestVersion(auxDir(d.mvDir)) > 0L)
        refreshAux(spark, d, v)
      val nd = d.copy(builtVersion = v)
      writeSidecar(nd)
      reg.put(regKey(sourceDir, dimDirs), nd)
      nd
    } finally next.unpersist()
  }

  /** Roll the aux rollup forward to fact version `v` — the same
    * signed-feed algebra as [[compensated]], grouped at the aux grain.
    * The aux is dim-attribute-free, so the feed needs NO dim joins.
    * Min/max always recompute over affected aux groups (the aux's own
    * MinMaxRecompute): correctness over cleverness on the index. */
  private def refreshAux(spark: SparkSession, d: MvDef, v: Long): Unit = {
    val adir = auxDir(d.mvDir)
    val gcols = auxGroupCols(spark, d)
    val factDerived = d.derived.filter { case (n, _) => factSide(spark, d, n) }
    val feed = withDerived(
      Lake.changes(spark, d.sourceDir, d.builtVersion, v,
        skipRewriteOnly = true), factDerived)
    val delta = feed
      .withColumn("__sign",
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
      .groupBy(gcols.map(col): _*)
      .agg(sum(col("__sign")).as("__dn"),
        d.sumCols.flatMap(c => Seq(
          sum(col("__sign") * col(c)).as(s"__ds_$c"),
          sum(when(col(c).isNotNull, col("__sign")).otherwise(0L))
            .as(s"__dnn_$c"))): _*)
    val auxDef = d.copy(groupCols = gcols, mvDir = adir)
    val cur = Lake.read(spark, adir)
    val next = rollForward(cur, delta, auxDef, MinMaxRecompute,
      recompute = Some((affected: DataFrame) => {
        val recAggs = d.sumCols.flatMap(c => Seq(
          min(col(c)).as(s"__rmin_$c"), max(col(c)).as(s"__rmax_$c")))
        withDerived(Lake.read(spark, d.sourceDir, v), factDerived)
          .join(broadcast(affected), gcols, "left_semi")
          .groupBy(gcols.map(col): _*)
          .agg(recAggs.head, recAggs.tail: _*)
      }),
      affectedGroups = feed.select(gcols.map(col): _*).distinct()).persist()
    try {
      val dead = cur.select(gcols.map(col): _*)
        .except(next.select(gcols.map(col): _*))
      Lake.merge(spark, adir, next, dead, targetFiles = 1)
      ()
    } finally next.unpersist()
  }

  /** DIMENSION CHURN, incrementally (round 11 — replaces the
    * hard "re-define on any dim change" refusal): advance dim `i`'s
    * pin from `dimVersion` to the dimension's CURRENT version by
    * consuming the DIMENSION's change feed against the per-dimension
    * AUX rollup — the fact table is never read:
    *
    *  - each changed dim row (update pre/postimage, insert, delete)
    *    joins the aux rollup on the join key: the preimage maps the
    *    key's stored subtotals to their OLD view group with sign −1,
    *    the postimage to the NEW group with +1 — a MOVE of a subtotal
    *    between groups, which count/sum registers absorb exactly;
    *  - min/max can't move (removing a subtotal from a group may
    *    remove its extremum), so every AFFECTED group re-derives them
    *    from `aux ⋈ new dim` — O(aux), bounded by the dimension's
    *    size × residual-group fanout, still never O(fact);
    *  - the register merge commits atomically with a txn marker, then
    *    the sidecar advances the dim pin.
    *
    * Cost: O(Δdim ⋈ aux) for the Σ registers + O(aux restricted to
    * affected groups) for extrema. At 100 TB — where the fact is the
    * 100 TB and the dimension is gigabytes — this is the difference
    * between a dim-row update costing a full fact re-aggregation and
    * costing a dimension-sized index pass.
    *
    * Requires the view FACT-FRESH (refresh() first): the aux rollup
    * advances with the fact feed, and interleaving both deltas in one
    * step would compensate fact changes against a moved dim
    * inconsistently. */
  def refreshDim(spark: SparkSession, sourceDir: String,
      dimDirs: Seq[String]): MvDef = {
    val d = reg.get(regKey(sourceDir, dimDirs))
    require(d != null, s"no registered MV for $sourceDir (dims=$dimDirs)")
    require(d.builtVersion == Lake.latestVersion(sourceDir),
      s"refreshDim requires a fact-fresh view: refresh($sourceDir) first")
    var cur = d
    d.dims.zipWithIndex.foreach { case (ds, i) =>
      val dv = Lake.latestVersion(ds.dimDir)
      if (dv > ds.dimVersion) {
        applyDimChurn(spark, cur, i, dv)
        val nds = cur.dims.updated(i, ds.copy(dimVersion = dv))
        cur = cur.copy(dims = nds)
        writeSidecar(cur)
        reg.put(regKey(sourceDir, dimDirs), cur)
      }
    }
    cur
  }

  /** The move algebra of one dimension's churn: delta/affected frames
    * plus the extrema re-derivation, shared by [[refreshDim]] (which
    * commits them) and the rewrite rule's SERVE-TIME star compensation
    * ([[compensatedStar]], which consumes the deltas directly). */
  private case class DimChurnPlan(delta: DataFrame, affected: DataFrame,
      recompute: DataFrame => DataFrame)

  /** The view groups whose registers dim `i`'s churn touches, and the
    * signed per-group delta — computed from Δdim ⋈ aux (plus broadcast
    * joins of the OTHER dims, each at the version `dimVersionOf`
    * reports — their committed pins for a plain refresh, the already-
    * advanced versions when moves compose sequentially — to re-label
    * the aux subtotals with their group attributes). `aux` is the
    * fact-grain rollup frame to move — the committed table, or its
    * in-plan fact-compensated roll-forward ([[compensatedStar]]). The
    * fact table is never read. */
  private def dimMoveDelta(spark: SparkSession, d: MvDef, i: Int,
      toDimVersion: Long, aux: DataFrame,
      dimVersionOf: Int => Long): DimChurnPlan = {
    val ds = d.dims(i)
    val others = d.dims.zipWithIndex.filter(_._2 != i)
    def joinOthers(base: DataFrame): DataFrame =
      others.foldLeft(base) { case (df, (o, j)) =>
        df.join(broadcast(Lake.read(spark, o.dimDir, dimVersionOf(j))),
          col(o.factKey) === col(o.dimKey))
      }
    // pure-dim derived group columns recompute after the dim joins;
    // fact-side ones are already materialized in the aux grouping
    val dimDerived = d.derived.filter { case (n, _) =>
      d.groupCols.exists(_.equalsIgnoreCase(n)) && !factSide(spark, d, n)
    }
    // the dim feed: preimages/deletes carry the OLD attribute values
    // (sign −1), postimages/inserts the NEW (sign +1); an insert of a
    // key no fact row references joins nothing and contributes nothing
    val dimFeed = Lake.changes(spark, ds.dimDir, ds.dimVersion,
      toDimVersion, skipRewriteOnly = true)
      .withColumn("__sign",
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
    val joined = withDerived(
      joinOthers(aux).join(broadcast(dimFeed),
        col(ds.factKey) === col(ds.dimKey)), dimDerived)
    // a MOVE of each matched subtotal between its old and new view
    // groups: signed aggregation OF THE STORED REGISTERS (count/sum/
    // non-null count all move exactly; min/max cannot move and
    // recompute separately)
    val delta = joined.groupBy(d.groupCols.map(col): _*)
      .agg(sum(col("__sign") * col(countCol)).as("__dn"),
        d.sumCols.flatMap(c => Seq(
          sum(col("__sign") * col(sumCol(c))).as(s"__ds_$c"),
          sum(col("__sign") * col(nnCol(c))).as(s"__dnn_$c"))): _*)
    val affected = joined.select(d.groupCols.map(col): _*).distinct()
    // extrema re-derive from aux ⋈ dims (dim i at its NEW version),
    // restricted to affected groups: aux mins/maxes partition the
    // fact rows per aux group, so min-of-mins over a view group is
    // exact. O(aux), bounded by dim size × fact-group fanout —
    // never O(fact).
    val recompute = (aff: DataFrame) => {
      val newDim = Lake.read(spark, ds.dimDir, toDimVersion)
      val reJoined = withDerived(
        joinOthers(aux).join(broadcast(newDim),
          col(ds.factKey) === col(ds.dimKey)), dimDerived)
      val recAggs = d.sumCols.flatMap(c => Seq(
        min(when(col(nnCol(c)) > 0L, col(minCol(c)))).as(s"__rmin_$c"),
        max(when(col(nnCol(c)) > 0L, col(maxCol(c)))).as(s"__rmax_$c")))
      reJoined.join(broadcast(aff), d.groupCols, "left_semi")
        .groupBy(d.groupCols.map(col): _*)
        .agg(recAggs.head, recAggs.tail: _*)
    }
    DimChurnPlan(delta, affected, recompute)
  }

  /** The committed aux table, or — when the aux is missing because a
    * register is not fact-side — a descriptive failure. */
  private def committedAux(spark: SparkSession, d: MvDef): DataFrame = {
    val adir = auxDir(d.mvDir)
    require(Lake.latestVersion(adir) > 0L,
      s"view ${d.mvDir} has no aux rollup (a register is not fact-side): " +
        "dimension churn requires a re-define here")
    Lake.read(spark, adir)
  }

  private def applyDimChurn(spark: SparkSession, d: MvDef, i: Int,
      toDimVersion: Long): Unit = {
    val p = dimMoveDelta(spark, d, i, toDimVersion, committedAux(spark, d),
      j => d.dims(j).dimVersion)
    val cur = Lake.read(spark, d.mvDir)
    val next = rollForward(cur, p.delta, d, MinMaxRecompute,
      recompute = Some(p.recompute), affectedGroups = p.affected).persist()
    try {
      val dead = cur.select(d.groupCols.map(col): _*)
        .except(next.select(d.groupCols.map(col): _*))
      Lake.merge(spark, d.mvDir, next, dead, targetFiles = 1)
      ()
    } finally next.unpersist()
  }

  /** The aux rollup rolled to fact version `v` IN-PLAN — the same
    * signed-feed algebra [[refreshAux]] commits, consumed directly
    * (Σ registers only). The device that lets serve-time dim moves
    * compose with an unabsorbed FACT delta: moves must be computed
    * against the fact state the serve answers at. */
  private def compensatedAux(spark: SparkSession, d: MvDef, v: Long,
      withExtrema: Boolean = false): DataFrame = {
    // extrema ride the aux roll-forward two ways (round 14 closes the
    // last refusal — VERDICT r13 #2): an INSERT-ONLY slice rolls them
    // via least/greatest of stored register and feed extremum (the
    // same MinMaxFeed rule the view registers use, O(Δ)); a
    // delete/update slice may have removed an aux group's extremum,
    // so the groups the slice touched re-derive min/max from the fact
    // snapshot RESTRICTED to those groups (the same affected-group
    // recompute the committed [[refreshAux]] runs — bounded by Δ's
    // group set, never O(table))
    val feedMode = withExtrema &&
      appendOnlySlice(d.sourceDir, d.builtVersion, v)
    val gcols = auxGroupCols(spark, d)
    val factDerived = d.derived.filter { case (n, _) => factSide(spark, d, n) }
    val feed = withDerived(
      Lake.changes(spark, d.sourceDir, d.builtVersion, v,
        skipRewriteOnly = true), factDerived)
    val delta = feed
      .withColumn("__sign",
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
      .groupBy(gcols.map(col): _*)
      .agg(sum(col("__sign")).as("__dn"),
        (d.sumCols.flatMap(c => Seq(
          sum(col("__sign") * col(c)).as(s"__ds_$c"),
          sum(when(col(c).isNotNull, col("__sign")).otherwise(0L))
            .as(s"__dnn_$c"))) ++
          (if (feedMode) d.sumCols.flatMap(c => Seq(
            min(col(c)).as(s"__dmin_$c"), max(col(c)).as(s"__dmax_$c")))
          else Nil)): _*)
    val auxDef = d.copy(groupCols = gcols)
    val mode =
      if (!withExtrema) MinMaxNone
      else if (feedMode) MinMaxFeed
      else MinMaxRecompute
    rollForward(committedAux(spark, d), delta, auxDef, mode,
      recompute = if (mode == MinMaxRecompute)
        Some((affected: DataFrame) => {
          val recAggs = d.sumCols.flatMap(c => Seq(
            min(col(c)).as(s"__rmin_$c"), max(col(c)).as(s"__rmax_$c")))
          withDerived(Lake.read(spark, d.sourceDir, v), factDerived)
            .join(broadcast(affected), gcols, "left_semi")
            .groupBy(gcols.map(col): _*)
            .agg(recAggs.head, recAggs.tail: _*)
        })
      else None,
      affectedGroups = feed.select(gcols.map(col): _*).distinct())
  }

  /** SERVE-TIME STAR COMPENSATION (round 11 single-dim; round 12
    * composes MULTIPLE churned dims AND an unabsorbed fact delta —
    * VERDICT r11 #2): the view's rows with the fact slice
    * `(built → factTo]` and every stale dim's churn `(pin → to]`
    * absorbed IN-PLAN, consumed directly by the rewrite rule. Order
    * mirrors the committed protocol (`refresh` then `refreshDim`):
    *
    *  1. the FACT feed (joined with the PINNED dims) compensates the
    *     view registers to `factTo` — `Σ(Δfact ⋈ pinned dims)`;
    *  2. the aux rollup rolls to `factTo` in-plan the same way
    *     ([[compensatedAux]]) — moves must weigh fact-fresh subtotals;
    *  3. each stale dim's move delta applies SEQUENTIALLY off that
    *     aux, already-advanced dims joining at their NEW versions —
    *     exactly [[refreshDim]]'s composition, uncommitted.
    *
    * Σ registers always move exactly (count/sum/non-null count).
    * EXTREMA (round 13, VERDICT r12 #5): a moved subtotal may have
    * carried the extremum away, so min/max cannot move — but the aux
    * rows' own min/max registers stay VALID under dim churn (no fact
    * row changed), so each move re-derives the affected view groups'
    * extrema from `aux ⋈ dims` exactly as the committed
    * [[refreshDim]] does ([[dimMoveDelta]]`.recompute` — O(aux),
    * never a fact re-scan). Available when the fact sits at the view
    * pin, or when the unabsorbed fact slice is INSERT-ONLY — the
    * view's and aux's extrema then roll via [[MinMaxFeed]]
    * (least/greatest, exact for inserts) before the moves recompute
    * off the extrema-fresh aux. DELETE/UPDATE fact slices compose too
    * (round 14, VERDICT r13 #2 — the refusal matrix closes): the
    * groups the slice touched re-derive view AND aux extrema from the
    * fact snapshot restricted to those groups ([[MinMaxRecompute]] —
    * bounded by Δ's group set, the price min/max pays under deletes
    * in every IVM system), and the moves then run on the
    * extrema-fresh aux exactly as before. Cost:
    * O(view + Δfact + Σᵢ(Δdimᵢ ⋈ aux)) (+ the affected-group fact
    * read under a delete-bearing slice). */
  // ---- serve-plan construction memo (round 14, VERDICT r13 #5) --------
  // JobProfile evidence: of a ~3-4 s star serve, only ~2-2.4 s sits
  // inside Spark jobs — the rest is DRIVER time, dominated by
  // re-CONSTRUCTING this compensation plan (delta-log reads, manifest
  // IO, nested analysis of every Lake read) at least twice per query
  // invocation (the rewrite rule runs once when the caller inspects
  // the serve kind and again when the output plan executes). The
  // constructed frame is deterministic for a version pin tuple —
  // source slice, every dim version, the view table's and aux table's
  // own versions all immutable once written — so the DataFrame object
  // memoizes under that key (plan construction only: NO row caching,
  // execution still runs the full compensation every time). A refresh
  // or new commit changes a pinned version and simply misses into a
  // fresh entry; the small LRU bounds the registry.
  private val starPlanMemo =
    new java.util.LinkedHashMap[String, DataFrame](32, 0.75f, true)
  private val StarPlanMemoMax = 16

  /** Drop every memoized serve plan. MUST run whenever a fixture
    * teardown deletes table directories that may be rebuilt at the
    * SAME paths with the SAME versions (Bench's cold-accounting pass,
    * [[graft.SparkEntry.invalidateMemos]]): the memo key is the
    * version-pin tuple, which an identical rebuild reproduces exactly,
    * so a surviving entry would serve a plan whose analyzed file list
    * names the PREVIOUS build's (deleted) data files. */
  private[graft] def invalidatePlanMemo(): Unit =
    starPlanMemo.synchronized { starPlanMemo.clear() }

  /** Drop the memoized serve plans of ONE view directory. Runs in
    * [[defineImpl]], which deletes and rebuilds the view (and aux)
    * table in place: the rebuild reproduces the same version pins —
    * and therefore the same memo keys — over fresh data-file UUIDs,
    * so surviving entries would execute over the deleted files
    * (observed as the bench's flaky pass-then-fail on
    * `x6_stream_mv`, whose min-of-2 second run re-defines the view). */
  private def invalidatePlanMemoFor(mvDir: String): Unit =
    starPlanMemo.synchronized {
      val it = starPlanMemo.keySet().iterator()
      while (it.hasNext) if (it.next().contains(mvDir)) it.remove()
    }

  private def planMemo(key: String)(mk: => DataFrame): DataFrame =
    starPlanMemo.synchronized {
      val hit = starPlanMemo.get(key)
      if (hit != null) hit
      else {
        val df = mk
        df.queryExecution.analyzed // pay analysis once, inside the memo
        starPlanMemo.put(key, df)
        if (starPlanMemo.size() > StarPlanMemoMax) {
          val it = starPlanMemo.entrySet().iterator()
          it.next(); it.remove()
        }
        df
      }
    }

  private[graft] def compensatedStarCached(spark: SparkSession, d: MvDef,
      factTo: Long, staleDims: Seq[(Int, Long)],
      wantsExtrema: Boolean): DataFrame =
    planMemo(s"${System.identityHashCode(spark)}:" +
        s"${d.mvDir}@${Lake.latestVersion(d.mvDir)}" +
        s":aux${Lake.latestVersion(auxDir(d.mvDir))}" +
        s":b${d.builtVersion}:f$factTo:$wantsExtrema" +
        staleDims.map { case (i, v) => s":d$i=$v" }.mkString) {
      compensatedStar(spark, d, factTo, staleDims, wantsExtrema)
    }

  /** The rewrite rule's memoized form of [[compensated]] — same
    * version-pinned plan-construction memo as
    * [[compensatedStarCached]] (the committed [[refresh]] keeps
    * calling the raw builder: it persists and commits the frame, and
    * its pins change immediately after). */
  private[graft] def compensatedCached(spark: SparkSession, d: MvDef,
      toVersion: Long, minMax: MinMaxMode): DataFrame =
    planMemo(s"${System.identityHashCode(spark)}:" +
        s"${d.mvDir}@${Lake.latestVersion(d.mvDir)}" +
        s":b${d.builtVersion}:f$toVersion:$minMax") {
      compensated(spark, d, toVersion, minMax)
    }

  private[graft] def compensatedStar(spark: SparkSession, d: MvDef,
      factTo: Long, staleDims: Seq[(Int, Long)],
      wantsExtrema: Boolean = false): DataFrame = {
    val factAhead = factTo > d.builtVersion
    var view: DataFrame =
      if (factAhead) {
        val viewMode =
          if (!wantsExtrema) MinMaxNone
          else if (appendOnlySlice(d.sourceDir, d.builtVersion, factTo))
            MinMaxFeed
          else MinMaxRecompute
        compensated(spark, d, factTo, viewMode)
      } else Lake.read(spark, d.mvDir)
    val aux =
      if (factAhead) compensatedAux(spark, d, factTo, wantsExtrema)
      else committedAux(spark, d)
    val effective = Array.tabulate(d.dims.size)(j => d.dims(j).dimVersion)
    staleDims.foreach { case (i, to) =>
      val p = dimMoveDelta(spark, d, i, to, aux, j => effective(j))
      view = rollForward(view, p.delta, d,
        if (wantsExtrema) MinMaxRecompute else MinMaxNone,
        if (wantsExtrema) Some(p.recompute) else None, p.affected)
      effective(i) = to
    }
    view
  }

  /** Is serve-time dim compensation available (the aux rollup exists —
    * every register fact-side)? */
  private[graft] def dimCompensable(d: MvDef): Boolean =
    d.dims.nonEmpty && Lake.latestVersion(auxDir(d.mvDir)) > 0L

  // ---- AUTOMATIC INCREMENTAL MAINTENANCE (round 12, VERDICT r11 #1) --------

  /** When enabled, a [[Lake.onCommit]] hook advances every registered
    * view that DEPENDS on the committed table — as its fact source
    * ([[refresh]] / [[refreshDistinct]]) or as a star dimension
    * ([[refreshDim]], after a fact [[refresh]] to satisfy its
    * fact-fresh precondition) — on the writer's thread, immediately
    * after the commit publishes. Steady state then serves DIRECT with
    * no human `CALL graft.refresh_mv*`: the Delta-Live-Tables /
    * MV-log pattern, here riding the commit protocol itself.
    *
    * Failure containment: each advance is the same crash-safe
    * incremental refresh the manual CALL runs (atomic merge + txn
    * marker); an advance that fails leaves the view stale and STILL
    * CORRECT — the rewrite's compensation path covers the gap until
    * the next commit retries. Outcomes land in [[lastMaintenance]]
    * for observability. Re-entrancy: the refreshes commit to the view
    * tables themselves, which fires the hook again — a thread-local
    * guard makes those inner commits no-ops.
    *
    * Scale shape: at 100 TB each source commit already knows its
    * touched files; the maintenance pass reads exactly that change
    * feed once per dependent view, so write amplification is
    * O(dependents × Δ) — the same work the first post-commit query
    * would otherwise pay per query until someone refreshed. */
  private val autoMaintain = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val hookInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val inMaintenance = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Last auto-maintenance outcome: (committed source dir, summary). */
  val lastMaintenance = new AtomicReference[(String, String)]()

  /** Maintenance scheduling policy (round 13, VERDICT r12 #2).
    * Round 12's hook ran one change-feed read + merge commit per
    * dependent view INLINE on the writer's thread per commit: with V
    * dependent views every write paid V maintenance passes before
    * returning — a high-frequency ingest stream with several
    * dashboards registered amplifies write latency V×. The policy
    * decouples both axes, with the compensation serve as the
    * freshness bridge in every gap (a query between passes serves
    * `view ⊕ Σ(changes)` exactly — that path is machine-checked by
    * its own driver rows):
    *
    *  - `everyN`: advance dependents at most every N ELIGIBLE commits
    *    per source table (eligible = row-changing AND some view
    *    depends on it — unrelated tables never consume the budget).
    *    Delta/Snowflake ship the same debounce as log-lag / target-lag.
    *  - `async`: hand the pass to the bounded daemon maintenance POOL
    *    (round 14, VERDICT r13 #1 — round 13's single thread
    *    serialized passes across INDEPENDENT sources, so a burst
    *    touching S sources drained in Σ(pass time) wall-clock and
    *    every reader paid the compensation serve meanwhile). The
    *    writer's commit returns immediately. Bursts COALESCE per
    *    source: a source whose pass is still queued is not enqueued
    *    again, and a commit landing DURING a source's pass marks it
    *    dirty for exactly one follow-up pass — so K rapid commits
    *    cost ≤⌈K/N⌉ passes and possibly fewer. PER-SOURCE ORDERING
    *    is structural: at most one in-flight task exists per source
    *    (the state machine only submits on idle→queued /
    *    running→dirty→queued transitions), so a source's passes can
    *    never race its own view commits, while DISTINCT sources
    *    overlap up to `workers` wide. [[awaitMaintenance]] drains the
    *    whole machine for deterministic tests/fixtures.
    *  - `workers`: the pool bound (wall-clock overlap across
    *    independent sources; 1 restores the round-13 shape).
    *  - `maxLagMs`: time-based debounce (round 14, VERDICT r13 #4 —
    *    the production target-lag dial): a DEBOUNCED eligible commit
    *    (one `everyN` swallowed) arms a per-source lag timer; if no
    *    pass runs within `maxLagMs`, one is scheduled anyway. A
    *    slow-trickle writer (1 commit/hour, everyN=10) is then at
    *    most `maxLagMs` stale instead of 10 hours. Expiry is
    *    evaluated against [[maintenanceClock]] (injectable for
    *    deterministic tests); lag-fired passes always ride the async
    *    executor — a timer thread never runs Spark jobs inline with
    *    a writer. */
  final case class MaintainPolicy(everyN: Int = 1, async: Boolean = false,
      workers: Int = 4, maxLagMs: Option[Long] = None) {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    require(workers >= 1, s"workers must be >= 1, got $workers")
    maxLagMs.foreach(l => require(l > 0, s"maxLagMs must be > 0, got $l"))
  }
  private val policyRef = new AtomicReference[MaintainPolicy](MaintainPolicy())
  // per-source-dir eligible-commit counter (the everyN modulus) and
  // completed-pass counter (observability; pinned by the gated query)
  private val commitCounts =
    new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private val passCounts =
    new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  /** Completed maintenance passes for `dir` since the last arm. */
  def maintenancePasses(dir: String): Long =
    Option(passCounts.get(dir)).map(_.get()).getOrElse(0L)

  // ---- the background maintenance executor (policy.async) -------------
  // A bounded daemon pool drains per-source pass requests (round 14 —
  // the round-13 single thread serialized independent sources). Each
  // source dir runs a three-state machine under one global monitor
  // (`passStates`; absent = idle):
  //   idle --schedule--> Queued   (task submitted — the ONLY submit
  //                                besides the dirty re-queue)
  //   Queued --worker--> Running  (pass reads the table head)
  //   Running --schedule--> RunningDirty (a commit landed mid-pass:
  //                                exactly one follow-up pass re-queues
  //                                when this one finishes)
  // At most one task is ever in flight per source — per-source
  // ordering is structural, not lock-based — while distinct sources
  // overlap up to the pool bound. `outstanding` counts sources in any
  // non-idle state (the await condition); `maxOverlap` records the
  // widest observed concurrency (pinned by the gated query);
  // `orderingViolations` is a belt-and-braces runtime check that the
  // per-source invariant held (asserted 0 by AutoMaintainSpec).
  private object MState extends Enumeration {
    val Queued, Running, RunningDirty = Value
  }
  private val passStates =
    new java.util.concurrent.ConcurrentHashMap[String, MState.Value]()
  private val outstanding = new java.util.concurrent.atomic.AtomicLong(0L)
  private val runningNow = new java.util.concurrent.atomic.AtomicLong(0L)
  private val maxOverlapRef = new java.util.concurrent.atomic.AtomicLong(0L)
  private val perDirRunning = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()
  private val violations = new java.util.concurrent.atomic.AtomicLong(0L)
  private val poolRef = new AtomicReference[
    java.util.concurrent.ThreadPoolExecutor](null)
  // test/fixture gate: when set, a started pass awaits the latch
  // before touching data — lets a burst's overlap be observed
  // deterministically instead of racing pass duration against commit
  // cadence. Never set in production paths.
  private[graft] val passGate =
    new AtomicReference[java.util.concurrent.CountDownLatch](null)

  /** Widest pass concurrency observed since the last arm. */
  def maintenanceOverlap: Long = maxOverlapRef.get()

  /** Per-source ordering violations observed (must stay 0). */
  def maintenanceOrderingViolations: Long = violations.get()

  private def ensurePool(workers: Int): java.util.concurrent.ThreadPoolExecutor =
    poolRef.synchronized {
      val cur = poolRef.get()
      if (cur != null && cur.getCorePoolSize == workers && !cur.isShutdown) cur
      else {
        // re-arming with a new bound: let in-flight tasks finish on the
        // old pool (their state transitions stay correct), route new
        // submissions to the new one
        val tf = new java.util.concurrent.ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicInteger(0)
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"graft-mv-maintenance-${n.getAndIncrement()}")
            t.setDaemon(true)
            t
          }
        }
        val p = new java.util.concurrent.ThreadPoolExecutor(workers, workers,
          30L, java.util.concurrent.TimeUnit.SECONDS,
          new java.util.concurrent.LinkedBlockingQueue[Runnable](), tf)
        p.allowCoreThreadTimeOut(true)
        poolRef.set(p)
        p
      }
    }

  /** idle→Queued (submit) / Queued→no-op (coalesce) / Running→dirty. */
  private def schedulePass(spark: SparkSession, dir: String,
      workers: Int): Unit = passStates.synchronized {
    passStates.get(dir) match {
      case null =>
        passStates.put(dir, MState.Queued)
        outstanding.incrementAndGet()
        ensurePool(workers).execute(() => runScheduled(spark, dir, workers))
      case MState.Queued => () // a queued pass reads this commit's head too
      case MState.Running => passStates.put(dir, MState.RunningDirty)
      case MState.RunningDirty => ()
    }
  }

  private def runScheduled(spark: SparkSession, dir: String,
      workers: Int): Unit = {
    passStates.synchronized { passStates.put(dir, MState.Running) }
    val mine = perDirRunning
      .computeIfAbsent(dir, _ => new java.util.concurrent.atomic.AtomicLong())
    if (mine.incrementAndGet() > 1L) violations.incrementAndGet()
    val now = runningNow.incrementAndGet()
    maxOverlapRef.updateAndGet(m => math.max(m, now))
    try {
      Option(passGate.get()).foreach(
        _.await(60, java.util.concurrent.TimeUnit.SECONDS))
      runPass(spark, dir)
    } catch { case _: Throwable => () }
    finally {
      runningNow.decrementAndGet()
      mine.decrementAndGet()
      passStates.synchronized {
        passStates.get(dir) match {
          case MState.RunningDirty =>
            // a commit landed mid-pass: one follow-up covers every such
            // commit (it reads the head), preserving per-source order
            passStates.put(dir, MState.Queued)
            ensurePool(workers).execute(() => runScheduled(spark, dir, workers))
          case _ =>
            passStates.remove(dir)
            outstanding.decrementAndGet()
        }
      }
    }
  }

  // ---- time-based debounce (policy.maxLagMs) ---------------------------
  // A debounced commit records when its source FIRST went pending; a
  // one-shot timer then forces a pass if no everyN boundary arrived in
  // time. Expiry compares against the injectable clock so specs drive
  // it deterministically (set the clock, call pokeMaintenance()).
  @volatile private[graft] var maintenanceClock: () => Long =
    () => System.currentTimeMillis()
  private case class LagPending(spark: SparkSession, since: Long)
  private val lagPending =
    new java.util.concurrent.ConcurrentHashMap[String, LagPending]()
  private lazy val lagTimer = {
    val t = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val th = new Thread(r, "graft-mv-lag-timer")
        th.setDaemon(true)
        th
      })
    t
  }

  /** Evaluate lag expiry now (the timer's body; callable from tests
    * with an injected [[maintenanceClock]]). Expired sources get a
    * pass on the async executor regardless of the sync/async policy —
    * the timer thread never runs Spark jobs. */
  def pokeMaintenance(): Unit = {
    if (!autoMaintain.get()) { lagPending.clear(); return }
    val policy = policyRef.get()
    policy.maxLagMs.foreach { lag =>
      val now = maintenanceClock()
      lagPending.forEach { (dir, p) =>
        if (now - p.since >= lag && lagPending.remove(dir, p))
          schedulePass(p.spark, dir, policy.workers)
      }
    }
  }

  /** Block until every scheduled async pass has finished (tests and
    * landed fixtures; production readers never need it — the
    * compensation serve is exact in the gap). */
  def awaitMaintenance(timeoutMs: Long = 120000L): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (outstanding.get() > 0 && System.nanoTime() < deadline)
      Thread.sleep(5)
    require(outstanding.get() == 0,
      s"auto-maintenance did not drain within ${timeoutMs} ms")
  }

  def enableAutoMaintenance(): Unit = enableAutoMaintenance(MaintainPolicy())

  def enableAutoMaintenance(policy: MaintainPolicy): Unit = {
    if (hookInstalled.compareAndSet(false, true))
      Lake.onCommit(maintainDependents)
    if (policy.async) ensurePool(policy.workers)
    policyRef.set(policy)
    commitCounts.clear()
    passCounts.clear()
    lagPending.clear()
    maxOverlapRef.set(0L)
    violations.set(0L)
    autoMaintain.set(true)
  }

  def disableAutoMaintenance(): Unit = autoMaintain.set(false)

  private def maintainDependents(dir: String, version: Long): Unit = {
    if (!autoMaintain.get() || inMaintenance.get()) return
    // row-preserving maintenance (compaction, analyze, auto-compact)
    // changes no rows: the serve path already treats the slice as
    // fresh (effectiveVersion), so a refresh cycle would commit an
    // empty delta for nothing
    if (Lake.rewriteOnly(dir, version)) return
    if (!hasDependents(dir)) return
    val policy = policyRef.get()
    val n = commitCounts
      .computeIfAbsent(dir, _ => new java.util.concurrent.atomic.AtomicLong())
      .incrementAndGet()
    if (n % policy.everyN != 0) {
      // debounced: compensation bridges. With maxLagMs set, record the
      // FIRST pending moment and arm a one-shot expiry check — a
      // slow-trickle source is then at most maxLagMs stale.
      policy.maxLagMs.foreach { lag =>
        val p = LagPending(SparkSession.active, maintenanceClock())
        if (lagPending.putIfAbsent(dir, p) == null)
          lagTimer.schedule((() => pokeMaintenance()): Runnable,
            lag, java.util.concurrent.TimeUnit.MILLISECONDS)
      }
      return
    }
    lagPending.remove(dir) // this pass covers any pending lag
    if (policy.async) schedulePass(SparkSession.active, dir, policy.workers)
    else runPass(SparkSession.active, dir) // guards its own re-entrancy
  }

  private def hasDependents(dir: String): Boolean = {
    import scala.jdk.CollectionConverters._
    reg.values.asScala.exists(d =>
      d.sourceDir == dir || d.dims.exists(_.dimDir == dir)) ||
      dreg.values.asScala.exists(_.sourceDir == dir)
  }

  /** One maintenance pass: advance every view depending on `dir` to
    * the table head. Runs on the writer's thread (sync policy) or the
    * maintenance executor (async); the re-entrancy guard is
    * per-thread, so the pass's own view-table commits are no-ops on
    * whichever thread runs it. */
  private def runPass(spark: SparkSession, dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val asSource = reg.values.asScala.filter(_.sourceDir == dir).toSeq
    val asDim = reg.values.asScala
      .filter(d => d.sourceDir != dir && d.dims.exists(_.dimDir == dir)).toSeq
    val asDistinct = dreg.values.asScala.filter(_.sourceDir == dir).toSeq
    if (asSource.isEmpty && asDim.isEmpty && asDistinct.isEmpty) return
    inMaintenance.set(java.lang.Boolean.TRUE)
    try {
      val outcomes = scala.collection.mutable.ArrayBuffer[String]()
      asSource.foreach { d =>
        try { refresh(spark, d.sourceDir, d.dims.map(_.dimDir))
          outcomes += s"refreshed ${d.mvDir}" }
        catch { case e: Exception =>
          outcomes += s"refresh ${d.mvDir} FAILED: ${e.getMessage}" }
      }
      asDim.foreach { d =>
        try {
          refresh(spark, d.sourceDir, d.dims.map(_.dimDir))
          refreshDim(spark, d.sourceDir, d.dims.map(_.dimDir))
          outcomes += s"dim-refreshed ${d.mvDir}"
        } catch { case e: Exception =>
          outcomes += s"refreshDim ${d.mvDir} FAILED: ${e.getMessage}" }
      }
      asDistinct.foreach { d =>
        try { refreshDistinct(spark, d.mvDir)
          outcomes += s"refreshed-distinct ${d.mvDir}" }
        catch { case e: Exception =>
          outcomes += s"refreshDistinct ${d.mvDir} FAILED: ${e.getMessage}" }
      }
      // the executing thread is part of the record: the async policy's
      // contract (writer latency excludes dependent-view work) is
      // auditable from the summary alone
      lastMaintenance.set((dir,
        s"[${Thread.currentThread().getName}] " + outcomes.mkString("; ")))
      passCounts
        .computeIfAbsent(dir, _ => new java.util.concurrent.atomic.AtomicLong())
        .incrementAndGet()
    } finally inMaintenance.set(java.lang.Boolean.FALSE)
  }

  // ---- COUNT(DISTINCT) views: the (group × value)-grain aux ----------------

  /** A DISTINCT-COUNT view: one lake table at `(groupCols × value)`
    * grain — the standard IVM answer to the one aggregate the Σ-register
    * family cannot carry. `count(distinct x)` is not incrementally
    * maintainable from a per-group register (a delete cannot tell
    * whether it removed the LAST instance of a value), but it IS from
    * the value-grain projection: each aux row holds a signed instance
    * count `__mv_n` for one `(group, value)` pair, rows reaching zero
    * drop, and the distinct count per group is simply the number of
    * surviving non-null-value rows. The same grain makes EVERY
    * x-aggregate exact — including min/max UNDER DELETES, which the
    * plain view's registers must refuse (a removed row may have been
    * the extremum; here the surviving values are all present).
    *
    * NULL values are kept (encoded, see below), so the aux covers every
    * fact row: group EXISTENCE is preserved (a group whose x values are
    * all NULL still answers `count(distinct x) = 0`, exactly like the
    * direct aggregate), and `count(*)` serves as Σ of the instance
    * counts.
    *
    * Scale shape: aux size is Σ per group NDV(x) — the same table a
    * warehouse materializes for distinct dashboards. At 100 TB the aux
    * is fact-row-bounded but typically orders of magnitude smaller;
    * maintenance reads only the change feed, O(Δ) like every other
    * register here. */
  /** `dims` (round 12 — DISTINCT STAR VIEWS): join-key metadata
    * `(dimDir, factKey, dimKey)` for dimensions the rewrite may
    * re-label the aux through at SERVE time. Unlike the plain star
    * view's [[DimSpec]], there is NO pinned dim version: the aux is
    * entirely fact-side (its grain includes every factKey), and the
    * serve joins the QUERY's own pinned dimension read — so dimension
    * churn costs NOTHING here: no pin, no refresh_mv_dims, no move
    * algebra. "Distinct users per country" stays exact through any
    * user-dim reassignment because the (user × …) aux never stored a
    * country. `groupCols` is always the AUX GRAIN (fact-side group
    * columns ++ every factKey); dim-attribute groupings exist only in
    * queries, resolved through the serve-time join. */
  case class DistinctDef(sourceDir: String, mvDir: String,
      groupCols: Seq[String], distinctCol: String, builtVersion: Long,
      derived: Seq[(String, String)] = Nil,
      dims: Seq[(String, String, String)] = Nil)

  /** Aux-table value encoding: the lake keys on
    * `(groupCols…, __mv_vnull, __mv_v)` and key columns must be
    * NON-NULL, so a NULL value row stores `(1, <type default>)` and a
    * real value `(0, value)` — the flag disambiguates a genuine
    * default-valued row from an encoded NULL. [[distinctValExpr]]
    * reconstructs the logical value. */
  val vCol = "__mv_v"
  val vNullCol = "__mv_vnull"

  private def defaultFor(dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case IntegerType => lit(0)
      case LongType => lit(0L)
      case DoubleType => lit(0.0)
      case StringType => lit("")
      case other => sys.error(
        s"distinct view value type $other unsupported (int/long/double/string)")
    }
  }

  private def encodedVal(x: Column, dt: org.apache.spark.sql.types.DataType)
      : (Column, Column) =
    (when(x.isNull, 1).otherwise(0), coalesce(x, defaultFor(dt)))

  /** The logical distinct-column value of one aux row. */
  def distinctValExpr(): Column =
    when(col(vNullCol) === 0, col(vCol))

  def getDistinct(mvDir: String): Option[DistinctDef] = Option(dreg.get(mvDir))

  /** Register a distinct view, LAST-WINS per SHAPE — (source, value
    * column, grouping, derived): the most recently defined/recovered
    * view of one shape is the one the rewrite rule serves, so two
    * builds of the same shape (e.g. a fresh and a stale pin) never
    * race for a query. Views of DIFFERENT shapes over the same source
    * and value column coexist (ADVICE r11: a by-country aux beside the
    * daily DAU aux must not evict it — the rewrite's candidate scan
    * already picks per query). */
  private def registerDistinct(d: DistinctDef): Unit = {
    import scala.jdk.CollectionConverters._
    def shape(x: DistinctDef) = (x.sourceDir, x.distinctCol.toLowerCase,
      x.groupCols.map(_.toLowerCase),
      x.derived.map { case (n, e) => (n.toLowerCase, e) },
      x.dims.map { case (dd, fk, dk) => (dd, fk.toLowerCase, dk.toLowerCase) })
    dreg.entrySet().asScala
      .filter(e => shape(e.getValue) == shape(d) && e.getKey != d.mvDir)
      .map(_.getKey).foreach(dreg.remove)
    dreg.put(d.mvDir, d)
  }

  /** Every registered distinct view whose source is `dir` — the
    * rewrite rule's candidate lookup (and schema evolution's
    * dependency check rides [[invalidateReferencing]]'s sibling for
    * these — see [[invalidateDistinctReferencing]]). */
  def distinctViews(sourceDir: String): Seq[DistinctDef] = {
    import scala.jdk.CollectionConverters._
    dreg.values.asScala.filter(_.sourceDir == sourceDir).toSeq
  }

  /** DROP COLUMN dependency check for distinct views: a view whose
    * grouping or value column is dropped cannot be maintained. */
  def invalidateDistinctReferencing(dir: String, colName: String): Seq[String] = {
    val lc = colName.toLowerCase
    val hit = distinctViews(dir).filter { d =>
      (d.groupCols :+ d.distinctCol).exists(_.equalsIgnoreCase(lc)) ||
        d.derived.exists { case (_, e) =>
          s"\\b${java.util.regex.Pattern.quote(lc)}\\b".r
            .findFirstIn(e.toLowerCase).isDefined
        }
    }
    hit.foreach(d => dreg.remove(d.mvDir))
    hit.map(_.mvDir)
  }

  private val DistinctTxnApp = "graft-mvd-built"

  /** The aux frame of a source snapshot: one row per (group, encoded
    * value) with the instance count. */
  private def distinctAuxFrame(spark: SparkSession, sourceDir: String,
      version: Long, groupCols: Seq[String], distinctCol: String,
      derived: Seq[(String, String)]): DataFrame = {
    val src = withDerived(Lake.read(spark, sourceDir, version), derived)
    val dt = src.schema(distinctCol).dataType
    val (nullFlag, enc) = encodedVal(col(distinctCol), dt)
    src.withColumn(vNullCol, nullFlag).withColumn(vCol, enc)
      .groupBy((groupCols.map(col) :+ col(vNullCol) :+ col(vCol)): _*)
      .agg(count(lit(1)).as(countCol))
  }

  /** Build (or replace) a distinct view at a source snapshot, register
    * it for rewrite, persist the `_mvd` sidecar. */
  def defineDistinct(spark: SparkSession, sourceDir: String, mvDir: String,
      groupCols: Seq[String], distinctCol: String,
      asOfVersion: Long = 0L, derived: Seq[(String, String)] = Nil): DistinctDef = {
    require(!groupCols.exists(_.equalsIgnoreCase(distinctCol)),
      s"distinct column $distinctCol is also a group column")
    defineDistinctImpl(spark, sourceDir, mvDir, groupCols, distinctCol,
      asOfVersion, derived, Nil)
  }

  /** DISTINCT STAR VIEW (round 12): a distinct view whose queries may
    * group by DIMENSION attributes — "distinct users per country". The
    * aux grain is `factGroupCols ++ every dim's factKey` (pure
    * fact-side), so the aux never stores a dim attribute and dimension
    * churn cannot stale it: the rewrite re-labels through the query's
    * own pinned dim reads at serve time — no dim pin exists to
    * refresh. Maintenance stays the fact-feed roll-forward of
    * [[refreshDistinct]], unchanged. Exactness at serve relies on the
    * dim key being the dimension table's LAKE KEY (unique per row —
    * the format invariant), so the aux ⋈ dim join preserves
    * multiplicity. */
  def defineDistinctStar(spark: SparkSession, sourceDir: String,
      dims: Seq[(String, String, String)], mvDir: String,
      factGroupCols: Seq[String], distinctCol: String,
      asOfVersion: Long = 0L, derived: Seq[(String, String)] = Nil): DistinctDef = {
    require(dims.nonEmpty, "defineDistinctStar requires at least one dim")
    // fact group columns must not name the value; a JOIN KEY may — the
    // DAU shape ("distinct users per region") joins ON the value
    // column itself, and the (…, user, value=user) aux grain is merely
    // degenerate, not wrong
    require(!factGroupCols.exists(_.equalsIgnoreCase(distinctCol)),
      s"distinct column $distinctCol is also a declared group column")
    dims.foreach { case (dd, _, dk) =>
      val dv = Lake.latestVersion(dd)
      require(dv > 0L, s"no lake table at $dd")
      require(Lake.manifest(dd, dv).key.split(',').head.trim
          .equalsIgnoreCase(dk),
        s"distinct star dim $dd must be KEYED on its join key $dk " +
          "(uniqueness is what keeps the serve-time join exact)")
    }
    val auxCols = (factGroupCols ++ dims.map(_._2))
      .map(_.toLowerCase).distinct
    defineDistinctImpl(spark, sourceDir, mvDir, auxCols, distinctCol,
      asOfVersion, derived, dims)
  }

  private def defineDistinctImpl(spark: SparkSession, sourceDir: String,
      mvDir: String, groupCols: Seq[String], distinctCol: String,
      asOfVersion: Long, derived: Seq[(String, String)],
      dims: Seq[(String, String, String)]): DistinctDef = {
    require(groupCols.nonEmpty, "empty distinct-view grouping")
    derived.foreach { case (n, e) =>
      require(!derived.exists { case (m, _) =>
        (m ne n) && e.toLowerCase.matches(s".*\\b${java.util.regex.Pattern.quote(m.toLowerCase)}\\b.*")
      }, s"derived column $n references another derived column")
    }
    val v = if (asOfVersion == 0L) Lake.latestVersion(sourceDir) else asOfVersion
    require(v > 0L, s"no lake table at $sourceDir")
    val agg = distinctAuxFrame(spark, sourceDir, v, groupCols, distinctCol,
      derived)
    graft.Scratch.rm(new java.io.File(mvDir))
    createViewTable(spark, agg, mvDir, groupCols :+ vNullCol :+ vCol)
    val nullGroups = Lake.read(spark, mvDir)
      .filter(groupCols.map(col(_).isNull).reduce(_ || _)).limit(1).count()
    if (nullGroups > 0L) {
      graft.Scratch.rm(new java.io.File(mvDir))
      sys.error(s"distinct view group columns ${groupCols.mkString(",")} " +
        s"contain NULLs in $sourceDir@v$v — a NULL group cannot key the view")
    }
    val d = DistinctDef(sourceDir, mvDir, groupCols, distinctCol, v, derived,
      dims)
    writeDistinctSidecar(d)
    registerDistinct(d)
    d
  }

  /** [[defineDistinct]] with the build memoized on storage — same
    * policy as [[defineOrRecover]]: a matching `_mvd` sidecar
    * re-registers instead of re-aggregating (built version may differ,
    * a refresh advances it); any definition mismatch rebuilds. */
  def defineDistinctOrRecover(spark: SparkSession, sourceDir: String,
      mvDir: String, groupCols: Seq[String], distinctCol: String,
      asOfVersion: Long = 0L, derived: Seq[(String, String)] = Nil): DistinctDef = {
    val sidecar = java.nio.file.Paths.get(mvDir, "_mvd")
    if (java.nio.file.Files.exists(sidecar)) {
      val d = recoverDistinct(mvDir)
      val same = d.sourceDir == sourceDir &&
        d.groupCols.map(_.toLowerCase) == groupCols.map(_.toLowerCase) &&
        d.distinctCol.equalsIgnoreCase(distinctCol) &&
        d.derived.map { case (n, e) => (n.toLowerCase, e) } ==
          derived.map { case (n, e) => (n.toLowerCase, e) } &&
        d.dims.isEmpty
      if (same) return d
      dreg.remove(mvDir)
    }
    defineDistinct(spark, sourceDir, mvDir, groupCols, distinctCol,
      asOfVersion, derived)
  }

  /** [[defineDistinctStar]] with the build memoized on storage — the
    * [[defineDistinctOrRecover]] policy for the star shape. */
  def defineDistinctStarOrRecover(spark: SparkSession, sourceDir: String,
      dims: Seq[(String, String, String)], mvDir: String,
      factGroupCols: Seq[String], distinctCol: String,
      asOfVersion: Long = 0L, derived: Seq[(String, String)] = Nil): DistinctDef = {
    val sidecar = java.nio.file.Paths.get(mvDir, "_mvd")
    if (java.nio.file.Files.exists(sidecar)) {
      val d = recoverDistinct(mvDir)
      val auxCols = (factGroupCols ++ dims.map(_._2))
        .map(_.toLowerCase).distinct
      val same = d.sourceDir == sourceDir &&
        d.groupCols.map(_.toLowerCase) == auxCols &&
        d.distinctCol.equalsIgnoreCase(distinctCol) &&
        d.derived.map { case (n, e) => (n.toLowerCase, e) } ==
          derived.map { case (n, e) => (n.toLowerCase, e) } &&
        d.dims.map { case (dd, fk, dk) => (dd, fk.toLowerCase, dk.toLowerCase) } ==
          dims.map { case (dd, fk, dk) => (dd, fk.toLowerCase, dk.toLowerCase) }
      if (same) return d
      dreg.remove(mvDir)
    }
    defineDistinctStar(spark, sourceDir, dims, mvDir, factGroupCols,
      distinctCol, asOfVersion, derived)
  }

  /** Re-register a distinct view from its sidecar, reconciling the
    * built version against the view table's own txn marker (same
    * crash-window rule as [[recover]]): the marker wins — those
    * registers already absorbed the slice. */
  def recoverDistinct(mvDir: String): DistinctDef = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(mvDir, "_mvd")).toArray(Array.empty[String])
    val kv = lines.filter(_.contains("=")).map { l =>
      val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    val sidecarVersion = kv("builtVersion").toLong
    val txnVersion = Lake.manifest(mvDir, Lake.latestVersion(mvDir))
      .txns.getOrElse(DistinctTxnApp, 0L)
    val derived = kv.keys.filter(_.matches("der\\d+")).toSeq.sortBy(_.drop(3).toInt)
      .map { k =>
        val Array(n, hx) = kv(k).split('|')
        n -> hexToStr(hx)
      }
    val dims = kv.keys.filter(_.matches("dim\\d+")).toSeq.sortBy(_.drop(3).toInt)
      .map { k =>
        val Array(dd, fk, dk) = kv(k).split('|')
        (dd, fk, dk)
      }
    val d = DistinctDef(kv("source"), mvDir, kv("group").split(",").toSeq,
      kv("dcol"), math.max(sidecarVersion, txnVersion), derived, dims)
    if (txnVersion > sidecarVersion) writeDistinctSidecar(d)
    registerDistinct(d)
    d
  }

  private def writeDistinctSidecar(d: DistinctDef): Unit = {
    val p = java.nio.file.Paths.get(d.mvDir, "_mvd")
    val tmp = java.nio.file.Paths.get(d.mvDir, "_mvd.tmp")
    val derLines = d.derived.zipWithIndex.map { case ((n, e), i) =>
      s"der$i=$n|${strHex(e)}\n"
    }.mkString
    val dimLines = d.dims.zipWithIndex.map { case ((dd, fk, dk), i) =>
      s"dim$i=$dd|$fk|$dk\n"
    }.mkString
    java.nio.file.Files.write(tmp,
      (s"fmt=1\nsource=${d.sourceDir}\n" +
        s"group=${d.groupCols.mkString(",")}\n" +
        s"dcol=${d.distinctCol}\nbuiltVersion=${d.builtVersion}\n" +
        derLines + dimLines)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** The aux rows rolled forward by the source change feed over
    * `(builtVersion, toVersion]` — the signed algebra of
    * [[compensated]] at value grain: an update moves an instance count
    * from its old `(group, value)` row to the new one, a delete
    * decrements, rows reaching zero drop. Shared by the rewrite rule's
    * stale serve (consumed directly) and [[refreshDistinct]] (which
    * commits it). */
  private[graft] def compensatedDistinct(spark: SparkSession, d: DistinctDef,
      toVersion: Long): DataFrame = {
    val keyCols = d.groupCols :+ vNullCol :+ vCol
    val feed0 = withDerived(Lake.changes(spark, d.sourceDir, d.builtVersion,
      toVersion, skipRewriteOnly = true), d.derived)
    val dt = feed0.schema(d.distinctCol).dataType
    val (nullFlag, enc) = encodedVal(col(d.distinctCol), dt)
    val feed = feed0.withColumn(vNullCol, nullFlag).withColumn(vCol, enc)
    val delta = feed
      .withColumn("__sign",
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__sign")).as("__dn"))
    val cur = Lake.read(spark, d.mvDir)
    val synth = MvDef(d.sourceDir, d.mvDir, keyCols, Nil, d.builtVersion)
    rollForward(cur, delta, synth, MinMaxNone, None,
      affectedGroups = feed.select(keyCols.map(col): _*).distinct())
  }

  /** Roll the distinct view forward to the source's current version:
    * one atomic merge commit (changed rows upsert, emptied rows
    * delete) carrying the absorbed source version as a txn marker.
    * O(Δ), never a source re-scan. */
  def refreshDistinct(spark: SparkSession, mvDir: String): DistinctDef = {
    val d = dreg.get(mvDir)
    require(d != null, s"no registered distinct view at $mvDir")
    val v = Lake.latestVersion(d.sourceDir)
    if (v == d.builtVersion) return d
    require(v > d.builtVersion,
      s"source ${d.sourceDir} regressed below distinct-view build")
    val keyCols = d.groupCols :+ vNullCol :+ vCol
    val next = compensatedDistinct(spark, d, v).persist()
    try {
      require(next.filter(d.groupCols.map(col(_).isNull).reduce(_ || _))
          .limit(1).count() == 0L,
        s"refresh of $mvDir: the missed slice introduced NULL group values")
      val cur = Lake.read(spark, d.mvDir)
      val dead = cur.select(keyCols.map(col): _*)
        .except(next.select(keyCols.map(col): _*))
      Lake.merge(spark, d.mvDir, next, dead, targetFiles = 1,
        txn = Some(DistinctTxnApp -> v))
      val nd = d.copy(builtVersion = v)
      writeDistinctSidecar(nd)
      registerDistinct(nd)
      nd
    } finally next.unpersist()
  }
}
