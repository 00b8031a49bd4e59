package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, EvalMode}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation,
  DataSourceV2ScanRelation}

import graft.lake.{Lake, MatView}
import graft.sources.LakeTables

/** TRANSPARENT MATERIALIZED-VIEW REWRITE (round 10): an injected
  * optimizer rule that replaces a Σ-maintainable aggregate over a
  * registered [[graft.lake.Lake]] table with a read of its
  * [[MatView]] — the Calcite/warehouse "answer from the rollup"
  * optimization, with freshness decided from the DELTA LOG rather
  * than trust:
  *
  *  - the query's relation pins a snapshot version at load; if the
  *    view was built at exactly that version, the aggregate collapses
  *    to a scan of the view table (itself a lake table: pruned,
  *    stat-skipped, broadcast-estimated like any other);
  *  - if the pinned snapshot is AHEAD of the view, the rule serves
  *    `view ⊕ Σ(changes(built → pinned])` — the change feed's signed
  *    contributions re-aggregated with the stored registers, reading
  *    only the files the missed commits touched. The plan cost is
  *    O(view + Δ), not O(table): at 100 TB this is the difference
  *    between a dashboard query re-scanning a year of facts and one
  *    reading a 25-row rollup plus last night's commits;
  *  - a snapshot BEHIND the view (time travel below the build point)
  *    never rewrites.
  *
  * The matcher is deliberately conservative — rewrite only when
  * provably equivalent, else leave the plan alone: grouping must be
  * bare columns equal (as a set) to the view's declared group
  * columns; aggregates must be `count(*)`/`count(1)` or `sum(col)`
  * over declared sum columns (no DISTINCT, no FILTER clause — and
  * min/max never, they are not maintainable under deletes); residual
  * `Filter`s may reference group columns only (then they commute with
  * the aggregate and transpose onto the view scan); intermediate
  * `Project`s must be pure column pruning. Every alias in the
  * replacement carries the original output's exprId, so parent
  * operators resolve unchanged.
  *
  * Equivalence is driver-gated end to end: the `x8_mv_*` registered
  * queries run WITH the rule active and hash-match DuckDB computing
  * the aggregate from raw data, and MatViewSpec pins both the rewrite
  * (plan reads the view, not the fact files) and every refusal case.
  */
object MatViewRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MatView.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate =>
        tryRewrite(agg).orElse(tryRewriteJoined(agg)).getOrElse(agg)
    }
  }

  /** The relation chain under an aggregate: filters and pure-pruning
    * projects over a single graft-lake V2 relation. */
  private case class Chain(dir: String, version: Long,
      filters: Seq[Expression])

  /** Both placements are supported: injected via
    * `SparkSessionExtensions` the rule runs in the operator batch and
    * sees the pre-pushdown [[DataSourceV2Relation]]; registered at
    * runtime via `GraftSqlShim.addOptimization`
    * (`experimental.extraOptimizations`, for sessions built without
    * the extensions) it runs after V2 pushdown and sees the
    * [[DataSourceV2ScanRelation]] — filters stay visible either way
    * because the lake scan builder keeps every conjunct post-scan. */
  private def peel(p: LogicalPlan): Option[Chain] = p match {
    case r: DataSourceV2Relation =>
      r.table match {
        case LakeTables(dir, version) => Some(Chain(dir, version, Nil))
        case _ => None
      }
    case r: DataSourceV2ScanRelation =>
      r.relation.table match {
        case LakeTables(dir, version) => Some(Chain(dir, version, Nil))
        case _ => None
      }
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      peel(child)
    case Filter(cond, child) =>
      peel(child).map(c => c.copy(filters = cond +: c.filters))
    case _ => None
  }

  /** One leaf of a star join tree: the relation chain plus the
    * RELATION's output attributes (stable exprIds — pure projects
    * above don't mint new ones), used to decide which leaf owns a
    * join-condition attribute. */
  private case class StarLeaf(chain: Chain, out: Seq[Attribute])

  private def peelLeaf(p: LogicalPlan): Option[StarLeaf] = p match {
    case r: DataSourceV2Relation =>
      peel(r).map(c => StarLeaf(c, r.output))
    case r: DataSourceV2ScanRelation =>
      peel(r).map(c => StarLeaf(c, r.output))
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      peelLeaf(child)
    case Filter(cond, child) =>
      peelLeaf(child).map(l =>
        l.copy(chain = l.chain.copy(filters = cond +: l.chain.filters)))
    case _ => None
  }

  /** Flatten the inner-join tree under an aggregate into graft-lake
    * leaves + equality edges + every filter found anywhere in the
    * tree. Each join must be Inner with exactly one
    * `EqualTo(attr, attr)` condition; edges are (leafIdx, keyName,
    * leafIdx, keyName) with key names lowercased. Any non-conforming
    * node refuses. */
  private def flattenStar(p: LogicalPlan): Option[
      (Seq[StarLeaf], Seq[(Int, String, Int, String)], Seq[Expression])] =
    p match {
      case Project(ps, child)
          if ps.forall(_.isInstanceOf[AttributeReference]) =>
        flattenStar(child)
      case Filter(cond, child) =>
        flattenStar(child).map { case (ls, es, fs) => (ls, es, cond +: fs) }
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.Inner =>
        j.condition match {
          case Some(org.apache.spark.sql.catalyst.expressions.EqualTo(
              a: AttributeReference, b: AttributeReference)) =>
            for {
              (ll, le, lf) <- flattenStar(j.left)
              (rl, re0, rf) <- flattenStar(j.right)
              leaves = ll ++ rl
              ownerA <- ownerOf(a, leaves)
              ownerB <- ownerOf(b, leaves)
              if ownerA != ownerB
            } yield {
              val shifted = re0.map { case (i, ka, k, kb) =>
                (i + ll.size, ka, k + ll.size, kb)
              }
              (leaves,
                (ownerA, a.name.toLowerCase, ownerB, b.name.toLowerCase) +:
                  (le ++ shifted),
                lf ++ rf)
            }
          case _ => None
        }
      case other =>
        peelLeaf(other).map(l =>
          (Seq(l.copy(chain = l.chain.copy(filters = Nil))), Nil,
            l.chain.filters))
    }

  private def ownerOf(a: Attribute, leaves: Seq[StarLeaf]): Option[Int] = {
    val owners = leaves.zipWithIndex.collect {
      case (l, i) if l.out.exists(_.exprId == a.exprId) => i
    }
    if (owners.size == 1) Some(owners.head) else None
  }

  /** What one aggregate-list entry asks for, in view-register terms. */
  private sealed trait Ask
  private case class GroupRef(name: String, orig: NamedExpression)
    extends Ask
  private case class CountAll(orig: NamedExpression) extends Ask
  private case class SumOf(name: String, orig: NamedExpression) extends Ask
  private case class AvgOf(name: String, orig: NamedExpression) extends Ask
  private case class MinOf(name: String, orig: NamedExpression) extends Ask
  private case class MaxOf(name: String, orig: NamedExpression) extends Ask

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = for {
    chain <- peel(agg.child)
    d <- MatView.get(chain.dir)
    // time travel below the view's build point: the view is too new
    if chain.version >= d.builtVersion
    groupNames <- groupedOnSubset(agg, d.groupCols)
    // filters may reference ANY declared group column — a filter on a
    // dimension the query rolls AWAY still commutes: it applies to the
    // view rows before the re-aggregation
    declaredNames = d.groupCols.map(_.toLowerCase).toSet
    if chain.filters.forall(f =>
      f.references.forall(a => declaredNames.contains(a.name.toLowerCase)))
    asks <- classify(agg.aggregateExpressions, d, groupNames)
    wantsExtrema = asks.exists {
      case _: MinOf | _: MaxOf => true
      case _ => false
    }
    // stale min/max only when the delta log proves the missed slice
    // insert-only — otherwise a delete may have removed the extremum
    // and only a recompute (a refresh, not a rewrite) can restore it
    if chain.version == d.builtVersion || !wantsExtrema ||
      MatView.appendOnlySlice(chain.dir, d.builtVersion, chain.version)
  } yield build(d, chain.version, chain.filters, groupNames, asks,
    wantsExtrema)

  /** STAR matching (round 10): an aggregate over
    * `factLake ⋈ dim₁ ⋈ … ⋈ dimₙ` (inner joins, one single-equality
    * condition each, every dim joined to the FACT) answered from a
    * [[MatView.defineStar]] view. Same conservatism as the
    * single-table matcher, plus:
    *  - each dimension's pinned version must EQUAL the version the
    *    view was built against (dimension churn invalidates every
    *    register — only a re-define absorbs it);
    *  - `IsNotNull(joinKey)` conjuncts (Catalyst infers them from the
    *    inner equi-joins) are DROPPED rather than transposed: the
    *    joins inside the view build already excluded null keys, so
    *    they are implied — every other filter conjunct must
    *    reference declared group columns, wherever pushdown placed
    *    it (above a join or into any side);
    *  - the query's join GRAPH must equal the declaration: every
    *    declared dim joined to the fact exactly once on the declared
    *    key pair, no extra leaves, no dim-to-dim edges (star, not
    *    snowflake). Join reorder is absorbed by matching leaves
    *    against the registry, not by position. */
  private def tryRewriteJoined(agg: Aggregate): Option[LogicalPlan] = for {
    flat <- flattenStar(agg.child)
    (leaves, edges, filters) = flat
    if leaves.size >= 2 && edges.size == leaves.size - 1
    // candidate fact: the leaf for which (leaf, all other leaves) is
    // a registered star view
    pick <- leaves.zipWithIndex.flatMap { case (f, i) =>
      val dimDirs = leaves.zipWithIndex.collect {
        case (l, j) if j != i => l.chain.dir
      }
      MatView.getStar(f.chain.dir, dimDirs).map(d => (i, d))
    }.headOption
    (factIdx, d) = pick
    fact = leaves(factIdx)
    // every edge must connect the fact to a DISTINCT dim on exactly
    // the declared key pair, and every declared dim must be an edge
    specByDir = d.dims.map(ds => ds.dimDir -> ds).toMap
    dimIdxs = edges.flatMap { case (i, ka, j, kb) =>
      val (dimIdx, factKey, dimKey) =
        if (i == factIdx) (j, ka, kb)
        else if (j == factIdx) (i, kb, ka)
        else (-1, "", "")
      if (dimIdx < 0) None
      else specByDir.get(leaves(dimIdx).chain.dir).flatMap { ds =>
        if (factKey == ds.factKey.toLowerCase &&
          dimKey == ds.dimKey.toLowerCase &&
          leaves(dimIdx).chain.version == ds.dimVersion) Some(dimIdx)
        else None
      }
    }
    if dimIdxs.size == edges.size && dimIdxs.distinct.size == d.dims.size
    if fact.chain.version >= d.builtVersion
    groupNames <- groupedOnSubset(agg, d.groupCols)
    declaredNames = d.groupCols.map(_.toLowerCase).toSet
    keyNames = d.dims.flatMap(ds =>
      Seq(ds.factKey.toLowerCase, ds.dimKey.toLowerCase)).toSet
    kept = filters.flatMap(conjuncts).filterNot {
      case org.apache.spark.sql.catalyst.expressions.IsNotNull(
        a: AttributeReference) => keyNames.contains(a.name.toLowerCase)
      case _ => false
    }
    if kept.forall(f =>
      f.references.forall(a => declaredNames.contains(a.name.toLowerCase)))
    asks <- classify(agg.aggregateExpressions, d, groupNames)
    wantsExtrema = asks.exists {
      case _: MinOf | _: MaxOf => true
      case _ => false
    }
    if fact.chain.version == d.builtVersion || !wantsExtrema ||
      MatView.appendOnlySlice(fact.chain.dir, d.builtVersion,
        fact.chain.version)
  } yield build(d, fact.chain.version, kept, groupNames, asks, wantsExtrema)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case o => Seq(o)
  }

  /** The shared serve path: view scan (fresh) or feed compensation
    * (stale), transposed filters, optional register re-aggregation
    * (partial rollup), and the exprId-preserving output projection. */
  private def build(d: MatView.MvDef, pinnedVersion: Long,
      filters: Seq[Expression], groupNames: Set[String], asks: Seq[Ask],
      wantsExtrema: Boolean): LogicalPlan = {
    val spark = SparkSession.active
    val fresh = pinnedVersion == d.builtVersion
    val declaredNames = d.groupCols.map(_.toLowerCase).toSet
    val base =
      if (fresh) spark.read.format("graft-lake").option("path", d.mvDir).load()
      else MatView.compensated(spark, d, pinnedVersion,
        if (wantsExtrema) MatView.MinMaxFeed else MatView.MinMaxNone)
    val analyzedBase = base.queryExecution.analyzed
    val byBase = analyzedBase.output.map(a => a.name.toLowerCase -> a).toMap
    val transposed = filters.foldLeft(analyzedBase: LogicalPlan) { (p, c) =>
      Filter(c.transform {
        case a: AttributeReference => byBase(a.name.toLowerCase)
      }, p)
    }
    // PARTIAL ROLLUP: grouping by a strict subset of the declaration
    // (including the empty set — the global aggregate) re-aggregates
    // the registers — sum of sums, sum of counts, min of mins, max of
    // maxes; all exact, register algebra is associative. The
    // re-aggregation runs over view-sized rows, never the fact table.
    val exact = groupNames == declaredNames
    val served: LogicalPlan =
      if (exact) transposed
      else {
        import org.apache.spark.sql.functions.{coalesce, lit, max => fmax,
          min => fmin, sum => fsum, col => fcol}
        val fdf = org.apache.spark.sql.GraftSqlShim.ofRows(spark, transposed)
        // a GLOBAL aggregate over zero surviving rows must yield
        // count = 0 (sum/min/max stay NULL, like the direct plan)
        val regAggs = coalesce(fsum(fcol(MatView.countCol)), lit(0L))
          .as(MatView.countCol) +:
          d.sumCols.flatMap { c =>
            fsum(fcol(MatView.sumCol(c))).as(MatView.sumCol(c)) +:
              (if (wantsExtrema)
                Seq(fmin(fcol(MatView.minCol(c))).as(MatView.minCol(c)),
                  fmax(fcol(MatView.maxCol(c))).as(MatView.maxCol(c)))
              else Nil)
          }
        fdf.groupBy(groupNames.toSeq.sorted.map(fcol): _*)
          .agg(regAggs.head, regAggs.tail: _*)
          .queryExecution.analyzed
      }
    val byName = served.output.map(a => a.name.toLowerCase -> a).toMap
    // Substitute a FULLY OPTIMIZED subplan: in the
    // `extraOptimizations` placement this rule runs after
    // `V2ScanRelationPushDown`, so a raw V2 relation injected here
    // would never become a scan — and optimizing the replacement
    // separately also pushes the transposed group-column filters into
    // the view scan's own manifest pruning. Root output exprIds
    // survive optimization, so `byName`'s attributes stay valid.
    val optimized = org.apache.spark.sql.GraftSqlShim
      .ofRows(spark, served).queryExecution.optimizedPlan
    val projections: Seq[NamedExpression] = asks.map {
      case GroupRef(n, orig) =>
        Alias(byName(n), orig.name)(exprId = orig.exprId,
          qualifier = orig.qualifier)
      case CountAll(orig) =>
        Alias(byName(MatView.countCol), orig.name)(exprId = orig.exprId)
      case SumOf(n, orig) =>
        Alias(byName(MatView.sumCol(n)), orig.name)(exprId = orig.exprId)
      case AvgOf(n, orig) =>
        // avg ⊢ sum ⊘ count — Spark's own Average sums integral input
        // in double, and every partial sum of an integral column is an
        // exact double below 2⁵³, so register-sum ÷ register-count is
        // BIT-IDENTICAL to the direct computation (the matcher only
        // admits int/long columns; n > 0 always, so no ÷0 branch)
        Alias(Divide(
          Cast(byName(MatView.sumCol(n)), DoubleType),
          Cast(byName(MatView.countCol), DoubleType),
          EvalMode.LEGACY), orig.name)(exprId = orig.exprId)
      case MinOf(n, orig) =>
        Alias(byName(MatView.minCol(n)), orig.name)(exprId = orig.exprId)
      case MaxOf(n, orig) =>
        Alias(byName(MatView.maxCol(n)), orig.name)(exprId = orig.exprId)
    }
    MatView.lastRewrite.set((d.sourceDir,
      (if (fresh) "direct" else "compensated") +
        (if (exact) "" else "-rollup") +
        (if (d.dims.nonEmpty) "-join" else "")))
    Project(projections, optimized)
  }

  /** The query's group-column names (lowercased) when it groups on
    * bare columns forming a SUBSET of the view's declaration — equal
    * (direct serve), strict subset (partial rollup), or empty (the
    * global aggregate). */
  private def groupedOnSubset(agg: Aggregate,
      declared: Seq[String]): Option[Set[String]] = {
    val names = agg.groupingExpressions.map {
      case a: AttributeReference => Some(a.name.toLowerCase)
      case _ => None
    }
    if (names.forall(_.isDefined) &&
      names.flatten.toSet.subsetOf(declared.map(_.toLowerCase).toSet))
      Some(names.flatten.toSet)
    else None
  }

  /** Classify every output of the aggregate list, or refuse. */
  private def classify(exprs: Seq[NamedExpression], d: MatView.MvDef,
      groupNames: Set[String]): Option[Seq[Ask]] = {
    val sums = d.sumCols.map(_.toLowerCase).toSet
    val asks = exprs.map {
      case a: AttributeReference if groupNames.contains(a.name.toLowerCase) =>
        Some(GroupRef(a.name.toLowerCase, a))
      // an ALIASED group column (`SELECT prio AS p … GROUP BY prio`):
      // the projection carries the alias's name/exprId, the register
      // lookup the underlying column's
      case al @ Alias(a: AttributeReference, _)
          if groupNames.contains(a.name.toLowerCase) =>
        Some(GroupRef(a.name.toLowerCase, al))
      case al @ Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
        fn match {
          case Count(children)
              if children.forall(c =>
                c.foldable && c.isInstanceOf[Literal] &&
                  c.asInstanceOf[Literal].value != null) =>
            Some(CountAll(al))
          case s: Sum => s.child match {
            case a: AttributeReference if sums.contains(a.name.toLowerCase) =>
              Some(SumOf(a.name.toLowerCase, al))
            case _ => None
          }
          case av: Average => av.child match {
            // avg only over INTEGRAL declared columns: the sum⊘count
            // derivation is bit-exact there (double partial sums of
            // integers below 2⁵³ are exact in any order); a fractional
            // column's direct average could differ in the last ulp
            case a: AttributeReference
                if sums.contains(a.name.toLowerCase) &&
                  (a.dataType == LongType || a.dataType == IntegerType) =>
              Some(AvgOf(a.name.toLowerCase, al))
            case _ => None
          }
          // min/max registers exist for every declared column (exact
          // copies of values, order-independent for any type); their
          // STALE eligibility is gated later on the slice being
          // insert-only — a delete could have removed the extremum
          case m: Min => m.child match {
            case a: AttributeReference if sums.contains(a.name.toLowerCase) =>
              Some(MinOf(a.name.toLowerCase, al))
            case _ => None
          }
          case m: Max => m.child match {
            case a: AttributeReference if sums.contains(a.name.toLowerCase) =>
              Some(MaxOf(a.name.toLowerCase, al))
            case _ => None
          }
          case _ => None
        }
      case _ => None
    }
    if (asks.forall(_.isDefined)) Some(asks.flatten) else None
  }
}
