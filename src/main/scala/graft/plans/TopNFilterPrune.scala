package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Descending, Expression, IntegerLiteral, NamedExpression, NullsFirst, TruncDate, TruncTimestamp}
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.types._

/** TopN × filter boundary pruning over graft-lake scans (round 13,
  * VERDICT r12 #3).
  *
  * Catalyst's `V2ScanRelationPushDown` only offers `pushTopN` /
  * `pushLimit` to a scan builder when NO filter remains between the
  * Limit/Sort and the scan — and the lake builder keeps every conjunct
  * as post-scan residue (pruning must never be a correctness gate), so
  * `WHERE … ORDER BY k LIMIT n`, the most common TopN shape in
  * practice, previously opened every filter-surviving file. This rule
  * runs AFTER pushdown (pre-CBO / user-optimizer position), where the
  * built [[graft.sources.LakeScan]] and the residual Filter are both
  * visible, and applies the SAME manifest-stat boundary selection the
  * builder uses for the unfiltered shape — with each file's row count
  * replaced by a sound LOWER BOUND on its filter-qualifying rows
  * ([[graft.sources.LakeScanBuilder.satisfyingRowsLB]]): full non-null
  * rows when every conjunct's window wholly contains the file's stat
  * range, 0 when any conjunct is partial or row-granular for it.
  * Files the filters wholly eliminate are already gone from the scan's
  * entry list, so the kept boundary provably holds ≥ n qualifying rows
  * that sort before (after, DESC) everything outside it.
  *
  * The rewrite swaps ONLY the scan's file list; the residual Filter,
  * Sort and Limit all stay — row-level semantics are untouched, the
  * prune just stops opening files that cannot contribute. Fixed-point
  * safe: a scan already at its boundary reports no shrink and the plan
  * is returned unchanged (the decline/no-gain verdict lands on the
  * scan's description for `.explain` audits — VERDICT r12 #7).
  *
  * At 100 TB: "the newest 100 events since date X" opens the boundary
  * file(s) of the date-clustered layout instead of every file past X. */
object TopNFilterPrune extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case g @ GlobalLimit(IntegerLiteral(n), ll @ LocalLimit(_, s: Sort))
        if s.global =>
      tryPrune(s, n).map(ns => g.copy(child = ll.copy(child = ns)))
        .getOrElse(g)
    case g @ GlobalLimit(IntegerLiteral(n), s: Sort) if s.global =>
      tryPrune(s, n).map(ns => g.copy(child = ns)).getOrElse(g)
    // the ORDER-free sibling: `WHERE … LIMIT n` needs ANY n passing
    // rows — the minimal prefix whose satisfying lower bounds sum to
    // ≥ n suffices, no layout precondition (non-Sort children only:
    // the Sort shapes matched above, and an unmatched non-global Sort
    // falls through tryLimitPrune's extraction harmlessly)
    case g @ GlobalLimit(IntegerLiteral(n), ll @ LocalLimit(_, child)) =>
      tryLimitPrune(child, n).map(nc => g.copy(child = ll.copy(child = nc)))
        .getOrElse(g)
  }

  private def tryLimitPrune(child: LogicalPlan, n: Int): Option[LogicalPlan] =
    child match {
      case PhysicalOperation(_, filters, rel: DataSourceV2ScanRelation)
          if filters.nonEmpty &&
            rel.scan.isInstanceOf[graft.sources.LakeScan] =>
        rel.scan.asInstanceOf[graft.sources.LakeScan]
          .limitFilterPruned(n, filters)
          .map { pruned =>
            child.transformUp {
              case r: DataSourceV2ScanRelation if r eq rel =>
                r.copy(scan = pruned)
            }
          }
      case _ => None
    }

  private def tryPrune(s: Sort, n: Int): Option[Sort] = s.child match {
    case PhysicalOperation(projects, filters, rel: DataSourceV2ScanRelation)
        if filters.nonEmpty && rel.scan.isInstanceOf[graft.sources.LakeScan] =>
      val scan = rel.scan.asInstanceOf[graft.sources.LakeScan]
      s.order.headOption.flatMap { so =>
        sortKeyOf(so.child, projects, rel).flatMap { case (a, injective) =>
          // a non-injective wrapper (date_trunc) collapses distinct
          // keys into ties: rows outside the raw-key boundary can then
          // TIE with boundary rows, and any tie-breaker column could
          // legitimately rank them ahead — refuse unless the wrapper
          // is the ONLY sort key (ties-arbitrary top-n stays valid:
          // every kept boundary row's wrapped key ≥ every pruned
          // row's, so the n chosen from the kept files are a correct
          // top-n multiset)
          if (!injective && s.order.size > 1) None
          else scan.topNFilterPruned(a.name,
              so.direction == Descending, so.nullOrdering == NullsFirst,
              n, filters)
            .map { pruned =>
              s.copy(child = s.child.transformUp {
                case r: DataSourceV2ScanRelation if r eq rel =>
                  r.copy(scan = pruned)
              })
            }
        }
      }
    case _ => None
  }

  /** Resolve a sort-key expression to the SCAN-OUTPUT attribute whose
    * manifest stats order it soundly (round 14, VERDICT r13 #3 —
    * round 13 required a direct `AttributeReference` and declined
    * `SELECT k AS kk … ORDER BY kk`). Returns the underlying
    * attribute and whether the mapping is INJECTIVE (strictly
    * monotone — ties and tie-breaker columns behave exactly as on the
    * raw key):
    *
    *  - aliases chase through the collapsed project list by exprId
    *    (`kk` → `k`), recursively for stacked projects;
    *  - a widening integral cast (byte→short→int→long) is strictly
    *    monotone: injective;
    *  - `trunc(date, fmt)` / `date_trunc(fmt, ts)` with a literal
    *    format are monotone NON-DECREASING but collapse values:
    *    non-injective (both are null-preserving, so the null-ordering
    *    gate transfers to the underlying column unchanged).
    *
    * Anything else — arithmetic, string ops, UDFs — refuses: the
    * manifest's per-file ranges on `k` say nothing about a
    * non-monotone image's ordering. */
  private def sortKeyOf(e: Expression, projects: Seq[NamedExpression],
      rel: DataSourceV2ScanRelation): Option[(AttributeReference, Boolean)] = {
    def chase(x: Expression): Expression = x match {
      case a: AttributeReference =>
        projects.collectFirst {
          case al: Alias if al.exprId == a.exprId => al.child
        } match {
          case Some(inner) => chase(inner)
          case None => a
        }
      case other => other
    }
    def integralRank(dt: DataType): Option[Int] = dt match {
      case ByteType => Some(0)
      case ShortType => Some(1)
      case IntegerType => Some(2)
      case LongType => Some(3)
      case _ => None
    }
    // strictly-monotone, null-preserving casts: integral widening, and
    // the temporal family (date→timestamp; NTZ↔LTZ are bijective on
    // instants under the engine's pinned session zone) — the analyzer
    // inserts the NTZ→LTZ form implicitly under date_trunc
    def monotoneCast(from: DataType, to: DataType): Boolean =
      (integralRank(from), integralRank(to)) match {
        case (Some(f), Some(t)) => t >= f
        case _ => (from, to) match {
          case (DateType, TimestampType | TimestampNTZType) => true
          case (TimestampNTZType, TimestampType) => true
          case (TimestampType, TimestampNTZType) => true
          case _ => false
        }
      }
    def unwrap(x: Expression): Option[(AttributeReference, Boolean)] =
      chase(x) match {
        case a: AttributeReference
            if rel.output.exists(_.exprId == a.exprId) => Some((a, true))
        case c: Cast if monotoneCast(c.child.dataType, c.dataType) =>
          unwrap(c.child)
        case TruncDate(date, fmt) if fmt.foldable =>
          unwrap(date).map { case (a, _) => (a, false) }
        case t: TruncTimestamp if t.format.foldable =>
          unwrap(t.timestamp).map { case (a, _) => (a, false) }
        case _ => None
      }
    unwrap(e)
  }
}
