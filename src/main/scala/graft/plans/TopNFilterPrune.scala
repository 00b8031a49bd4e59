package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Descending, IntegerLiteral, NullsFirst}
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

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
    case PhysicalOperation(_, filters, rel: DataSourceV2ScanRelation)
        if filters.nonEmpty && rel.scan.isInstanceOf[graft.sources.LakeScan] =>
      val scan = rel.scan.asInstanceOf[graft.sources.LakeScan]
      s.order.headOption.flatMap(so => so.child match {
        // only a direct scan-output attribute orders soundly against
        // the manifest stats; a computed sort key refuses
        case a: AttributeReference if rel.output.exists(_.exprId == a.exprId) =>
          scan.topNFilterPruned(a.name,
              so.direction == Descending, so.nullOrdering == NullsFirst,
              n, filters)
            .map { pruned =>
              s.copy(child = s.child.transformUp {
                case r: DataSourceV2ScanRelation if r eq rel =>
                  r.copy(scan = pruned)
              })
            }
        case _ => None
      })
    case _ => None
  }
}
