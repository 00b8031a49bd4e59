package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a constant-window range theta-join into the
  * binned equi-join of [[graft.analytics.RangeJoin]] — automatically.
  *
  * A join whose only condition is `t >= s AND t < s + c` (point `t`
  * from one side, interval start `s` from the other, window `c` a
  * positive literal) has no equi-key, so Spark can only plan it as a
  * BroadcastNestedLoopJoin: O(N·M) comparisons, the canonical
  * scale-killer. But the window is CONSTANT, which means the bin
  * transformation is decidable at plan time: tag points with
  * `t div c`, explode each interval to its ≤2 overlapping bins, join
  * on bin equality and keep the original predicate as a residual.
  * ExtractEquiJoinKeys then sees an equality and plans a hash join.
  *
  * Scope guards (deliberately tight — an optimizer rule must never
  * fire on a plan it can't prove):
  *  - inner join, long-typed operands, `c > 0` literal (constant
  *    folding has already run, so `s + 600` IS `Add(s, Literal)`);
  *  - `t` references exactly one side and `s` exactly the other;
  *  - no pre-existing equality conjunct (if one exists the join
  *    already hash-partitions; re-binning would only add work).
  *
  * Registered per-session via `experimental.extraOptimizations` (the
  * public hook that appends to the optimizer's final batch) or at
  * session build through [[graft.functions.GraftExtensions]].
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner, Some(cond), _) if eligible(j, cond) =>
      rewrite(j).getOrElse(j)
  }

  private def eligible(j: Join, cond: Expression): Boolean = {
    val conjuncts = splitConjunctivePredicates(cond)
    // any equality (null-safe included) already gives ExtractEquiJoinKeys
    // a hash-join key — binning would only add work there
    val hasEquiKey = conjuncts.exists {
      case _: EqualTo => true
      case _: EqualNullSafe => true
      case _ => false
    }
    !hasEquiKey && findRangePair(j, conjuncts).isDefined
  }

  /** (t, s, width, residual conjuncts, pointsOnLeft) */
  private case class RangePair(t: Expression, s: Expression, width: Long,
      rest: Seq[Expression], pointsOnLeft: Boolean)

  private def findRangePair(j: Join, conjuncts: Seq[Expression]): Option[RangePair] = {
    def sideOf(e: Expression): Option[Boolean] = { // Some(true)=left, Some(false)=right
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(j.left.outputSet)) Some(true)
      else if (refs.subsetOf(j.right.outputSet)) Some(false)
      else None
    }
    val geq = conjuncts.collect { case g @ GreaterThanOrEqual(t, s)
      if t.dataType == LongType && s.dataType == LongType => g }
    val lt = conjuncts.collect { case l @ LessThan(t, Add(s, Literal(c: Long, LongType), _))
      if t.dataType == LongType && c > 0 => (l, t, s, c) }
    (for {
      g @ GreaterThanOrEqual(t1, s1) <- geq
      (l, t2, s2, c) <- lt
      if t1.semanticEquals(t2) && s1.semanticEquals(s2)
      tSide <- sideOf(t1)
      sSide <- sideOf(s1)
      if tSide != sSide
    } yield RangePair(t1, s1, c,
      conjuncts.filterNot(x => x.semanticEquals(g) || x.semanticEquals(l)),
      pointsOnLeft = tSide)).headOption
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    findRangePair(j, splitConjunctivePredicates(j.condition.get)).map { rp =>
      val c = Literal(rp.width, LongType)
      val (points, intervals) =
        if (rp.pointsOnLeft) (j.left, j.right) else (j.right, j.left)
      // points: one bin per row
      val pBin = AttributeReference("_graft_pbin", LongType, nullable = true)()
      val pProj = Project(points.output :+
        Alias(IntegralDivide(rp.t, c), pBin.name)(pBin.exprId), points)
      // intervals: explode to every overlapped bin (≤ 2 for width-c spans)
      val iBin = AttributeReference("_graft_ibin", LongType, nullable = false)()
      val gen = Generate(
        // Sequence is TimeZoneAwareExpression: `resolved` demands a
        // timeZoneId, which only the analyzer injects — an optimizer
        // rule must supply it itself or the plan flips to unresolved
        Explode(Sequence(
          IntegralDivide(rp.s, c),
          IntegralDivide(Add(Add(rp.s, c), Literal(-1L, LongType)), c),
          Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(iBin), intervals)
      val newCond = (Seq[Expression](EqualTo(pBin, iBin),
        GreaterThanOrEqual(rp.t, rp.s),
        LessThan(rp.t, Add(rp.s, c))) ++ rp.rest).reduce(And)
      val (newLeft, newRight) =
        if (rp.pointsOnLeft) (pProj, gen) else (gen, pProj)
      // restore the original output (drop the bin tags)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}
