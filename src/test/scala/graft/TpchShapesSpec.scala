package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.analytics.TpchShapes

/** The round-10 TPC-H completion sweep (Q2/Q4/Q6/Q9/Q11/Q12/Q13/Q15/
  * Q16/Q20/Q21): plan-shape asserts for the properties the Scaladoc
  * claims (value correctness is the driver's DuckDB hash gate; these
  * pin the SHAPE so a regression can't silently keep the values while
  * losing the plan).
  */
class TpchShapesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("all 22 TPC-H shapes are registered") {
    val qKeys = SparkEntry.queries.keys.filter(_.matches("q\\d+_.*")).toSeq
    val nums = qKeys.map(_.drop(1).takeWhile(_.isDigit).toInt).sorted
    assert(nums === (1 to 22), s"registered TPC-H numbers: $nums")
    // every one carries a DuckDB oracle — none falls back to rows-only
    qKeys.foreach(k => assert(SparkEntry.oracleSql.contains(k), k))
  }

  test("q6 is scan-only: all predicates pushed, no join, no exchange beyond the 1-row agg") {
    val plan = planOf(TpchShapes.revenueForecast(spark, sf))
    assert(!plan.contains("Join"), plan)
    // date + quantity predicates reach the parquet scan
    assert(plan.contains("PushedFilters:"), plan)
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters:")).mkString
    assert(pushed.contains("l_shipdate"), pushed)
    assert(pushed.contains("l_quantity"), pushed)
  }

  test("q13 pre-aggregates orders per custkey BEFORE the customer outer join") {
    val plan = planOf(TpchShapes.custDistribution(spark, sf))
    // the outer join's streamed side is the aggregate output, so the
    // per-custkey HashAggregate must appear below the join node id
    val aggIdx = plan.indexOf("HashAggregate")
    val joinIdx = plan.indexOf("SortMergeJoin") max plan.indexOf("BroadcastHashJoin") max plan.indexOf("ShuffledHashJoin")
    assert(aggIdx >= 0 && joinIdx >= 0, plan)
    // formatted mode prints operators leaves-first inside each
    // WholeStageCodegen block; assert structurally instead: the join's
    // right side must NOT be a raw orders scan (row-per-order), i.e.
    // the plan has an aggregate keyed on o_custkey
    assert(plan.contains("o_custkey"), plan)
    val keyedAgg = plan.linesIterator.exists(l =>
      l.contains("Keys") && l.contains("o_custkey"))
    assert(keyedAgg, plan)
  }

  test("q21 plans with NO gid-Expand: the pre-aggregate replaces countDistinct x2") {
    val df = TpchShapes.waitingSupplier(spark, sf)
    val rows = df.collect()
    val executed = df.queryExecution.executedPlan
    val fin = executed match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // the countDistinct×2 formulation expands every fact row ×2 (gid)
    // before shuffling on a 4-tuple; the per-(order, supplier)
    // pre-aggregate must not
    assert(!fin.toString.contains("Expand"), fin.toString)
    // and the values are sane: every waiting supplier returned ≥1 line
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("numwait")).forall(_ >= 1))
  }

  test("q21 decorrelation matches a literal per-order recount") {
    import spark.implicits._
    val l = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val fkeys = o.filter($"o_orderstatus" === "F").select($"o_orderkey")
      .as[Long].collect().toSet
    val rows = l.select($"l_orderkey", $"l_suppkey", $"l_returnflag")
      .as[(Long, Long, String)].collect()
      .filter(r => fkeys.contains(r._1))
    val byOrder = rows.groupBy(_._1)
    val expected = byOrder.valuesIterator.flatMap { ls =>
      val ns = ls.map(_._2).distinct.size
      val rSupp = ls.filter(_._3 == "R").map(_._2).distinct
      if (ns > 1 && rSupp.size == 1) ls.filter(_._3 == "R").map(_._2)
      else Nil
    }.toSeq.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val got = TpchShapes.waitingSupplier(spark, sf).collect()
      .map(r => (r.getAs[String]("s_name"), r.getAs[Long]("numwait"))).toMap
    val suppName = Tables.supplier(spark, sf)
      .select($"s_suppkey".as[Long], $"s_name".as[String]).collect().toMap
    val expectedByName = expected.map { case (k, n) => (suppName(k), n) }
    assert(got === expectedByName)
  }

  test("q2 min-equality returns ALL tied achievers") {
    // construct the tie check from the query's own output: for every
    // part, all rows carry the same (minimum) balance
    val rows = TpchShapes.minCostSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("p_partkey")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("bal_cents")).distinct.size === 1)
    }
  }
}
