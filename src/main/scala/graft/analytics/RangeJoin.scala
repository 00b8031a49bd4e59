package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Binned range join — the scale path for interval/point joins.
  *
  * A pure range predicate (`p.t BETWEEN i.lo AND i.hi`) has no equi-key,
  * so Catalyst can only plan it as a BroadcastNestedLoopJoin: every
  * point is compared against every interval — O(N·M) and a guaranteed
  * scale-killer at 100 TB. The classic fix is *binning*: quantize the
  * domain into fixed-width bins, replicate each interval to every bin it
  * overlaps (≤ `len/binWidth + 1` copies — a small constant when the bin
  * width is chosen near the interval length), tag each point with its
  * single bin, and equi-join on the bin id. The range predicate is kept
  * as a residual filter, so the result is exact; the join itself becomes
  * a plain shuffle/broadcast hash join on `_bin` that partitions and
  * scales like any other equi-join. Each point owns exactly one bin, so
  * no pair can match twice — no dedup pass is needed.
  *
  * Engine analogue of the reference's time-window correlation needs
  * (events table, TESTDATA.md); no counterpart in the 463-line reference
  * itself — this is §2c X6 surface.
  */
object RangeJoin {

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** Exact range join of `points` (bigint column `tCol`) into half-open
    * intervals `[loCol, hiCol)` of `intervals`, both in the same integer
    * domain (e.g. epoch seconds). Intervals must be non-empty
    * (`hi > lo`). Output carries all columns of both sides minus the
    * internal bin tag.
    */
  def binnedRangeJoin(
      intervals: DataFrame,
      points: DataFrame,
      loCol: String,
      hiCol: String,
      tCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // interval [lo, hi) overlaps bins lo div w .. (hi-1) div w
    val i = intervals.withColumn("_bin",
      explode(sequence(expr(s"$loCol div $binWidth"), expr(s"($hiCol - 1) div $binWidth"))))
    val p = points.withColumn("_bin", expr(s"$tCol div $binWidth"))
    i.join(p,
        i("_bin") === p("_bin") &&
          p(tCol) >= i(loCol) && p(tCol) < i(hiCol))
      .drop("_bin")
  }

  /** Registered query: for every `error` event, how many `click` events
    * (any user) land in the 10 minutes that follow, and their summed
    * value — a point-in-interval correlation with NO equi-key, run
    * through the binned join (bin width = interval length, so each
    * interval replicates to at most 2 bins). Timestamps are floored to
    * epoch seconds on both engine and oracle sides so the range
    * comparison is integer-exact (the nanos→micros truncation note in
    * [[graft.ext.EventWindows]]).
    */
  def errorClickImpact(spark: SparkSession, sfDir: String): DataFrame = {
    val winSec = 600L
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("t"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("t").as("lo"),
        (col("t") + winSec).as("hi"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("t"), col("value"))
    val impact = binnedRangeJoin(errors, clicks, "lo", "hi", "t", winSec)
      .groupBy(col("err_id"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(dec("value")).cast("double").as("click_value"))
    // left join back so zero-click errors keep a row (the oracle's
    // LEFT JOIN shape); errors is the small side at any scale ratio —
    // but keep it a plain equi-join and let AQE pick the strategy.
    errors.select(col("err_id"))
      .join(impact, Seq("err_id"), "left")
      .select(col("err_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("click_value"), lit(0.0)).as("click_value"))
      .orderBy(col("err_id"))
  }

  /** Exact interval-overlap join of two interval sets `[aLo, aHi)` ×
    * `[bLo, bHi)` (half-open, bigint domain, distinct column names
    * across the two sides). Like [[binnedRangeJoin]] the predicate has
    * no equi-key, so the naive plan is a BroadcastNestedLoopJoin over
    * all pairs; here BOTH sides replicate to every bin they cover and
    * the join becomes an equi-join on the bin id. Because a pair of
    * overlapping intervals shares every bin of its intersection, the
    * pair is emitted only in the FIRST shared bin
    * (`_bin == greatest(aLo, bLo) div w`) — a residual filter instead
    * of a distinct pass, so the output needs no dedup shuffle.
    */
  def binnedOverlapJoin(
      a: DataFrame,
      b: DataFrame,
      aLo: String,
      aHi: String,
      bLo: String,
      bHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(Set(aLo, aHi, bLo, bHi).size == 4,
      "interval column names must be distinct across the two sides")
    val ae = a.withColumn("_bin",
      explode(sequence(expr(s"$aLo div $binWidth"), expr(s"($aHi - 1) div $binWidth"))))
    val be = b.withColumn("_bin",
      explode(sequence(expr(s"$bLo div $binWidth"), expr(s"($bHi - 1) div $binWidth"))))
    ae.join(be,
        ae("_bin") === be("_bin") &&
          ae(aLo) < be(bHi) && be(bLo) < ae(aHi) &&
          ae("_bin") === expr(s"greatest($aLo, $bLo) div $binWidth"))
      .drop("_bin")
  }

  /** Registered query `x6_interval_overlap`: which purchase activity
    * windows ([t, t+5 min)) overlap each error's impact window
    * ([t, t+10 min)), and by how many seconds — an interval×interval
    * correlation with no equi-key, run through [[binnedOverlapJoin]]
    * (bin width = the larger interval length, so each side replicates
    * to ≤ 2 bins). The oracle mirrors the raw theta join, proving the
    * binned plan exact.
    */
  def errorPurchaseOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("t"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("t").as("e_lo"),
        (col("t") + 600L).as("e_hi"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pur_id"), col("t").as("p_lo"),
        (col("t") + 300L).as("p_hi"))
    binnedOverlapJoin(errors, purchases, "e_lo", "e_hi", "p_lo", "p_hi", 600L)
      .select(col("err_id"), col("pur_id"),
        (least(col("e_hi"), col("p_hi")) - greatest(col("e_lo"), col("p_lo")))
          .as("overlap_sec"))
      .orderBy(col("err_id"), col("pur_id"))
  }

  val errorPurchaseOverlapSql: String =
    """WITH ev AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS t
      |  FROM events)
      |SELECT e.event_id AS err_id, p.event_id AS pur_id,
      |  least(e.t + 600, p.t + 300) - greatest(e.t, p.t) AS overlap_sec
      |FROM ev e JOIN ev p
      |  ON e.event_type = 'error' AND p.event_type = 'purchase'
      |  AND e.t < p.t + 300 AND p.t < e.t + 600
      |ORDER BY err_id, pur_id""".stripMargin

  val errorClickImpactSql: String =
    """WITH ev AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS t, value
      |  FROM events)
      |SELECT e.event_id AS err_id,
      |  count(c.t) AS n_clicks,
      |  CAST(COALESCE(SUM(CAST(c.value AS DECIMAL(18,2))), 0) AS DOUBLE) AS click_value
      |FROM ev e
      |LEFT JOIN ev c
      |  ON c.event_type = 'click' AND c.t >= e.t AND c.t < e.t + 600
      |WHERE e.event_type = 'error'
      |GROUP BY e.event_id
      |ORDER BY err_id""".stripMargin

  /** Registered query `x6_range_join_rule`: the SAME correlation as
    * [[errorClickImpact]], but written as the NAIVE range theta-join —
    * no manual binning anywhere in the query. The self-registered
    * [[graft.plans.BinnedRangeJoinRule]] optimizer rule recognizes the
    * constant-window pattern and performs the bin rewrite at plan
    * time, so the user writes the obvious predicate and still gets the
    * hash join (RangeJoinSpec asserts no BroadcastNestedLoopJoin in
    * this query's physical plan). Shares [[errorClickImpactSql]]:
    * the rule must be result-invariant under the driver's hash gate.
    */
  def errorClickImpactAuto(spark: SparkSession, sfDir: String): DataFrame = {
    org.apache.spark.sql.GraftSqlShim.addOptimization(spark, graft.plans.BinnedRangeJoinRule)
    val winSec = 600L
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("t"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("t").as("lo"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("t"), col("value"))
    // the naive predicate — exactly what the rule's scope guards match:
    // t >= lo AND t < lo + <positive long literal>, no equi conjunct
    val impact = clicks.join(errors,
        col("t") >= col("lo") && col("t") < col("lo") + lit(winSec))
      .groupBy(col("err_id"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(dec("value")).cast("double").as("click_value"))
    errors.select(col("err_id"))
      .join(impact, Seq("err_id"), "left")
      .select(col("err_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("click_value"), lit(0.0)).as("click_value"))
      .orderBy(col("err_id"))
  }
}
