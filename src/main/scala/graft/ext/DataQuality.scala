package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declarative data-quality gate — the pre-training validation pass a
  * production pipeline runs on every landed table (the Deequ/Great
  * Expectations capability re-expressed as one declarative plan):
  * each constraint is a metric computed in a SINGLE pass over the fact
  * table (uniqueness via count vs distinct, completeness via null
  * counts, range and domain via conditional sums) plus one broadcast
  * anti-join for referential integrity against the dimension, then the
  * six metrics pivot into one row per constraint via `stack`. At
  * 100 TB the whole gate costs one scan + one broadcast anti-join —
  * constraints share the pass instead of re-scanning per check (the
  * design point Deequ's analyzer runtime makes; here Catalyst collapses
  * the conditional aggregates into one HashAggregate for free).
  *
  * Output: (check_name, violations, status) — integer violation counts,
  * 'pass' iff zero, mirrored exactly in DuckDB so the gate itself is
  * driver-hash-verified.
  */
object DataQuality {

  def dataQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val metrics = o.agg(
      // count(col) (non-null count) vs n_rows: uniqueness and
      // completeness are SEPARATE constraints. count_distinct drops
      // NULLs, so `n_rows - count_distinct` would book every NULL key
      // as a duplicate; `count(col) - count_distinct(col)` counts only
      // genuine repeats, and the NULL keys surface under their own
      // orderkey_complete check below.
      count(col("o_orderkey")).as("n_key"),
      count_distinct(col("o_orderkey")).as("n_distinct_key"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("null_orderkey"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("nonpos_price"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("bad_status"))
    val orphans = o.select(col("o_custkey"))
      .join(broadcast(c.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_custkey"))
    metrics.crossJoin(broadcast(orphans))
      .select(expr(
        """stack(6,
          |  'custkey_complete', null_custkey,
          |  'custkey_referential', orphan_custkey,
          |  'orderkey_complete', null_orderkey,
          |  'orderkey_unique', n_key - n_distinct_key,
          |  'orderstatus_domain', bad_status,
          |  'totalprice_positive', nonpos_price)
          |AS (check_name, violations)""".stripMargin))
      .withColumn("status", when(col("violations") === 0L, "pass").otherwise("fail"))
      .orderBy(col("check_name"))
  }

  val dataQualitySql: String =
    """WITH m AS (
      |  SELECT CAST(count(o_orderkey) AS BIGINT) AS n_key,
      |    CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_key,
      |    CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 END), 0) AS BIGINT)
      |      AS null_orderkey,
      |    CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 END), 0) AS BIGINT)
      |      AS null_custkey,
      |    CAST(coalesce(sum(CASE WHEN o_totalprice <= 0 THEN 1 END), 0) AS BIGINT)
      |      AS nonpos_price,
      |    CAST(coalesce(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END), 0)
      |      AS BIGINT) AS bad_status
      |  FROM orders),
      |orph AS (
      |  SELECT CAST(count(*) AS BIGINT) AS orphan_custkey
      |  FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      |rows_out AS (
      |  SELECT 'custkey_complete' AS check_name, null_custkey AS violations FROM m
      |  UNION ALL SELECT 'custkey_referential', orphan_custkey FROM orph
      |  UNION ALL SELECT 'orderkey_complete', null_orderkey FROM m
      |  UNION ALL SELECT 'orderkey_unique', n_key - n_distinct_key FROM m
      |  UNION ALL SELECT 'orderstatus_domain', bad_status FROM m
      |  UNION ALL SELECT 'totalprice_positive', nonpos_price FROM m)
      |SELECT check_name, violations,
      |  CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
      |FROM rows_out
      |ORDER BY check_name""".stripMargin

  /** Registered query `x0_k_anon` — K-ANONYMITY audit, the release
    * gate a dataset faces before leaving the pipeline: rows whose
    * quasi-identifier combination (order status × priority × order
    * day) is shared by fewer than k=5 rows are re-identifiable and
    * must be suppressed or generalized. Reported per (status,
    * priority) stratum: group counts, violating-group counts, rows
    * that suppression would remove, and the suppression rate in
    * integer basis points. Two aggregation passes over one scan
    * (QID-group sizes, then the stratum rollup — both map-side
    * combinable, shuffle keyed by the QID then the stratum); no
    * windows, no driver state. At 100 TB this is exactly the shape a
    * privacy sweep runs, and k tightens per release policy. */
  val KAnonThreshold = 5L

  def kAnonymity(spark: SparkSession, sfDir: String): DataFrame = {
    val g = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"),
        to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n"))
    g.groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n") < KAnonThreshold, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("n") < KAnonThreshold, col("n")).otherwise(0L)).as("n_suppressed"),
        sum(col("n")).as("n_rows"))
      .withColumn("suppressed_bp", expr("n_suppressed * 10000L div n_rows"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  val kAnonymitySql: String =
    s"""WITH g AS (
       |  SELECT o_orderstatus, o_orderpriority, CAST(o_orderdate AS DATE) AS d,
       |    count(*) AS n
       |  FROM orders GROUP BY 1, 2, 3)
       |SELECT o_orderstatus, o_orderpriority,
       |  CAST(count(*) AS BIGINT) AS n_groups,
       |  CAST(coalesce(sum(CASE WHEN n < $KAnonThreshold THEN 1 ELSE 0 END), 0) AS BIGINT)
       |    AS n_violating,
       |  CAST(coalesce(sum(CASE WHEN n < $KAnonThreshold THEN n ELSE 0 END), 0) AS BIGINT)
       |    AS n_suppressed,
       |  CAST(sum(n) AS BIGINT) AS n_rows,
       |  CAST(coalesce(sum(CASE WHEN n < $KAnonThreshold THEN n ELSE 0 END), 0) AS BIGINT)
       |    * 10000 // CAST(sum(n) AS BIGINT) AS suppressed_bp
       |FROM g
       |GROUP BY o_orderstatus, o_orderpriority
       |ORDER BY o_orderstatus, o_orderpriority""".stripMargin
}
