package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (point-in-time) join — for each right-side event, the most
  * recent left-side event at or before it, per key.
  *
  * Spark has no native as-of join; the preference order (SURVEY.md,
  * build brief) says compose built-ins BEFORE custom plans — and the
  * union + ordered-window + `last(ignoreNulls)` formulation is exactly
  * that composition: one shuffle on the key, one ordered pass, no
  * range cross-join. (A custom SparkPlan would only pay off with
  * pre-sorted bucketed inputs.)
  *
  * Determinism: ordering is (ts, side, tiebreak-id); left rows sort
  * before right rows at equal timestamps, so an exactly-simultaneous
  * left event IS visible to the right event (`asof <=` semantics).
  */
object AsOfJoin {

  /** Generic form: annotate each `right` row with the latest `left`
    * row's `carry` columns as-of its timestamp. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      tiebreak: String, carry: Seq[String]): DataFrame = {
    val lTagged = left.select(
      (Seq(col(key), col(ts), lit(0).as("__side"), col(tiebreak).as("__tb")) ++
        carry.map(c => col(c).as(s"__c_$c"))): _*)
    val rTagged = right.select(
      (Seq(col(key), col(ts), lit(1).as("__side"), col(tiebreak).as("__tb")) ++
        carry.map(c => lit(null).cast(left.schema(c).dataType).as(s"__c_$c"))): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val annotated = lTagged.unionByName(rTagged)
      .select((Seq(col(key), col(ts), col("__side"), col("__tb")) ++
        carry.map(c => last(col(s"__c_$c"), ignoreNulls = true).over(w).as(s"asof_$c"))): _*)
    annotated.filter(col("__side") === 1).drop("__side")
  }

  /** Oracled instance: for every `error` event, the most recent prior
    * (or simultaneous) `click` by the same user. */
  def errorsWithLastClick(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("ts").as("click_ts"), col("value").as("click_value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    asOf(clicks, errors, "user_id", "ts", "event_id", Seq("click_ts", "click_value"))
      .select(col("user_id"), col("__tb").as("event_id"),
        unix_timestamp(col("ts")).as("error_ts"),
        unix_timestamp(col("asof_click_ts")).as("click_ts"),
        col("asof_click_value").as("click_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Point-in-time enrichment against dimension HISTORY (the
    * feature-store correctness pattern): each probe reads the version
    * of its entity that was valid AT its timestamp — never a later one
    * (no feature leakage). Probes are synthesized deterministically
    * from the order log itself (each order's date + 100 days) so every
    * probe lands mid-history. Same one-shuffle union + ordered-window
    * composition as [[asOf]]; versions sort before probes at equal
    * timestamps. */
  def pitEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val versions = orders.select(col("o_custkey"), col("o_orderdate").as("ts"),
      col("o_orderkey"), col("o_orderstatus"),
      col("o_orderkey").as("version_key"))
    val probes = orders.select(col("o_custkey"),
      expr("o_orderdate + INTERVAL 100 DAYS").as("ts"),
      col("o_orderkey"))
    asOf(versions, probes, "o_custkey", "ts", "o_orderkey",
      Seq("o_orderstatus", "version_key"))
      .select(col("o_custkey"), col("__tb").as("probe_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("probe_ts"),
        col("asof_o_orderstatus").as("status_at_probe"),
        col("asof_version_key").as("version_key"))
      .orderBy(col("o_custkey"), col("probe_id"))
  }

  val pitEnrichSql: String =
    """WITH combined AS (
      |  SELECT o_custkey, o_orderdate AS ts, 0 AS side, o_orderkey,
      |    o_orderstatus AS c_status, o_orderkey AS c_vk
      |  FROM orders
      |  UNION ALL
      |  SELECT o_custkey, o_orderdate + INTERVAL 100 DAY AS ts, 1 AS side,
      |    o_orderkey, NULL AS c_status, NULL AS c_vk
      |  FROM orders),
      |annotated AS (
      |  SELECT o_custkey, ts, side, o_orderkey,
      |    last_value(c_status IGNORE NULLS) OVER w AS status_at_probe,
      |    last_value(c_vk IGNORE NULLS) OVER w AS version_key
      |  FROM combined
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY ts, side, o_orderkey
      |               ROWS UNBOUNDED PRECEDING))
      |SELECT o_custkey, o_orderkey AS probe_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS probe_ts,
      |  status_at_probe, version_key
      |FROM annotated
      |WHERE side = 1
      |ORDER BY o_custkey, probe_id""".stripMargin

  val errorsWithLastClickSql: String =
    """WITH combined AS (
      |  SELECT user_id, ts, 0 AS side, event_id, ts AS c_ts, value AS c_val
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, ts, 1 AS side, event_id, NULL AS c_ts, NULL AS c_val
      |  FROM events WHERE event_type = 'error'),
      |annotated AS (
      |  SELECT user_id, ts, side, event_id,
      |    last_value(c_ts IGNORE NULLS) OVER w AS lc_ts,
      |    last_value(c_val IGNORE NULLS) OVER w AS lc_val
      |  FROM combined
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
      |               ROWS UNBOUNDED PRECEDING))
      |SELECT user_id, event_id,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS error_ts,
      |  CAST(floor(epoch(lc_ts)) AS BIGINT) AS click_ts,
      |  lc_val AS click_value
      |FROM annotated
      |WHERE side = 1
      |ORDER BY user_id, event_id""".stripMargin
}
