package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X6 — event-time windowing over `events` (batch forms; the streaming
  * variants live in [[graft.streaming.EventStream]]).
  *
  * Uses Spark's native `window()` / `session_window()` operators —
  * the same expressions work unchanged under `readStream` with a
  * watermark, which is the point: one query shape for batch backfill
  * and live streams.
  *
  * Oracle parity notes: testdata `ts` is nanosecond parquet which
  * Spark truncates to micros and DuckDB keeps — so window boundaries
  * are emitted as epoch SECONDS and gap comparisons operate at
  * interval scale, where the sub-microsecond difference can't flip a
  * boundary. Value sums go through DECIMAL(18,2).
  */
object EventWindows {

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** Tumbling 1-hour windows per event_type. */
  def tumbling(spark: SparkSession, sfDir: String): DataFrame =
    tumblingOf(Tables.events(spark, sfDir))

  /** The tumbling aggregation over an arbitrary events frame — shared
    * by the batch query above and the driver-oracled streaming path
    * ([[graft.streaming.EventStream.streamedTumbling]]), so the two
    * can never diverge in shape. */
  private[graft] def tumblingOf(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec("value")).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"), col("n_users"))
      .orderBy(col("window_start"), col("event_type"))

  val tumblingSql: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
      |  event_type, count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Sliding 2-hour windows advancing hourly (each event lands in two
    * windows). */
  def sliding(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec("value")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("window_start"))

  val slidingSql: String =
    """SELECT ws AS window_start, count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT unnest([
      |      CAST(epoch(date_trunc('hour', ts)) AS BIGINT) - 3600,
      |      CAST(epoch(date_trunc('hour', ts)) AS BIGINT)]) AS ws,
      |    value
      |  FROM events) t
      |GROUP BY ws
      |ORDER BY ws""".stripMargin

  /** Session windows: 30-minute inactivity gap per user
    * (native `session_window`; DuckDB mirror is the classic
    * lag→flag→cumulative-sum sessionization). */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec("value")).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |numbered AS (
      |  SELECT *, SUM(new_session) OVER (
      |    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id,
      |  CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
      |  count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM numbered
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** JSON property extraction from the `props` column (`{"k": 87}`):
    * engine-side `get_json_object` (Jackson-backed, codegen-friendly) ↔
    * DuckDB `json_extract`. Buckets k into deciles. */
  def jsonProps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("event_type"))
      .withColumn("k_bucket", expr("(k div 10) * 10")) // int division: no engine cast-rounding hazard
      .groupBy(col("k_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("k_bucket"), col("event_type"))

  val jsonPropsSql: String =
    """SELECT (k // 10) * 10 AS k_bucket, event_type,
      |  count(*) AS n, CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
      |FROM (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, event_type
      |      FROM events) t
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Funnel analysis: signup → click → purchase in strict time order
    * per user. Stage timestamps via conditional min-aggregation with
    * window-free sequencing (t₂ = min ts of stage-2 events after t₁),
    * computed in two passes of small per-user aggregates — no
    * event-stream self-join. */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("t"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("t")).as("t_signup"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("t") > col("t_signup"))
      .groupBy(col("user_id"), col("t_signup")).agg(min(col("t")).as("t_click"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("t") > col("t_click"))
      .groupBy(col("user_id"), col("t_signup"), col("t_click")).agg(min(col("t")).as("t_purchase"))
    s1.join(s2.select(col("user_id"), col("t_click")), Seq("user_id"), "left")
      .join(s3.select(col("user_id"), col("t_purchase")), Seq("user_id"), "left")
      .select(col("user_id"), col("t_signup"), col("t_click"), col("t_purchase"),
        (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
          + when(col("t_purchase").isNotNull, 1).otherwise(0)).cast("long").as("stages"))
      .orderBy(col("user_id"))
  }

  val funnelSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
      |s1 AS (SELECT user_id, MIN(t) AS t_signup FROM ev
      |       WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT ev.user_id, MIN(t) AS t_click FROM ev
      |       JOIN s1 USING (user_id)
      |       WHERE event_type = 'click' AND t > t_signup GROUP BY ev.user_id),
      |s3 AS (SELECT ev.user_id, MIN(t) AS t_purchase FROM ev
      |       JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND t > t_click GROUP BY ev.user_id)
      |SELECT s1.user_id, s1.t_signup, s2.t_click, s3.t_purchase,
      |  CAST(1 + CASE WHEN s2.t_click IS NOT NULL THEN 1 ELSE 0 END
      |         + CASE WHEN s3.t_purchase IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stages
      |FROM s1
      |LEFT JOIN s2 ON s1.user_id = s2.user_id
      |LEFT JOIN s3 ON s1.user_id = s3.user_id
      |ORDER BY s1.user_id""".stripMargin

  /** Gap-filled hourly series: signup counts on a dense hour spine
    * covering the whole events range — missing hours appear with
    * zeros (resample/asfreq semantics). The spine derives from one
    * scalar min/max aggregate and explodes to `hours-in-range` rows —
    * calendar-sized, not data-sized, so at 100 TB it broadcasts into
    * the join against the (already aggregated, bucket-sized) counts. */
  def gapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val hourCol = unix_timestamp(date_trunc("hour", col("ts")))
    val spine = ev.agg(min(hourCol).as("lo"), max(hourCol).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(3600L))).as("hour"))
    val counts = ev.filter(col("event_type") === "signup")
      .groupBy(hourCol.as("hour"))
      .agg(count(lit(1)).as("n_signups"),
        sum(dec("value")).as("sv"))
    spine.join(counts, Seq("hour"), "left")
      .select(col("hour"),
        coalesce(col("n_signups"), lit(0L)).as("n_signups"),
        coalesce(col("sv"), lit(0).cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("hour"))
  }

  val gapFillSql: String =
    """WITH b AS (
      |  SELECT CAST(epoch(date_trunc('hour', min(ts))) AS BIGINT) AS lo,
      |    CAST(epoch(date_trunc('hour', max(ts))) AS BIGINT) AS hi
      |  FROM events),
      |spine AS (SELECT unnest(generate_series(lo, hi, 3600)) AS hour FROM b),
      |c AS (
      |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour,
      |    count(*) AS n_signups,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS sv
      |  FROM events WHERE event_type = 'signup'
      |  GROUP BY 1)
      |SELECT spine.hour,
      |  CAST(COALESCE(c.n_signups, 0) AS BIGINT) AS n_signups,
      |  CAST(COALESCE(c.sv, 0) AS DOUBLE) AS sum_value
      |FROM spine LEFT JOIN c USING (hour)
      |ORDER BY hour""".stripMargin

  /** Event-type share pivot per user (conditional aggregation). */
  def userTypePivot(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        types.map(t =>
          sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")): _*)
      .orderBy(col("user_id"))
  }

  val userTypePivotSql: String = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val cols = types.map(t =>
      s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
    s"""SELECT user_id, count(*) AS n_events, ${cols.mkString(", ")}
       |FROM events
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin
  }

  /** Registered query `x6_sequence_detect`: per-user ordered event-type
    * path + regex pattern detection — the batch form of CEP/
    * MATCH_RECOGNIZE ("did signup eventually lead to purchase?",
    * "does an error interrupt a purchase run?"). The path is built
    * with `array_sort(collect_list(struct(t, id, type)))` so ordering
    * is total and engine-independent: micros (both engines floor the
    * nanos parquet ts) then event_id. One shuffle on user_id; the
    * regex gates are per-row on the aggregated path — at corpus scale
    * you'd cap the path length with a slice(), which composes here
    * unchanged. */
  def sequenceDetect(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("t"), col("event_id"),
          col("event_type")).as("e"))
      .groupBy(col("user_id"))
      .agg(array_join(
        expr("transform(array_sort(collect_list(e)), x -> x.event_type)"),
        ">").as("path"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        col("path").rlike("signup(>[a-z]+)*>purchase").as("converted"),
        col("path").rlike("error>error").as("double_error"),
        md5(col("path")).as("path_md5"))
      .orderBy(col("user_id"))

  val sequenceDetectSql: String =
    """WITH p AS (
      |  SELECT user_id,
      |    string_agg(event_type, '>'
      |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS path,
      |    count(*) AS n_events
      |  FROM events
      |  GROUP BY user_id)
      |SELECT user_id, n_events,
      |  regexp_matches(path, 'signup(>[a-z]+)*>purchase') AS converted,
      |  regexp_matches(path, 'error>error') AS double_error,
      |  md5(path) AS path_md5
      |FROM p
      |ORDER BY user_id""".stripMargin

  /** Registered query `x6_nearest_event`: for every click, the nearest
    * error by event time within the same user — BOTH directions (the
    * as-of join is the backward half; "nearest" needs the forward
    * scan too). Composed from one tagged pass: running max of error
    * times up to each row and running min after it, via two window
    * frames over a single user_id shuffle — no join at all, which is
    * the trick worth copying at 100 TB (the naive form is a range
    * self-join). Gaps in exact integer micros. */
  def nearestEvent(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "error"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
    val order = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val before = order.rowsBetween(Window.unboundedPreceding, -1)
    val after = order.rowsBetween(1, Window.unboundedFollowing)
    val errT = when(col("event_type") === "error", col("t"))
    e.withColumn("prev_err", max(errT).over(before))
      .withColumn("next_err", min(errT).over(after))
      .filter(col("event_type") === "click")
      .withColumn("gap_back", col("t") - col("prev_err"))
      .withColumn("gap_fwd", col("next_err") - col("t"))
      .select(col("user_id"), col("event_id"),
        least(col("gap_back"), col("gap_fwd")).as("nearest_gap_us"),
        when(col("gap_back") <= coalesce(col("gap_fwd"), lit(Long.MaxValue)), "backward")
          .when(col("gap_fwd").isNotNull, "forward").as("direction"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val nearestEventSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
      |  FROM events
      |  WHERE event_type IN ('click', 'error')),
      |w AS (
      |  SELECT user_id, event_id, event_type, t,
      |    max(CASE WHEN event_type = 'error' THEN t END) OVER (
      |      PARTITION BY user_id ORDER BY t, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_err,
      |    min(CASE WHEN event_type = 'error' THEN t END) OVER (
      |      PARTITION BY user_id ORDER BY t, event_id
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_err
      |  FROM e)
      |SELECT user_id, event_id,
      |  least(t - prev_err, next_err - t) AS nearest_gap_us,
      |  CASE WHEN (t - prev_err) <= coalesce(next_err - t, 9223372036854775807)
      |       THEN 'backward'
      |       WHEN next_err IS NOT NULL THEN 'forward' END AS direction
      |FROM w
      |WHERE event_type = 'click'
      |ORDER BY user_id, event_id""".stripMargin

  /** Minimum group size before a z-score is meaningful. */
  val AnomalyMinN = 8

  /** Per-(user, event_type) outlier detection, integer-exact: flag
    * events whose value is more than 2 standard deviations from their
    * group mean. The z² > 4 test is cross-multiplied into integer
    * arithmetic at cents scale — (v·n − s)² > 4·(n·q − s²) with
    * s = Σv, q = Σv² — so there is no float division or sqrt anywhere
    * and the oracle matches bit-exactly. The squared terms overflow
    * 64-bit long at group sizes around 3·10⁴ (|v·n − s| passes 3·10⁹
    * well before the docless-long bound suggests), so the PREDICATE is
    * evaluated in decimal(38,0) ↔ DuckDB HUGEINT — exact 128-bit
    * integer comparison on both engines, good to n ≈ 10¹⁴ per group.
    *
    * Scale shape: one shuffle on the group key for the window
    * aggregates, then a codegen'd filter — no self-join, no collect.
    * The same moments could come from a groupBy + re-join; the window
    * form keeps event rows intact for the output. */
  def anomalies(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
    def d(c: Column) = c.cast("decimal(38,0)")
    Tables.events(spark, sfDir)
      .withColumn("cents", (dec("value") * 100).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("cents")).over(w))
      .withColumn("q", sum(col("cents") * col("cents")).over(w))
      .filter(col("n") >= AnomalyMinN &&
        (d(col("cents")) * d(col("n")) - d(col("s"))) *
          (d(col("cents")) * d(col("n")) - d(col("s"))) >
          (d(col("n")) * d(col("q")) - d(col("s")) * d(col("s"))) * lit(4))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("cents"), col("n").as("n_group"))
      .orderBy(col("event_id"))
  }

  val anomaliesSql: String =
    s"""WITH c AS (
       |  SELECT event_id, user_id, event_type,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events),
       |g AS (
       |  SELECT event_id, user_id, event_type, cents,
       |    CAST(count(*) OVER w AS BIGINT) AS n,
       |    CAST(sum(cents) OVER w AS BIGINT) AS s,
       |    CAST(sum(cents * cents) OVER w AS BIGINT) AS q
       |  FROM c WINDOW w AS (PARTITION BY user_id, event_type))
       |SELECT event_id, user_id, event_type, cents, n AS n_group
       |FROM g
       |WHERE n >= $AnomalyMinN
       |  AND (CAST(cents AS HUGEINT) * n - s) * (CAST(cents AS HUGEINT) * n - s)
       |    > 4 * (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
       |ORDER BY event_id""".stripMargin

  /** Cohort retention matrix — users cohorted by first-activity day,
    * activity counted per (cohort, day-offset): the standard
    * product-analytics retention triangle.
    *
    * Scale shape: distinct user-days (one shuffle), per-user min via a
    * window over the SAME user-partitioned shuffle (no separate
    * first-day frame + join — Catalyst would recompute the distinct
    * for each consumer, the ngramJaccard lesson), then one aggregation
    * to the matrix, whose cohort-size denominator is read from the
    * offset-0 cell by a window rather than a second aggregation. Every
    * step is a groupBy/window on bounded keys; nothing touches the
    * driver. */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val userDays = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val withCohort = userDays
      .withColumn("cohort_day", min(col("day")).over(Window.partitionBy(col("user_id"))))
    val matrix = withCohort
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active")) // user-days are distinct ⇒ count = distinct users
    matrix
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0, col("n_active")))
          .over(Window.partitionBy(col("cohort_day"))))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset").cast("long").as("day_offset"),
        col("n_active"), col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size").cast("double")).as("retention"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val cohortRetentionSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
      |wc AS (
      |  SELECT user_id, day,
      |    min(day) OVER (PARTITION BY user_id) AS cohort_day
      |  FROM ud),
      |m AS (
      |  SELECT cohort_day, date_diff('day', cohort_day, day) AS day_offset,
      |    count(*) AS n_active
      |  FROM wc GROUP BY 1, 2)
      |SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
      |  CAST(day_offset AS BIGINT) AS day_offset,
      |  n_active,
      |  max(CASE WHEN day_offset = 0 THEN n_active END)
      |    OVER (PARTITION BY cohort_day) AS cohort_size,
      |  CAST(n_active AS DOUBLE) /
      |    CAST(max(CASE WHEN day_offset = 0 THEN n_active END)
      |      OVER (PARTITION BY cohort_day) AS DOUBLE) AS retention
      |FROM m
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** Events per path prefix considered. */
  val PathLen = 8
  /** Paths reported. */
  val PathTopK = 20

  /** Most common early-journey event paths: each user's first
    * [[PathLen]] events (total order (micros, event_id)) joined into a
    * path string, global frequency count, top [[PathTopK]] by
    * (count desc, path). One user-keyed shuffle for the sequence
    * window, one aggregation on the path string, and a global
    * TakeOrderedAndProject for the top-k — no driver round-trips. */
  def topPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val paths = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= PathLen)
      .groupBy(col("user_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
          _.getField("event_type")), ">").as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(PathTopK)
  }

  val topPathsSql: String =
    s"""WITH seq AS (
       |  SELECT user_id, event_type,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
       |  FROM events),
       |paths AS (
       |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
       |  FROM seq WHERE rn <= $PathLen GROUP BY user_id)
       |SELECT path, count(*) AS n_users
       |FROM paths GROUP BY path
       |ORDER BY n_users DESC, path
       |LIMIT $PathTopK""".stripMargin

  /** RFM (recency / frequency / monetary) customer segmentation — the
    * classic behavioral-analytics rollup: per user, days since last
    * purchase (relative to the corpus max — deterministic, no
    * wall-clock), purchase count, and total spend in cents, each
    * quartile-scored with `ntile(4)` and concatenated to the segment
    * code. One aggregation over purchases, three ntile windows over
    * the (already user-sized) rollup — heavy work is the first
    * shuffle, everything after is per-user-row sized.
    *
    * SPEC-ONLY BASELINE (round 7): the corpus-max window and the
    * three global ntile orderings are UNPARTITIONED — each moves the
    * entire user rollup through one partition, which at 100× users is
    * a single-partition sort ×3. The REGISTERED `x6_rfm` is therefore
    * [[rfmSegmentsScaled]], the distributed-rank formulation that
    * reproduces this output bit-for-bit with no unpartitioned window
    * anywhere (PlanGuardSpec pins both the plan shape and the
    * output equality against this baseline). This naive form stays as
    * the readable semantic definition the scaled plan is tested
    * against.
    *
    * Determinism: ntile order uses (measure, user_id) total orders;
    * recency is integer days from integer micros. */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        (dec("value") * 100).cast("long").as("cents"))
    val agg = p.groupBy(col("user_id")).agg(
      max(col("us")).as("last_us"),
      count(lit(1)).as("frequency"),
      sum(col("cents")).as("monetary_cents"))
    val withRecency = agg
      .withColumn("corpus_max_us", max(col("last_us")).over(Window.partitionBy()))
      .withColumn("recency_days",
        expr("(corpus_max_us - last_us) div 86400000000"))
    val r = ntile(4).over(Window.orderBy(col("recency_days"), col("user_id")))
    val f = ntile(4).over(Window.orderBy(col("frequency").desc, col("user_id")))
    val m = ntile(4).over(Window.orderBy(col("monetary_cents").desc, col("user_id")))
    withRecency
      .withColumn("r_score", r.cast("long"))
      .withColumn("f_score", f.cast("long"))
      .withColumn("m_score", m.cast("long"))
      .select(col("user_id"), col("recency_days"), col("frequency"), col("monetary_cents"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
      .orderBy(col("user_id"))
  }

  val rfmSegmentsSql: String =
    """WITH p AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |agg AS (
      |  SELECT user_id, max(us) AS last_us,
      |    count(*) AS frequency,
      |    CAST(sum(cents) AS BIGINT) AS monetary_cents
      |  FROM p GROUP BY user_id),
      |rec AS (
      |  SELECT user_id, frequency, monetary_cents,
      |    (max(last_us) OVER () - last_us) // 86400000000 AS recency_days
      |  FROM agg),
      |scored AS (
      |  SELECT user_id, recency_days, frequency, monetary_cents,
      |    CAST(ntile(4) OVER (ORDER BY recency_days, user_id) AS BIGINT) AS r_score,
      |    CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS f_score,
      |    CAST(ntile(4) OVER (ORDER BY monetary_cents DESC, user_id) AS BIGINT) AS m_score
      |  FROM rec)
      |SELECT user_id, recency_days, frequency, monetary_cents,
      |  r_score, f_score, m_score,
      |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR)
      |    AS segment
      |FROM scored
      |ORDER BY user_id""".stripMargin

  /** The rfm SCALE PATH — identical output to [[rfmSegments]] (same
    * oracle SQL) with NO unpartitioned window anywhere in the plan
    * (asserted by PlanGuardSpec). The exact-ntile formulation moves
    * the whole user rollup through one partition three times; here
    * exact global ranks are computed distributively, TeraSort-style:
    *
    *  1. melt the three measures to (measure, sort_value) rows with a
    *     sign flip normalizing all three to ascending order;
    *  2. derive 7 range-bucket boundaries per measure with
    *     `percentile_approx` (a tiny mergeable aggregate, broadcast
    *     back). Boundary QUALITY only affects load balance — ranks
    *     stay exact whatever the boundaries, so approximation here is
    *     free;
    *  3. bucket = #boundaries strictly below the value (monotone in
    *     the sort key, ties share a bucket), then `row_number` over
    *     the PARTITIONED window (measure, bucket);
    *  4. per-bucket counts (24 rows) self-join into prefix offsets —
    *     bounded work, no window — and offset + local row number is
    *     the exact global rank;
    *  5. ntile's integer bucket formula applied to the rank
    *     reproduces `ntile(4)` bit-for-bit, and a pivot folds the
    *     three measures back to one row per user.
    *
    * At a billion users every stage is a bounded shuffle or a
    * broadcast of a constant-size frame; nothing single-partitions. */
  def rfmSegmentsScaled(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        (dec("value") * 100).cast("long").as("cents"))
    val agg = p.groupBy(col("user_id")).agg(
      max(col("us")).as("last_us"),
      count(lit(1)).as("frequency"),
      sum(col("cents")).as("monetary_cents"))
    // corpus max + user count as a 1-row broadcast (the exact variant's
    // unpartitioned max-window, made explicit and constant-sized)
    val glob = agg.agg(max(col("last_us")).as("corpus_max_us"),
      count(lit(1)).as("n_users"))
    val melted = agg.crossJoin(broadcast(glob))
      .withColumn("recency_days",
        expr("(corpus_max_us - last_us) div 86400000000"))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("n_users"),
        explode(array(
          struct(lit("r").as("m"), col("recency_days").cast("long").as("sv")),
          struct(lit("f").as("m"), (-col("frequency")).cast("long").as("sv")),
          struct(lit("m").as("m"), (-col("monetary_cents")).cast("long").as("sv")))).as("mv"))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("n_users"),
        col("mv.m").as("m"), col("mv.sv").as("sv"))
    val bounds = melted.groupBy(col("m")).agg(
      percentile_approx(col("sv"),
        array((1 to 7).map(i => lit(i / 8.0)): _*), lit(100)).as("bs"))
    val bucketed = melted.join(broadcast(bounds), Seq("m"))
      .withColumn("bucket",
        expr("aggregate(bs, 0, (acc, bv) -> acc + IF(bv < sv, 1, 0))"))
    val ranked = bucketed.withColumn("lr", row_number().over(
      Window.partitionBy(col("m"), col("bucket")).orderBy(col("sv"), col("user_id"))))
    val cnts = bucketed.groupBy(col("m"), col("bucket")).agg(count(lit(1)).as("c"))
    val offs = cnts.as("a").join(cnts.as("b"),
        col("a.m") === col("b.m") && col("b.bucket") < col("a.bucket"), "left")
      .groupBy(col("a.m").as("m"), col("a.bucket").as("bucket"))
      .agg(coalesce(sum(col("b.c")), lit(0L)).as("off"))
    // ntile(4)'s exact integer rule: the first n%4 buckets carry
    // n/4+1 rows, the rest n/4 (ELSE unreachable when n < 4).
    val scoreExpr = expr(
      """CASE WHEN rk <= (n_users % 4) * (n_users div 4 + 1)
        |  THEN (rk - 1) div (n_users div 4 + 1) + 1
        |  ELSE (n_users % 4) + (rk - (n_users % 4) * (n_users div 4 + 1) - 1)
        |    div (n_users div 4) + 1 END""".stripMargin)
    ranked.join(broadcast(offs), Seq("m", "bucket"))
      .withColumn("rk", col("off") + col("lr"))
      .withColumn("score", scoreExpr.cast("long"))
      .groupBy(col("user_id"), col("recency_days"), col("frequency"), col("monetary_cents"))
      .agg(max(when(col("m") === "r", col("score"))).as("r_score"),
        max(when(col("m") === "f", col("score"))).as("f_score"),
        max(when(col("m") === "m", col("score"))).as("m_score"))
      .select(col("user_id"), col("recency_days"), col("frequency"), col("monetary_cents"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
      .orderBy(col("user_id"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next event type | current) with exact integer counts
    * and a single final division (bit-identical across engines). One
    * user-keyed shuffle for the lag window, one 25-cell aggregation,
    * one row-total window over the 25-row matrix — the heavy work is
    * all in the first shuffle, everything after is constant-sized. */
  def markovTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"), col("row_total"),
        (col("n").cast("double") / col("row_total").cast("double")).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Interval half-width: each event claims [ts, ts + 5 min). */
  val MergeSpanMinutes = 5

  /** Interval merging (gaps-and-islands): each event opens a 5-minute
    * activity interval; overlapping/touching intervals per user merge
    * into islands — the generalized sessionizer, and the same pattern
    * that coalesces validity ranges, IP blocks, or genomic regions.
    *
    * Plan: one user-keyed shuffle; island boundaries from a running
    * `max(end)` window (an interval starts an island iff its start
    * exceeds every previous end), island ids from a running sum of
    * boundary flags, then one aggregation per island. All integer
    * micros — no float time math. */
  def mergeIntervals(spark: SparkSession, sfDir: String): DataFrame = {
    val span = MergeSpanMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("start"), col("event_id"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("start"),
        (unix_micros(col("ts")) + span).as("end"))
      .withColumn("prev_max_end", max(col("end")).over(wPrev))
      .withColumn("new_island",
        (col("prev_max_end").isNull || col("start") > col("prev_max_end")).cast("long"))
      .withColumn("island", sum(col("new_island")).over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("start")).as("island_start"),
        max(col("end")).as("island_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("island"), col("island_start"), col("island_end"),
        (col("island_end") - col("island_start")).as("span_us"), col("n_events"))
      .orderBy(col("user_id"), col("island"))
  }

  val mergeIntervalsSql: String = {
    val span = MergeSpanMinutes * 60L * 1000000L
    s"""WITH iv AS (
       |  SELECT user_id, event_id,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS start,
       |    epoch_us(CAST(ts AS TIMESTAMP)) + $span AS "end"
       |  FROM events),
       |flagged AS (
       |  SELECT user_id, event_id, start, "end",
       |    CASE WHEN max("end") OVER (PARTITION BY user_id ORDER BY start, event_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |           OR start > max("end") OVER (PARTITION BY user_id ORDER BY start, event_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      THEN 1 ELSE 0 END AS new_island
       |  FROM iv),
       |islands AS (
       |  SELECT user_id, start, "end",
       |    CAST(sum(new_island) OVER (PARTITION BY user_id ORDER BY start, event_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
       |  FROM flagged)
       |SELECT user_id, island,
       |  CAST(min(start) AS BIGINT) AS island_start,
       |  CAST(max("end") AS BIGINT) AS island_end,
       |  CAST(max("end") - min(start) AS BIGINT) AS span_us,
       |  count(*) AS n_events
       |FROM islands
       |GROUP BY user_id, island
       |ORDER BY user_id, island""".stripMargin
  }

  val markovTransitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS to_type
      |  FROM events),
      |m AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM seq WHERE to_type IS NOT NULL
      |  GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total,
      |  CAST(n AS DOUBLE) /
      |    CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
      |FROM m
      |ORDER BY from_type, to_type""".stripMargin

  /** Attribution lookback: a purchase credits its last preceding
    * non-purchase touch only if that touch is at most this many
    * microseconds old — older (or absent) → the 'direct' channel. */
  val AttributionWindowUs: Long = 30L * 60 * 1000000

  /** Registered query `x6_attribution`: last-touch revenue attribution —
    * each purchase is credited to the user's most recent preceding
    * non-purchase event type within a 30-minute lookback ('direct' when
    * none), then revenue and purchase counts roll up by channel. The
    * carry-forward is ONE pass over the user-time-ordered stream
    * (`last(..., ignoreNulls)` over an unbounded-preceding row window —
    * no self-join, no per-purchase probe), so the whole query is a
    * single user-keyed shuffle plus a channel-cardinality aggregate:
    * the same shape at 100 TB, with state bounded by the window frame.
    * Value sums go through DECIMAL(18,2) (exact; testdata is 2-dp). */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    // both window columns are declared in ONE select over the SAME
    // pre-projected sort-key attribute (ts_us): re-deriving
    // unix_micros(ts) per withColumn mints fresh expression ids, the
    // window specs stop being provably equal, CollapseWindow can't
    // fire, and the plan pays a second full in-partition sort
    // (observed: two Window+Sort pairs instead of one Window node)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val touchUs = when(col("event_type") =!= "purchase", col("ts_us"))
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .select(col("event_type"), col("value"), col("ts_us"),
        last(touch, ignoreNulls = true).over(w).as("last_touch"),
        last(touchUs, ignoreNulls = true).over(w).as("last_touch_us"))
      .filter(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("last_touch_us").isNotNull &&
            col("ts_us") - col("last_touch_us") <= AttributionWindowUs,
          col("last_touch")).otherwise(lit("direct")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(dec("value")).cast("double").as("revenue"))
      .orderBy(col("channel"))
  }

  val attributionSql: String =
    s"""WITH t AS (
       |  SELECT event_id, ts, user_id, event_type, value,
       |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
       |      OVER w AS last_touch,
       |    last_value(CASE WHEN event_type <> 'purchase'
       |               THEN epoch_us(CAST(ts AS TIMESTAMP)) END IGNORE NULLS)
       |      OVER w AS last_touch_us
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id
       |    ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       |SELECT CASE WHEN last_touch_us IS NOT NULL
       |         AND epoch_us(CAST(ts AS TIMESTAMP)) - last_touch_us <= $AttributionWindowUs
       |       THEN last_touch ELSE 'direct' END AS channel,
       |  count(*) AS n_purchases,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       |FROM t
       |WHERE event_type = 'purchase'
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  /** Registered query `x6_dau_wau` — the engagement dashboard pair:
    * daily active users, trailing-7-day weekly active users, and the
    * DAU/WAU stickiness ratio in integer basis points. The deduped
    * (day, user) frame is built once; WAU materializes the bounded
    * 7-day fan-out EXPLICITLY — each active (day, user) row explodes
    * to the 7 window-end days it contributes to — so membership is a
    * plain hash-aggregate equi-key, never a theta join. (The round-7
    * `days BETWEEN d-6 AND d` formulation planned as a
    * BroadcastNestedLoopJoin that tested every row against EVERY
    * distinct day — O(rows·days); this is O(rows·7) with one shuffle,
    * and PlanGuardSpec pins the absence of the nested loop.) Window
    * ends with no activity on the end day itself are trimmed by the
    * equi-join with the DAU frame, exactly as the old day-domain join
    * did. Day keys leave as ISO strings (the oracle type rule). */
  def dauWau(spark: SparkSession, sfDir: String): DataFrame = {
    val du = graft.Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(expr("sequence(day, date_add(day, 6))")).as("d"),
        col("user_id"))
      .groupBy(col("d")).agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, col("day") === col("d"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"))
      .withColumn("stickiness_bp", expr("dau * 10000L div wau"))
      .orderBy(col("day"))
  }

  val dauWauSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |days AS (SELECT DISTINCT day AS d FROM du),
      |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
      |wau AS (
      |  SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      |  FROM days JOIN du ON du.day BETWEEN d - 6 AND d
      |  GROUP BY d)
      |SELECT strftime(dau.day, '%Y-%m-%d') AS day,
      |  CAST(dau AS BIGINT) AS dau, wau,
      |  CAST(dau AS BIGINT) * 10000 // wau AS stickiness_bp
      |FROM dau JOIN wau ON wau.d = dau.day
      |ORDER BY day""".stripMargin

  /** Registered query `x6_ab_lift` — the experiment-readout shape
    * every event pipeline ultimately serves: users assigned to a
    * deterministic A/B cohort (user-id parity — in production, the
    * salted assignment hash), per-cohort exposure (distinct users),
    * conversion volume (purchases) and revenue, pivoted into one row
    * with per-user conversion rates and the B-vs-A lift in integer
    * basis points. One scan, one cohort-keyed aggregate, a 2-row
    * pivot — scan-bound at any scale. (Significance testing needs
    * floats by nature; the deterministic integer readout here is the
    * input a stats layer consumes.) */
  def abLift(spark: SparkSession, sfDir: String): DataFrame = {
    val e = graft.Tables.events(spark, sfDir)
      .withColumn("cohort", (col("user_id") % 2).cast("long"))
    val per = e.groupBy(col("cohort"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purch"),
        sum(when(col("event_type") === "purchase",
          (col("value").cast("decimal(18,2)") * 100).cast("long"))
          .otherwise(0L)).as("revenue_cents"))
      .withColumn("conv_bp", expr("n_purch * 10000L div n_users"))
    per.agg(
        max(when(col("cohort") === 0, col("n_users"))).as("users_a"),
        max(when(col("cohort") === 1, col("n_users"))).as("users_b"),
        max(when(col("cohort") === 0, col("n_purch"))).as("purch_a"),
        max(when(col("cohort") === 1, col("n_purch"))).as("purch_b"),
        max(when(col("cohort") === 0, col("revenue_cents"))).as("revenue_a_cents"),
        max(when(col("cohort") === 1, col("revenue_cents"))).as("revenue_b_cents"),
        max(when(col("cohort") === 0, col("conv_bp"))).as("conv_a_bp"),
        max(when(col("cohort") === 1, col("conv_bp"))).as("conv_b_bp"))
      .withColumn("lift_bp",
        expr("(conv_b_bp - conv_a_bp) * 10000L div conv_a_bp"))
  }

  val abLiftSql: String =
    """WITH per AS (
      |  SELECT user_id % 2 AS cohort,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT)
      |      AS n_purch,
      |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0) AS BIGINT)
      |      AS revenue_cents
      |  FROM events GROUP BY 1),
      |pp AS (SELECT *, n_purch * 10000 // n_users AS conv_bp FROM per)
      |SELECT
      |  CAST(max(CASE WHEN cohort = 0 THEN n_users END) AS BIGINT) AS users_a,
      |  CAST(max(CASE WHEN cohort = 1 THEN n_users END) AS BIGINT) AS users_b,
      |  CAST(max(CASE WHEN cohort = 0 THEN n_purch END) AS BIGINT) AS purch_a,
      |  CAST(max(CASE WHEN cohort = 1 THEN n_purch END) AS BIGINT) AS purch_b,
      |  CAST(max(CASE WHEN cohort = 0 THEN revenue_cents END) AS BIGINT) AS revenue_a_cents,
      |  CAST(max(CASE WHEN cohort = 1 THEN revenue_cents END) AS BIGINT) AS revenue_b_cents,
      |  CAST(max(CASE WHEN cohort = 0 THEN conv_bp END) AS BIGINT) AS conv_a_bp,
      |  CAST(max(CASE WHEN cohort = 1 THEN conv_bp END) AS BIGINT) AS conv_b_bp,
      |  CAST((max(CASE WHEN cohort = 1 THEN conv_bp END)
      |      - max(CASE WHEN cohort = 0 THEN conv_bp END)) * 10000
      |    // max(CASE WHEN cohort = 0 THEN conv_bp END) AS BIGINT) AS lift_bp
      |FROM pp""".stripMargin
}
