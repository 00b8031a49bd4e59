package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Analytic-function breadth (SURVEY §2b gaps): the full window-function
  * family and the array/higher-order-function family, each as one
  * oracled query.
  *
  * Scale notes:
  *  - the window sweep is ONE shuffle on the partition key (all window
  *    specs share `PARTITION BY o_custkey` and a common sort — Spark
  *    plans a single Window operator run after a single Exchange);
  *  - the array sweep builds per-group arrays via `collect_list` after
  *    a map-side partial aggregate; per-group arrays are line-item
  *    counts per order (≤7) — bounded, no skew risk. The HOF lambdas
  *    (`transform`/`filter`/`aggregate`) run per-row over those tiny
  *    arrays; they are interpreted (no codegen) which is fine off the
  *    hot path — the heavy lifting (grouping) stays codegen'd.
  *
  * Oracle parity: prices through DECIMAL(18,2); rank-family doubles
  * (`percent_rank`, `cume_dist`) are exact integer ratios computed
  * identically by both engines over a tie-free total order.
  */
object FunctionSweeps {

  /** Window-function sweep over orders: offsets (lag/lead), ranking
    * (row_number/ntile/percent_rank/cume_dist), and running frames
    * (cumulative sum, 3-row moving average). */
  def windowFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val cumFrame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val move3 = w.rowsBetween(-2, 0)
    o.select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("long").as("rn"),
        lag(col("price"), 1).over(w).cast("double").as("prev_price"),
        lead(col("price"), 1).over(w).cast("double").as("next_price"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        sum(col("price")).over(cumFrame).cast("double").as("running_total"),
        (sum(col("price")).over(move3).cast("double") /
          count(lit(1)).over(move3)).as("avg3"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val windowFuncsSql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders WHERE o_custkey < 100)
      |SELECT o_custkey, o_orderkey,
      |  CAST(row_number() OVER w AS BIGINT) AS rn,
      |  CAST(lag(price, 1) OVER w AS DOUBLE) AS prev_price,
      |  CAST(lead(price, 1) OVER w AS DOUBLE) AS next_price,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  CAST(SUM(price) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
      |  CAST(SUM(price) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey
      |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / COUNT(*) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey
      |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS avg3
      |FROM o
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Array / higher-order-function sweep: per-order quantity vectors
    * through sort, transform, filter, aggregate, distinct, join and
    * element access — all scalar outputs for oracle hashing. */
  def arrayFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") < 2000)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(col("l_quantity").cast("long"))).as("qtys"))
      .select(
        col("l_orderkey"),
        size(col("qtys")).cast("long").as("n_items"),
        expr("aggregate(qtys, 0L, (acc, x) -> acc + x)").as("total_qty"),
        array_max(col("qtys")).as("max_qty"),
        array_min(col("qtys")).as("min_qty"),
        size(array_distinct(col("qtys"))).cast("long").as("n_distinct_qty"),
        expr("size(filter(qtys, x -> x > 25))").cast("long").as("n_big"),
        expr("aggregate(transform(qtys, x -> x * 2), 0L, (acc, x) -> acc + x)").as("sum_doubled"),
        expr("array_join(transform(qtys, x -> cast(x as string)), ',')").as("qty_str"),
        element_at(col("qtys"), 1).as("first_qty"),
        element_at(col("qtys"), -1).as("last_qty"))
      .orderBy(col("l_orderkey"))

  /** Datetime-function sweep: component extraction, calendar
    * arithmetic, and epoch round-trips. Weekday counting is the one
    * cross-engine trap: Spark's `dayofweek` is 1=Sunday while DuckDB's
    * is 0=Sunday — `weekday` (0=Monday) ↔ `isodow - 1` is the aligned
    * pair used here. Date-typed results exit as ISO strings (the
    * DATE/TIMESTAMP pandas round-trip rule). */
  def datetimeFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_custkey") < 100)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        weekday(col("o_orderdate")).cast("long").as("wd"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        weekofyear(col("o_orderdate")).cast("long").as("week"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
        datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2000"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  val datetimeFuncsSql: String =
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS od,
      |  CAST(isodow(o_orderdate) - 1 AS BIGINT) AS wd,
      |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
      |  CAST(weekofyear(o_orderdate) AS BIGINT) AS week,
      |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
      |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_2000,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders
      |WHERE o_custkey < 100
      |ORDER BY o_orderkey""".stripMargin

  /** Native `pivot()` (cols-from-values): customers per nation ×
    * market segment. The value list is pinned (Spark would otherwise
    * run a distinct-collect job to discover it — an extra pass a
    * 100 TB query shouldn't pay, and unpinned columns make the output
    * schema data-dependent). Complements the conditional-aggregation
    * formulation in [[graft.ext.EventWindows.userTypePivot]]. */
  def pivotSegments(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .pivot("c_mktsegment",
        Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("nationkey"))

  val pivotSegmentsSql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
      |  CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS "AUTOMOBILE",
      |  CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS "BUILDING",
      |  CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS "FURNITURE",
      |  CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS BIGINT) AS "HOUSEHOLD",
      |  CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS "MACHINERY"
      |FROM customer
      |GROUP BY c_nationkey
      |ORDER BY nationkey""".stripMargin

  /** The SQL front door: the identical ANSI text runs through
    * `spark.sql` over a temp view AND through DuckDB as its own
    * oracle — one string, two engines, hash-equal. Exercises the SQL
    * parser path (CTE + windowed rank over an aggregate) that every
    * DataFrame query here bypasses. */
  def sqlApi(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_orders_sql")
    spark.sql(sqlApiText("graft_orders_sql"))
  }

  private def sqlApiText(table: String): String =
    s"""WITH s AS (
       |  SELECT o_orderstatus, o_orderpriority,
       |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
       |  FROM $table)
       |SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       |  CAST(SUM(p) AS DOUBLE) AS total,
       |  CAST(rank() OVER (PARTITION BY o_orderstatus
       |    ORDER BY count(*) DESC, o_orderpriority) AS BIGINT) AS rk
       |FROM s
       |GROUP BY o_orderstatus, o_orderpriority
       |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  val sqlApiSql: String = sqlApiText("orders")

  /** LATERAL correlated subquery — a planner path none of the other
    * queries touch (Catalyst decorrelates the per-row dependent
    * subquery into a join; DuckDB executes the same ANSI text as a
    * lateral join). Per customer: their single most expensive order
    * (price desc, key asc tiebreak). Restricted to one segment so the
    * output stays result-set-sized. */
  def lateralTopOrder(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_orders_lat")
    Tables.customer(spark, sfDir).createOrReplaceTempView("graft_customer_lat")
    spark.sql(lateralText("graft_customer_lat", "graft_orders_lat"))
  }

  private def lateralText(customer: String, orders: String): String =
    s"""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
       |FROM $customer c, LATERAL (
       |  SELECT o_orderkey, o_totalprice
       |  FROM $orders
       |  WHERE o_custkey = c.c_custkey
       |  ORDER BY o_totalprice DESC, o_orderkey
       |  LIMIT 1) o
       |WHERE c.c_mktsegment = 'MACHINERY'
       |ORDER BY c.c_custkey""".stripMargin

  val lateralTopOrderSql: String = lateralText("customer", "orders")

  /** Map-function sweep: per-order linenumber→quantity maps through
    * construction (`map_from_entries` over sorted entries — insertion
    * order is the iteration order in BOTH engines, which is what makes
    * the JSON rendering comparable), cardinality, key/value access,
    * and a `to_json` round-trip for oracle hashing (map columns
    * themselves don't hash portably through parquet/pandas). */
  def mapFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") < 2000)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(
        col("l_linenumber").cast("long").as("k"),
        col("l_quantity").cast("long").as("v")))).as("es"))
      // key on the 1-based sorted-entry index, not the line number —
      // the synthetic lineitem repeats linenumbers within an order and
      // duplicate map keys are an error under Spark's default policy
      .select(col("l_orderkey"), map_from_arrays(
        sequence(lit(1L), size(col("es")).cast("long")),
        expr("transform(es, e -> e.v)")).as("mp"))
      .select(
        col("l_orderkey"),
        to_json(col("mp")).as("qty_map_json"),
        size(col("mp")).cast("long").as("n_entries"),
        expr("array_join(transform(map_keys(mp), x -> cast(x as string)), ',')")
          .as("keys_str"),
        expr("array_join(transform(map_values(mp), x -> cast(x as string)), ',')")
          .as("vals_str"))
      .orderBy(col("l_orderkey"))

  val mapFuncsSql: String =
    """WITH g AS (
      |  SELECT l_orderkey,
      |    list_sort(list(struct_pack(
      |      k := CAST(l_linenumber AS BIGINT),
      |      v := CAST(l_quantity AS BIGINT)))) AS es
      |  FROM lineitem WHERE l_orderkey < 2000
      |  GROUP BY l_orderkey),
      |m AS (SELECT l_orderkey, map(
      |  list_transform(range(1, len(es) + 1), x -> CAST(x AS BIGINT)),
      |  list_transform(es, e -> e.v)) AS mp FROM g)
      |SELECT l_orderkey,
      |  CAST(to_json(mp) AS VARCHAR) AS qty_map_json,
      |  CAST(cardinality(mp) AS BIGINT) AS n_entries,
      |  array_to_string(list_transform(map_keys(mp), x -> CAST(x AS VARCHAR)), ',') AS keys_str,
      |  array_to_string(list_transform(map_values(mp), x -> CAST(x AS VARCHAR)), ',') AS vals_str
      |FROM m
      |ORDER BY l_orderkey""".stripMargin

  /** Bitwise aggregate sweep: `bit_and`/`bit_or`/`bit_xor` per group
    * plus scalar shifts — set-membership folds over integer masks
    * (e.g. per-partition feature-flag reconciliation) that aggregate
    * exactly and map-side-combine like any sum. */
  def bitwiseFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") < 2000)
      .select(col("l_orderkey"),
        col("l_quantity").cast("long").as("qty"),
        col("l_partkey").cast("long").as("pk"))
      .groupBy(col("l_orderkey"))
      .agg(
        bit_and(col("qty")).as("and_qty"),
        bit_or(col("qty")).as("or_qty"),
        bit_xor(col("qty")).as("xor_qty"),
        // the Scala shiftleft() helper takes a literal shift only —
        // the SQL form accepts a column expression
        bit_or(expr("shiftleft(1L, cast(pk % 16 as int))")).as("pk_mask"))
      .select(col("l_orderkey"), col("and_qty"), col("or_qty"), col("xor_qty"),
        col("pk_mask"),
        bit_count(col("pk_mask")).cast("long").as("n_pk_slots"))
      .orderBy(col("l_orderkey"))

  val bitwiseFuncsSql: String =
    """SELECT l_orderkey,
      |  CAST(bit_and(CAST(l_quantity AS BIGINT)) AS BIGINT) AS and_qty,
      |  CAST(bit_or(CAST(l_quantity AS BIGINT)) AS BIGINT) AS or_qty,
      |  CAST(bit_xor(CAST(l_quantity AS BIGINT)) AS BIGINT) AS xor_qty,
      |  CAST(bit_or(1::BIGINT << CAST(CAST(l_partkey AS BIGINT) % 16 AS INT)) AS BIGINT) AS pk_mask,
      |  CAST(bit_count(bit_or(1::BIGINT << CAST(CAST(l_partkey AS BIGINT) % 16 AS INT))) AS BIGINT) AS n_pk_slots
      |FROM lineitem
      |WHERE l_orderkey < 2000
      |GROUP BY l_orderkey
      |ORDER BY l_orderkey""".stripMargin

  /** Statistical moments made oracle-exact: the built-in
    * `stddev`/`variance`/`corr` accumulate doubles in partition order
    * (Welford merges — low bits differ run to run and engine to
    * engine), so instead the moments are assembled from EXACT integer
    * power sums over cent-quantized values: var = (n·Σx² − (Σx)²) /
    * n², corr numerator/denominator likewise. Every division and sqrt
    * then runs on identical integers → identical doubles. Same
    * map-side-combinable shape as any sum — and the only formulation
    * that can ever be hash-verified across engines. */
  def statsMoments(spark: SparkSession, sfDir: String): DataFrame = {
    // round-then-cast (Spark's double→long cast TRUNCATES while
    // DuckDB's rounds — round() first makes them agree), and power
    // sums in decimal(38,0) (↔ DuckDB HUGEINT): Σp² at cents scale
    // overflows BIGINT beyond ~15k rows per group under ANSI mode
    val p = round(col("o_totalprice") * 100).cast("decimal(18,0)")
    Tables.orders(spark, sfDir)
      .select((col("o_custkey") % 10).as("custmod"), p.as("p"),
        col("o_custkey").cast("decimal(18,0)").as("ck"))
      .groupBy(col("custmod"))
      .agg(count(lit(1)).as("n"),
        sum(col("p")).as("s1"),
        sum(col("p") * col("p")).as("s2"),
        sum(col("ck")).as("k1"),
        sum(col("ck") * col("ck")).as("k2"),
        sum(col("p") * col("ck")).as("pk"))
      .select(col("custmod").cast("long").as("custmod"), col("n"),
        (col("s1").cast("double") / col("n")).as("mean_cents"),
        ((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
          (col("n") * col("n")).cast("double")).as("var_cents"),
        sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
          (col("n") * col("n")).cast("double")).as("stddev_cents"),
        ((col("n") * col("pk") - col("s1") * col("k1")).cast("double") /
          (sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast("double")) *
            sqrt((col("n") * col("k2") - col("k1") * col("k1")).cast("double"))))
          .as("corr_price_cust"))
      .orderBy(col("custmod"))
  }

  val statsMomentsSql: String =
    """WITH q AS (
      |  SELECT o_custkey % 10 AS custmod,
      |    CAST(round(o_totalprice * 100) AS HUGEINT) AS p,
      |    CAST(o_custkey AS HUGEINT) AS ck
      |  FROM orders),
      |m AS (
      |  SELECT custmod, count(*) AS n,
      |    SUM(p) AS s1, SUM(p * p) AS s2,
      |    SUM(ck) AS k1, SUM(ck * ck) AS k2,
      |    SUM(p * ck) AS pk
      |  FROM q GROUP BY custmod)
      |SELECT CAST(custmod AS BIGINT) AS custmod, n,
      |  CAST(s1 AS DOUBLE) / n AS mean_cents,
      |  CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE) AS var_cents,
      |  sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE)) AS stddev_cents,
      |  CAST(n * pk - s1 * k1 AS DOUBLE)
      |    / (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) * sqrt(CAST(n * k2 - k1 * k1 AS DOUBLE)))
      |    AS corr_price_cust
      |FROM m
      |ORDER BY custmod""".stripMargin

  /** Safe-arithmetic sweep: `try_divide` / `try_cast` /
    * `try_element_at` — NULL-on-error semantics that keep bad rows
    * from killing a 100 TB job under ANSI mode (the alternative —
    * task retries on SparkArithmeticException — loses the whole
    * partition's work). Oracle mirrors with NULLIF / TRY_CAST /
    * native out-of-bounds list access. */
  def tryFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") < 2000)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice").as("price"),
        array(col("l_returnflag")).as("flags"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // division by zero whenever qty == 17 → NULL, not an error.
        // double ÷ long promotes to IEEE double division — identical
        // bits in both engines (decimal ÷ int would NOT be: the two
        // engines scale/round decimal quotients differently).
        expr("try_divide(price, qty - 17)").as("safe_div"),
        // non-numeric string → NULL
        expr("try_cast(concat('x', qty) as bigint)").as("bad_parse"),
        expr("try_cast(qty as string)").as("qty_str"),
        // index past the end → NULL
        expr("try_element_at(flags, 5)").as("oob_elem"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val tryFuncsSql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |  l_extendedprice / NULLIF(CAST(l_quantity AS BIGINT) - 17, 0) AS safe_div,
      |  TRY_CAST('x' || CAST(l_quantity AS BIGINT) AS BIGINT) AS bad_parse,
      |  CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS qty_str,
      |  ([l_returnflag])[5] AS oob_elem
      |FROM lineitem
      |WHERE l_orderkey < 2000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Registered query `x7_range_frames` — VALUE-based (RANGE) window
    * frames, the window mode [[windowFuncs]]'s ROWS sweep doesn't
    * cover: per customer, each order sees the revenue and order count
    * of the trailing 90-day window ending at its own order day
    * (`RANGE BETWEEN 90 PRECEDING AND CURRENT ROW` over an integer day
    * offset). RANGE frames are peer-inclusive — same-day orders share
    * one frame regardless of their order within the partition — so the
    * result is deterministic under shuffle reordering by construction,
    * and the revenue is integer cents. One shuffle on the partition
    * key; frames are evaluated by Spark's sliding WindowExec in a
    * single pass over each sorted partition. */
  def rangeFrames(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("d"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      .rangeBetween(-90, 0)
    o.select(col("o_custkey"), col("o_orderkey"), col("d").as("order_day"),
        sum(col("cents")).over(w).as("trail90_cents"),
        count(lit(1)).over(w).as("trail90_orders"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val rangeFramesSql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders WHERE o_custkey < 200)
      |SELECT o_custkey, o_orderkey, d AS order_day,
      |  CAST(sum(cents) OVER w AS BIGINT) AS trail90_cents,
      |  CAST(count(*) OVER w AS BIGINT) AS trail90_orders
      |FROM o
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY d
      |  RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Fixed-grid histogram: 20 equi-width buckets of `o_totalprice`
    * over the observed [min, max]. The bucket id is computed in
    * integer CENTS (`((c - mn) * 20) div (mx - mn + 1)`) — the
    * 2-decimal testdata doubles are exact as DECIMAL(18,2)·100, so
    * bucketing is pure integer arithmetic with no FP-boundary risk on
    * either engine. The bounds are a 1-row aggregate broadcast against
    * the scan (one extra pass over a single column); per-bucket stats
    * come from one hash aggregate on the bucket id. Two narrow passes
    * and one 20-key shuffle — histogram at 100 TB is scan-bound, as it
    * should be. */
  def histogram(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = Tables.orders(spark, sfDir)
      .select((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").as("c"))
    val bounds = cents.agg(min(col("c")).as("mn"), max(col("c")).as("mx"))
    cents.crossJoin(broadcast(bounds))
      .select(expr("((c - mn) * 20) div (mx - mn + 1)").as("bucket"), col("c"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        (min(col("c")).cast("double") / 100.0).as("min_price"),
        (max(col("c")).cast("double") / 100.0).as("max_price"),
        (sum(col("c")).cast("double") / 100.0).as("sum_price"))
      .orderBy(col("bucket"))
  }

  val histogramSql: String =
    """WITH cents AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM orders),
      |bounds AS (SELECT min(c) AS mn, max(c) AS mx FROM cents)
      |SELECT ((c - mn) * 20) // (mx - mn + 1) AS bucket,
      |  count(*) AS n_orders,
      |  CAST(min(c) AS DOUBLE) / 100.0 AS min_price,
      |  CAST(max(c) AS DOUBLE) / 100.0 AS max_price,
      |  CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / 100.0 AS sum_price
      |FROM cents, bounds
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  val arrayFuncsSql: String =
    """WITH g AS (
      |  SELECT l_orderkey,
      |    list_sort(list(CAST(l_quantity AS BIGINT))) AS qtys
      |  FROM lineitem WHERE l_orderkey < 2000
      |  GROUP BY l_orderkey)
      |SELECT l_orderkey,
      |  CAST(len(qtys) AS BIGINT) AS n_items,
      |  CAST(list_sum(qtys) AS BIGINT) AS total_qty,
      |  CAST(list_max(qtys) AS BIGINT) AS max_qty,
      |  CAST(list_min(qtys) AS BIGINT) AS min_qty,
      |  CAST(len(list_distinct(qtys)) AS BIGINT) AS n_distinct_qty,
      |  CAST(len(list_filter(qtys, x -> x > 25)) AS BIGINT) AS n_big,
      |  CAST(list_sum(list_transform(qtys, x -> x * 2)) AS BIGINT) AS sum_doubled,
      |  array_to_string(qtys, ',') AS qty_str,
      |  qtys[1] AS first_qty,
      |  qtys[-1] AS last_qty
      |FROM g
      |ORDER BY l_orderkey""".stripMargin

  /** Registered query `x7_variant` — Spark 4's VARIANT type over the
    * events JSON props: `parse_json` into open-schema variant values,
    * typed extraction with `variant_get`, schema introspection with
    * `schema_of_variant`, and the canonical `to_json` rendering — the
    * semi-structured path a lake of heterogenous JSON takes before
    * columns are promoted. VARIANT's binary encoding replaces
    * re-parsing the JSON text per access at scale; here every derived
    * value is integer/string-deterministic so the whole surface is
    * hash-gated (the mirror models the canonical rendering
    * arithmetically — props are single-key integer objects by
    * construction, `TESTDATA.md`). */
  def variantJson(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)
      .select(col("event_type"), expr("parse_json(props)").as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("schema_of_variant(v)").as("sch"),
        expr("to_json(v)").as("js"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        count_distinct(col("sch")).as("n_schemas"),
        min(col("js")).as("min_json"))
      .orderBy(col("event_type"))

  val variantJsonSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  CAST(1 AS BIGINT) AS n_schemas,
      |  min('{"k":' || CAST(k AS VARCHAR) || '}') AS min_json
      |FROM (SELECT event_type,
      |        CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |      FROM events) t
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
}
