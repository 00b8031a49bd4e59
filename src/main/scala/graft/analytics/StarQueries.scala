package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X7/X8 + pricing aggregate — analytics over the TPC-H-ish star schema.
  *
  * Scale notes (the 100 TB design point):
  *  - dimension joins (`region`, `nation`, `supplier`, `customer`) are
  *    explicitly `broadcast()`: fact-side stays shuffle-free;
  *  - aggregations are plain `groupBy` → map-side partial agg + one
  *    shuffle on the group key; AQE coalesces output partitions;
  *  - top-k global uses `orderBy.limit(k)` which Spark plans as
  *    TakeOrderedAndProject (per-partition heap, no full sort);
  *  - top-k per group uses a window `row_number` — one shuffle on the
  *    partition key, no join;
  *  - all double measures go through DECIMAL(18,2)/(9,2) before
  *    aggregation: exact, order-independent, oracle-bit-identical.
  */
object StarQueries {

  private def dec(c: String): Column = col(c).cast("decimal(9,2)")

  /** Q1-style pricing summary over lineitem with a pushed-down date
    * filter. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(9,2)") - dec("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(9,2)") - dec("l_discount"))
          * (lit(1).cast("decimal(9,2)") + dec("l_tax"))).cast("double").as("sum_charge"),
        (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"),
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2))) * (CAST(1 AS DECIMAL(9,2)) + CAST(l_tax AS DECIMAL(9,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Star join: revenue per region/nation via supplier. Dims broadcast. */
  def revenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    l.join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(9,2)") - dec("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"),
      )
      .orderBy(col("r_name"), col("n_name"))
  }

  val revenueByNationSql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Customer enrichment join: order value by market segment × nation. */
  def segmentNationSales(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_mktsegment"), col("n_name"))
      .agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_sales"),
        count(lit(1)).as("n_orders"),
      )
      .orderBy(col("c_mktsegment"), col("n_name"))
  }

  val segmentNationSalesSql: String =
    """SELECT c_mktsegment, n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY c_mktsegment, n_name
      |ORDER BY c_mktsegment, n_name""".stripMargin

  /** Left-semi join: customers having at least one big order (EXISTS). */
  def bigOrderCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val bigOrderCustomersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join: customers with no high-value order (NOT EXISTS). */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 300000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val customersWithoutOrdersSql: String =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Per-group top-k: 3 priciest orders per market segment (window). */
  def topOrdersPerSegment(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk").cast("long").as("rk"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_mktsegment"), col("rk"))
  }

  val topOrdersPerSegmentSql: String =
    """SELECT c_mktsegment, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders JOIN customer ON o_custkey = c_custkey) t
      |WHERE rk <= 3
      |ORDER BY c_mktsegment, rk""".stripMargin

  /** TPC-H Q3-shaped composite: selective dimension filter → two joins
    * → grouped revenue → global top-10. The canonical "one query uses
    * everything" plan: pushed-down date predicates on both fact scans,
    * broadcast customer dim, partial aggregation before the group-key
    * shuffle, and TakeOrderedAndProject for the limit (no global
    * sort). Dates exit as ISO strings for oracle parity. */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cut = lit("1996-06-01").cast("timestamp")
    val c = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, sfDir).filter(col("o_orderdate") < cut)
    val l = Tables.lineitem(spark, sfDir).filter(col("l_shipdate") > cut)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(9,2)") - dec("l_discount")))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val shippingPrioritySql: String =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  o_orderpriority
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Registered query `q5_local_supplier` (TPC-H Q5 shape): revenue
    * by nation for orders where the CUSTOMER's nation equals the
    * SUPPLIER's nation inside one region and year — the canonical
    * 6-table star composite. Scale shape: the fact chain
    * (lineitem ⋈ orders) is the only shuffle join; customer,
    * supplier, nation, region all broadcast, and the
    * same-nation predicate rides the supplier join condition so no
    * post-join filter materializes mismatched rows. Region filter
    * prunes the nation/customer/supplier broadcasts BEFORE they ship. */
  def localSupplierVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val region = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, sfDir)
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = Tables.customer(spark, sfDir)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val s = Tables.supplier(spark, sfDir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val l = Tables.lineitem(spark, sfDir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(9,2)") - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val localSupplierVolumeSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Registered query `q10_returned_items` (TPC-H Q10 shape): revenue
    * lost to returned lineitems per customer in one quarter, top 20 —
    * the classic "angriest customers" composite. Scale shape: the
    * return-flag and date filters reach both fact scans as pushed
    * predicates BEFORE the lineitem ⋈ orders shuffle join; customer
    * and nation broadcast; top-20 is `orderBy.limit` =
    * TakeOrderedAndProject, not a global sort. */
  def returnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    val n = Tables.nation(spark, sfDir).select(col("n_nationkey"), col("n_name"))
    val c = Tables.customer(spark, sfDir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"), col("n_name"))
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val l = Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"), col("n_name"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(9,2)") - dec("l_discount")))
        .cast("double").as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        dec("c_acctbal").cast("double").as("c_acctbal"),
        col("n_name"), col("c_mktsegment"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val returnedItemsSql: String =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue,
      |  CAST(CAST(c_acctbal AS DECIMAL(9,2)) AS DOUBLE) AS c_acctbal,
      |  n_name, c_mktsegment
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Registered query `q18_large_orders` (TPC-H Q18 shape): orders
    * whose total lineitem quantity clears a threshold, joined back to
    * customer — the "find the whales" composite: a grouped HAVING
    * filter used as a semi-join input, then enrichment joins and a
    * deterministic top-100. Plan shape at scale: one lineitem
    * aggregate shuffle on orderkey (partial agg first), the HAVING
    * output is tiny so both subsequent joins broadcast it. */
  def largeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > lit(300).cast("decimal(9,2)"))
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    o.join(broadcast(big), o("o_orderkey") === big("l_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        dec("o_totalprice").cast("double").as("o_totalprice"),
        col("total_qty").cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val largeOrdersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(9,2))) AS total_qty
      |  FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(9,2))) > 300)
      |SELECT c_name, c_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  CAST(CAST(o_totalprice AS DECIMAL(9,2)) AS DOUBLE) AS o_totalprice,
      |  CAST(total_qty AS DOUBLE) AS total_qty
      |FROM orders
      |JOIN big ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  // ---- round-10 TPC-H composite shapes ----------------------------------
  // (adapted to the driver testdata's columns: lineitem has no
  // shipmode/commitdate, so Q4/Q12/Q21 aren't expressible; Q7/Q8/Q14/
  // Q17/Q19 are, against p_type/p_brand/p_size/l_shipdate/l_quantity.)

  /** Registered query `q7_nation_volume` (TPC-H Q7 shape): shipping
    * volume between two nations, both directions, by year. The
    * nation-PAIR disjunction rides the broadcast join conditions —
    * supplier and customer each pre-join their (two-row) nation
    * filter, so the fact chain (lineitem ⋈ orders, the only shuffle)
    * never materializes a row outside the pair. */
  def nationVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val n = Tables.nation(spark, sfDir).filter(col("n_name").isin(pair: _*))
    val s = Tables.supplier(spark, sfDir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val c = Tables.customer(spark, sfDir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val o = Tables.orders(spark, sfDir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey") &&
        col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(9,2)") - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val nationVolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      |  AND n2.n_name IN ('NATION_1', 'NATION_2')
      |  AND n1.n_name <> n2.n_name
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Registered query `q8_market_share` (TPC-H Q8 shape): one
    * nation's share of a region's market for one part type, by order
    * year — the 7-table composite whose share-of-total is a
    * conditional aggregate over ONE pass (no self-join): numerator
    * and denominator ride the same grouped sum. Part is the selective
    * dimension (1/6 of keys) and broadcasts into the fact before the
    * orders join, so the fact chain is pre-thinned. */
  def marketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir).filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val region = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val custNation = Tables.nation(spark, sfDir)
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val c = Tables.customer(spark, sfDir)
      .join(broadcast(custNation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val s = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val vol = dec("l_extendedprice") *
      (lit(1).cast("decimal(9,2)") - dec("l_discount"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      // decimal sums are exact; the DIVISION happens in double on both
      // engines (decimal÷decimal result scale differs between them)
      .agg((sum(when(col("supp_nation") === "NATION_3", vol)
        .otherwise(lit(0).cast("decimal(9,2)"))).cast("double") /
        sum(vol).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val marketShareSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
      |      THEN CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))
      |      ELSE CAST(0 AS DECIMAL(9,2)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE)
      |  AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |JOIN region ON n2.n_regionkey = r_regionkey
      |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** Registered query `q14_promo_share` (TPC-H Q14 shape): promo
    * revenue share for one month — broadcast part classifies each
    * lineitem, numerator and denominator in one ungrouped aggregate.
    * The month predicate is the only fact filter and pushes to the
    * scan. */
  def promoShare(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_type"))
    val vol = dec("l_extendedprice") *
      (lit(1).cast("decimal(9,2)") - dec("l_discount"))
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      // exact decimal sums; multiply-then-divide in double, the same
      // op order as the mirror (decimal division scales differ)
      .agg((lit(100.0) *
        sum(when(col("p_type") === "PROMO", vol)
          .otherwise(lit(0).cast("decimal(9,2)"))).cast("double") /
        sum(vol).cast("double")).as("promo_revenue"))
  }

  val promoShareSql: String =
    """SELECT
      |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))
      |    ELSE CAST(0 AS DECIMAL(9,2)) END) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE)
      |  AS promo_revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin

  /** Registered query `q17_small_qty` (TPC-H Q17 shape): revenue
    * locked in small-quantity orders of one brand — the classic
    * correlated scalar subquery (per-part average quantity),
    * DECORRELATED into an aggregate-then-join: the brand's partkeys
    * broadcast-semi-thin the fact FIRST, the per-part averages
    * aggregate over that thinned slice only, and the tiny average
    * table broadcasts back. Quantities are integral doubles, so the
    * averages are exact and order-independent on both engines. */
  def smallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir).filter(col("p_brand") === "Brand#23")
      .select(col("p_partkey"))
    val branded = Tables.lineitem(spark, sfDir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val avgQty = branded.groupBy(col("l_partkey").as("a_partkey"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    branded.join(broadcast(avgQty), col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((sum(dec("l_extendedprice")).cast("double") / lit(7.0))
        .as("avg_yearly"))
  }

  val smallQtyRevenueSql: String =
    """WITH branded AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#23'),
      |avg_qty AS (
      |  SELECT l_partkey AS a_partkey, AVG(l_quantity) AS avg_qty
      |  FROM branded GROUP BY l_partkey)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM branded JOIN avg_qty ON l_partkey = a_partkey
      |WHERE l_quantity < 0.2 * avg_qty""".stripMargin

  /** Registered query `q19_disjunctive` (TPC-H Q19 shape): an
    * OR-of-ANDs over attributes from BOTH join sides — the predicate
    * that defeats naive pushdown. The join stays a single broadcast
    * hash join on partkey with the disjunction as its residual; the
    * part side is tiny and ships once. (Catalyst's CNF conversion can
    * extract the common `p_brand IN (…)` implication for the scan;
    * correctness never depends on it.) */
  def disjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val l = Tables.lineitem(spark, sfDir)
    val clause =
      (col("p_brand") === "Brand#4" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#15" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#25" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey") && clause)
      .agg(sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(9,2)") - dec("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val disjunctiveRevenueSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** Registered query `q22_dormant_rich` (TPC-H Q22 shape): customers
    * whose balance beats the positive-balance average but who placed
    * no RECENT order (none since 2000), counted per nation — scalar
    * aggregate subquery + anti-join. The average threshold is
    * compared by EXACT integer cross-multiplication
    * (`cents × n_pos > total_cents`, equivalent to `bal > avg` for a
    * positive count): no float division exists to diverge between
    * engines or partition orders. Plan shape: the 1-row stat frame
    * attaches by explicit broadcast crossJoin (the allowed Cross
    * BNLJ), the orders side filters on the pushed date predicate and
    * thins to distinct custkeys before the LEFT ANTI, nation
    * broadcasts. */
  def dormantRich(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
      .withColumn("c_cents",
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
    val thr = c.filter(col("c_cents") > 0L)
      .agg(sum(col("c_cents")).as("total_cents"),
        count(lit(1)).as("n_pos"))
    val rich = c.crossJoin(broadcast(thr))
      .filter(col("c_cents") * col("n_pos") > col("total_cents"))
    val buyers = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val nation = Tables.nation(spark, sfDir)
    rich.join(buyers, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_custs"),
        sum(col("c_cents")).as("total_bal_cents"))
      .orderBy(col("n_name"))
  }

  val dormantRichSql: String =
    """WITH c AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS c_cents
      |  FROM customer),
      |thr AS (
      |  SELECT CAST(sum(c_cents) AS BIGINT) AS total_cents,
      |    count(*) AS n_pos
      |  FROM c WHERE c_cents > 0)
      |SELECT n_name, count(*) AS n_custs,
      |  CAST(sum(c_cents) AS BIGINT) AS total_bal_cents
      |FROM c, thr
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_cents * n_pos > total_cents
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Set ops: nations that have customers INTERSECT/EXCEPT suppliers. */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select(col("c_nationkey").cast("long").as("nationkey"))
    val s = Tables.supplier(spark, sfDir).select(col("s_nationkey").cast("long").as("nationkey"))
    val both = c.intersect(s).withColumn("op", lit("intersect"))
    val onlyC = c.except(s).withColumn("op", lit("except"))
    both.unionByName(onlyC).select(col("op"), col("nationkey"))
      .orderBy(col("op"), col("nationkey"))
  }

  val setOpsSql: String =
    """SELECT 'intersect' AS op, nationkey FROM (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
      |  INTERSECT
      |  SELECT CAST(s_nationkey AS BIGINT) FROM supplier) a
      |UNION ALL
      |SELECT 'except' AS op, nationkey FROM (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
      |  EXCEPT
      |  SELECT CAST(s_nationkey AS BIGINT) FROM supplier) b
      |ORDER BY op, nationkey""".stripMargin

  /** ROLLUP hierarchy totals: region → nation → grand total. Rolled-up
    * keys are surfaced via coalesce sentinels so null-ordering quirks
    * can't differ between engines. */
  def rollupSales(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_acctbal"))
      .select(coalesce(col("r_name"), lit("(all)")).as("region"),
        coalesce(col("n_name"), lit("(all)")).as("nation"),
        col("n_customers"), col("sum_acctbal"))
      .orderBy(col("region"), col("nation"))
  }

  val rollupSalesSql: String =
    """SELECT COALESCE(r_name, '(all)') AS region,
      |  COALESCE(n_name, '(all)') AS nation,
      |  count(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY region, nation""".stripMargin

  /** Explicit GROUPING SETS (the general form ROLLUP/CUBE sugar over)
    * with per-row `grouping()` flags — the bitmask disambiguates a
    * real NULL key from a subtotal row, which COALESCE placeholders
    * alone cannot. One pass, same partial-agg + single-shuffle plan
    * as a plain groupBy (Spark expands sets via a Expand operator). */
  def groupingSetsSales(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
          .cast("long").as("gid"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("gid"), col("n_orders"), col("sum_price"))
      .orderBy(col("gid"), col("status"), col("priority"))

  val groupingSetsSalesSql: String =
    """SELECT COALESCE(o_orderstatus, '(all)') AS status,
      |  COALESCE(o_orderpriority, '(all)') AS priority,
      |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
      |  count(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY gid, status, priority""".stripMargin

  /** Exact distinct counting across the star (COUNT(DISTINCT …)). */
  def distinctCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status"))

  val distinctCountsSql: String =
    """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
      |  CAST(count(DISTINCT (l_returnflag, l_linestatus)) AS BIGINT) AS n_flag_status
      |FROM lineitem""".stripMargin

  /** Sketch-based approximations (HLL++ distinct counts, GK quantile
    * sketch) run NEXT TO their exact counterparts. The sketch values
    * themselves are engine-specific estimators, so the driver-verified
    * output is: the exact values, plus booleans asserting each sketch
    * landed inside its published error bound — HLL++ at rsd 0.05
    * within 15% (3σ), percentile_approx at accuracy 1000 (rank error
    * ≤ 1e-3) within the exact ±5e-3-rank quantile envelope. The oracle
    * recomputes the exacts and pins every boolean to TRUE. */
  def approxStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_median_price"),
        expr("percentile(l_extendedprice, 0.99)").as("exact_p99_price"),
        approx_count_distinct(col("l_orderkey")).as("a_orders"),
        approx_count_distinct(col("l_partkey")).as("a_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("a_med"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("a_p99"),
        expr("percentile(l_extendedprice, 0.495)").as("lo_med"),
        expr("percentile(l_extendedprice, 0.505)").as("hi_med"),
        expr("percentile(l_extendedprice, 0.985)").as("lo_p99"),
        expr("percentile(l_extendedprice, 0.995)").as("hi_p99"))
      .select(
        col("exact_orders"), col("exact_parts"),
        col("exact_median_price"), col("exact_p99_price"),
        (abs(col("a_orders") - col("exact_orders")).cast("double") /
          col("exact_orders").cast("double") <= 0.15).as("orders_in_bounds"),
        (abs(col("a_parts") - col("exact_parts")).cast("double") /
          col("exact_parts").cast("double") <= 0.15).as("parts_in_bounds"),
        (col("a_med") >= col("lo_med") && col("a_med") <= col("hi_med")).as("median_in_bounds"),
        (col("a_p99") >= col("lo_p99") && col("a_p99") <= col("hi_p99")).as("p99_in_bounds"))

  /** Oracle for [[approxStats]]: the exact columns computed exactly;
    * the in-bounds booleans are literal TRUE — the Spark side must
    * prove its sketches landed inside their published error bounds. */
  val approxStatsSql: String =
    """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  quantile_cont(l_extendedprice, 0.5) AS exact_median_price,
      |  quantile_cont(l_extendedprice, 0.99) AS exact_p99_price,
      |  TRUE AS orders_in_bounds, TRUE AS parts_in_bounds,
      |  TRUE AS median_in_bounds, TRUE AS p99_in_bounds
      |FROM lineitem""".stripMargin

  /** CMS ε (relative to total count). */
  val CmsEps = 0.001

  /** Count-min-sketch frequency estimation beside its exact
    * counterpart — the third sketch family in the suite (HLL distinct
    * counts and quantile sketches live in [[approxStats]]). The sketch
    * builds in ONE distributed pass (`stat.countMinSketch` is a
    * depth×width counter-matrix aggregate — constant size, counters
    * merge by addition, so the result is partitioning- and
    * order-independent given the fixed seed). Point lookups happen
    * AFTER aggregation on the enum-sized (5-row) key frame — the one
    * place a driver-side structure is legitimate, same bound as the
    * IVF centroid collect. The oracle pins the exact counts and
    * requires the CMS guarantees to hold: est ≥ exact (always true of
    * CMS) and est ≤ exact + ε·N (holds w.p. 1−δ; deterministic here
    * under the fixed seed). */
  def cmsFreq(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir).select(col("event_type"))
    val sketch = ev.stat.countMinSketch(col("event_type"), CmsEps, 0.99, 42)
    val total = sketch.totalCount
    val est = udf((k: String) => sketch.estimateCount(k))
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"))
      .withColumn("e", est(col("event_type")))
      .select(col("event_type"), col("n_exact"),
        (col("e") >= col("n_exact")).as("est_ge_exact"),
        (col("e") <= col("n_exact") + lit((CmsEps * total).toLong)).as("est_within_eps"))
      .orderBy(col("event_type"))
  }

  /** Oracle for [[cmsFreq]]: exact counts; the sketch must prove its
    * published one-sided error bounds. */
  val cmsFreqSql: String =
    """SELECT event_type, count(*) AS n_exact,
      |  TRUE AS est_ge_exact, TRUE AS est_within_eps
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Explicit Bloom-filter semi-join prefilter — the manual form of
    * the runtime-filter optimization (the automatic
    * `InjectRuntimeFilter` path is pinned in RuntimeFilterSpec): build
    * a Bloom filter over the small side's keys in one pass
    * (`stat.bloomFilter` — bit-array OR-merge is commutative, and
    * Spark's Murmur3 hashing is unseeded, so the filter is
    * partitioning-independent), prefilter the big side BEFORE the
    * shuffle, then exact semi-join. At cluster scale the prefilter
    * drops non-matching rows at the scan, shrinking the shuffle by the
    * selectivity factor; Bloom filters have NO false negatives, so the
    * result is provably identical to the plain semi-join — which is
    * exactly what the oracle checks. */
  def bloomPrefilter(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    // size the filter from the UNfiltered dimension row count: under
    // parquet aggregate pushdown (Graft.builder sets it) a bare
    // count() resolves from row-group metadata — no data scan — and it
    // upper-bounds the filtered build side, so the realized FPP only
    // lands BELOW the 1% target (a hardcoded capacity would saturate
    // at larger SFs and send FPP → 1). This replaces round 6's full
    // filtered-scan count action with a metadata lookup.
    val capacity = math.max(Tables.customer(spark, sfDir).count(), 64L)
    val bloom = cust.stat.bloomFilter("c_custkey", capacity, 0.01)
    val mightContain = udf((k: Long) => bloom.mightContain(k))
    Tables.orders(spark, sfDir)
      .filter(mightContain(col("o_custkey"))) // scan-side prefilter
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")).as("revenue_cents"))
      .orderBy(col("o_orderpriority"))
  }

  /** Oracle: the plain semi-join aggregate — the Bloom stage must be
    * invisible in the result. */
  val bloomPrefilterSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    AS revenue_cents
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Mergeable distinct-count sketches (Apache DataSketches HLL, the
    * Spark 4 `hll_sketch_agg` family): one sketch per segment, then
    * the per-segment sketches UNIONED into a global estimate — the
    * merge step is what makes sketches the scalable rollup path (exact
    * distinct cannot reuse per-group work; sketches union in constant
    * space). Customers are unique rows, so per-segment exact distincts
    * sum to the global exact. The output proves both levels landed
    * within ±3% of exact. */
  def hllMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val seg = Tables.customer(spark, sfDir)
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_custkey")).as("n_exact"),
        expr("hll_sketch_agg(c_custkey)").as("sk"))
    val perSeg = seg.select(col("c_mktsegment").as("segment"), col("n_exact"),
      (abs(expr("hll_sketch_estimate(sk)") - col("n_exact")).cast("double") /
        col("n_exact").cast("double") <= 0.03).as("in_bounds"))
    val merged = seg.agg(sum(col("n_exact")).as("n_exact"),
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .select(lit("ALL").as("segment"), col("n_exact"),
        (abs(col("est") - col("n_exact")).cast("double") /
          col("n_exact").cast("double") <= 0.03).as("in_bounds"))
    perSeg.unionByName(merged).orderBy(col("segment"))
  }

  /** Oracle: exact distincts per segment and overall; booleans must
    * prove the sketch bounds. */
  val hllMergeSql: String =
    """SELECT c_mktsegment AS segment,
      |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_exact,
      |  TRUE AS in_bounds
      |FROM customer GROUP BY c_mktsegment
      |UNION ALL
      |SELECT 'ALL', CAST(count(DISTINCT c_custkey) AS BIGINT), TRUE FROM customer
      |ORDER BY segment""".stripMargin

  /** Scalar + correlated subqueries: orders above the global average
    * price, with each customer's own order count (Catalyst rewrites
    * the correlated scalar subquery into an aggregate + join). The
    * average is computed the decimal-exact way on BOTH sides —
    * `avg(double)` alone is summation-order-dependent and could flip
    * threshold-adjacent rows between engines. */
  def subqueries(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  (SELECT count(*) FROM orders_v i
        |   WHERE i.o_custkey = o.o_custkey) AS cust_orders
        |FROM orders_v o
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |                             / COUNT(*) FROM orders_v)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val subqueriesSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  (SELECT count(*) FROM orders i
      |   WHERE i.o_custkey = o.o_custkey) AS cust_orders
      |FROM orders o
      |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |                             / COUNT(*) FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** CUBE grouping sets over region × market segment. */
  def cubeSales(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .cube(col("r_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_acctbal"))
      .select(coalesce(col("r_name"), lit("(all)")).as("region"),
        coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
        col("n_customers"), col("sum_acctbal"))
      .orderBy(col("region"), col("segment"))
  }

  val cubeSalesSql: String =
    """SELECT COALESCE(r_name, '(all)') AS region,
      |  COALESCE(c_mktsegment, '(all)') AS segment,
      |  count(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY CUBE (r_name, c_mktsegment)
      |ORDER BY region, segment""".stripMargin

  /** String-function sweep over part names (deterministic, both
    * engines byte-identical on ASCII). */
  def stringFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        length(col("p_name")).cast("long").as("len"),
        substring(col("p_name"), 1, 5).as("pre5"),
        reverse(col("p_type")).as("rev"),
        trim(lit("  pad  ")).as("trimmed"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        split(col("p_name"), " ").getItem(0).as("first_word"))
      .orderBy(col("p_partkey"))

  val stringFuncsSql: String =
    """SELECT p_partkey,
      |  upper(p_name) AS up,
      |  lower(p_brand) AS lo,
      |  CAST(length(p_name) AS BIGINT) AS len,
      |  substr(p_name, 1, 5) AS pre5,
      |  reverse(p_type) AS rev,
      |  trim('  pad  ') AS trimmed,
      |  lpad(p_brand, 12, '*') AS padded,
      |  concat_ws('|', p_brand, p_type) AS joined,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |  string_split(p_name, ' ')[1] AS first_word
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Exact percentiles (linear interpolation) per order priority —
    * parity of Spark `percentile` and DuckDB `quantile_cont` on
    * DOUBLE inputs is verified by the oracle gate. */
  def exactPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("median_price"),
        expr("percentile(o_totalprice, 0.9)").as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  val exactPercentilesSql: String =
    """SELECT o_orderpriority,
      |  quantile_cont(o_totalprice, 0.5) AS median_price,
      |  quantile_cont(o_totalprice, 0.9) AS p90_price,
      |  count(*) AS n
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Calendar extraction + date arithmetic on order dates. */
  def dateBuckets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        month(col("o_orderdate")).cast("long").as("m"),
        col("o_totalprice"))
      .groupBy(col("y"), col("q"), col("m"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy(col("y"), col("q"), col("m"))

  val dateBucketsSql: String =
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
      |  CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q,
      |  CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
      |  count(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  /** Scalar math functions (exact-rounded / integer ops only — no
    * pow/exp/ln whose last-ulp rounding can differ across engines). */
  def mathFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        sqrt(col("o_totalprice")).as("sqrt_price"),
        abs(col("o_totalprice") - 250000.0).as("abs_delta"),
        floor(col("o_totalprice")).cast("long").as("floor_price"),
        ceil(col("o_totalprice")).cast("long").as("ceil_price"),
        signum(col("o_totalprice") - 250000.0).as("sign_delta"),
        pmod(col("o_orderkey"), lit(7L)).as("mod7"))
      .orderBy(col("o_orderkey"))

  val mathFuncsSql: String =
    """SELECT o_orderkey,
      |  sqrt(o_totalprice) AS sqrt_price,
      |  abs(o_totalprice - 250000.0) AS abs_delta,
      |  CAST(floor(o_totalprice) AS BIGINT) AS floor_price,
      |  CAST(ceil(o_totalprice) AS BIGINT) AS ceil_price,
      |  CAST(sign(o_totalprice - 250000.0) AS DOUBLE) AS sign_delta,
      |  o_orderkey % 7 AS mod7
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Global top-k: planned as TakeOrderedAndProject (no full sort). */
  def topOrdersGlobal(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val topOrdersGlobalSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin
}
