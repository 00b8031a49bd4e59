package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SCD-type-1 merge (MERGE INTO … WHEN MATCHED UPDATE / WHEN NOT
  * MATCHED INSERT) expressed as a full-outer join + keyed coalesce —
  * the engine shape under every lakehouse MERGE implementation.
  *
  * The update set is derived deterministically from the base table
  * (`%`-selected updates plus shifted-key inserts) so the query is
  * self-contained and oracle-able on the driver's parquet tables.
  *
  * Scale: one shuffle full-outer join on the merge key; with the base
  * table bucketed/partitioned on that key (see the bucketed-join test)
  * the shuffle disappears on the base side and only the (usually tiny)
  * update batch moves. No driver-side state.
  */
object MergeUpsert {

  def scd1Merge(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal").cast("decimal(18,2)").as("bal"))
    val updates = base.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("k"), col("c_name").as("un"),
        lit("RESEGMENTED").as("us"),
        (col("bal") + lit(100).cast("decimal(18,2)")).as("ub"))
      .unionByName(
        base.filter(col("c_custkey") % 97 === 0)
          .select((col("c_custkey") + 1000000L).as("k"),
            concat(col("c_name"), lit("-new")).as("un"),
            lit("NEWSEG").as("us"),
            lit(0).cast("decimal(18,2)").as("ub")))
    base.join(updates, base("c_custkey") === updates("k"), "full_outer")
      .select(
        coalesce(col("k"), col("c_custkey")).as("c_custkey"),
        coalesce(col("un"), col("c_name")).as("c_name"),
        coalesce(col("us"), col("c_mktsegment")).as("c_mktsegment"),
        coalesce(col("ub"), col("bal")).cast("double").as("c_acctbal"),
        when(col("k").isNull, "kept")
          .when(col("c_custkey").isNull, "inserted")
          .otherwise("updated").as("op"))
      .orderBy(col("c_custkey"))
  }

  val scd1MergeSql: String =
    """WITH base AS (
      |  SELECT c_custkey, c_name, c_mktsegment,
      |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      |  FROM customer),
      |upd AS (
      |  SELECT c_custkey AS k, c_name AS un, 'RESEGMENTED' AS us,
      |    bal + CAST(100 AS DECIMAL(18,2)) AS ub
      |  FROM base WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, c_name || '-new', 'NEWSEG',
      |    CAST(0 AS DECIMAL(18,2))
      |  FROM base WHERE c_custkey % 97 = 0)
      |SELECT COALESCE(k, c_custkey) AS c_custkey,
      |  COALESCE(un, c_name) AS c_name,
      |  COALESCE(us, c_mktsegment) AS c_mktsegment,
      |  CAST(COALESCE(ub, bal) AS DOUBLE) AS c_acctbal,
      |  CASE WHEN k IS NULL THEN 'kept'
      |       WHEN c_custkey IS NULL THEN 'inserted'
      |       ELSE 'updated' END AS op
      |FROM base FULL OUTER JOIN upd ON c_custkey = k
      |ORDER BY 1""".stripMargin

  /** SCD2 (slowly-changing-dimension type 2) history build: turn the
    * per-customer order log into validity intervals — each row's
    * `valid_to` is the next change's `valid_from` (lead), the last row
    * stays open (sentinel 9999-12-31, `is_current`). The standard
    * CDC-log → dimension-history transformation, complementing
    * [[scd1Merge]]'s overwrite form.
    *
    * One window shuffle on the dimension key, nothing else — the shape
    * that holds at any scale (each entity's history lands in one
    * partition; no self-join against the log). Total order within an
    * entity: (event time, order key) so equal-timestamp changes are
    * deterministic. */
  def scd2History(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"), col("o_orderdate"))
      .withColumn("next_from", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        coalesce(date_format(col("next_from"), "yyyy-MM-dd HH:mm:ss"),
          lit("9999-12-31 00:00:00")).as("valid_to"),
        col("next_from").isNull.as("is_current"))
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))
  }

  val scd2HistorySql: String =
    """WITH h AS (
      |  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
      |    lead(o_orderdate) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS next_from
      |  FROM orders)
      |SELECT o_custkey, o_orderkey, o_orderstatus,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |  COALESCE(strftime(next_from, '%Y-%m-%d %H:%M:%S'),
      |    '9999-12-31 00:00:00') AS valid_to,
      |  next_from IS NULL AS is_current
      |FROM h
      |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin
}
