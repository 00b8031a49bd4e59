package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
