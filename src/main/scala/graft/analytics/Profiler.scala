package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-profiling operator (the pre-training data-quality sweep): one
  * pass per table computing per-column null count, distinct count, and
  * min/max rendered as strings.
  *
  * Shape: ONE aggregate over the table computing 4·N metrics (no
  * per-column scans), then a metadata-sized unpivot — at 100 TB this
  * is a single scan with map-side partial aggregation, which is the
  * only way profiling is affordable. */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fieldNames.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot: one output row per source column (metadata-sized)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col("__rows").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"), col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
      .orderBy(col("col_name"))
  }

  /** Oracled instance: profile the orders table. */
  def profileOrders(spark: SparkSession, sfDir: String): DataFrame =
    profile(Tables.orders(spark, sfDir))

  /** DuckDB mirror: one UNION ALL branch per column over shared
    * aggregates. Timestamp min/max rendered via the same cast. */
  val profileOrdersSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val branches = cols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_value,
         |  CAST(MAX($c) AS VARCHAR) AS max_value
         |FROM orders""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }
}
