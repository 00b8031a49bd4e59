package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Columnar-format breadth under the DRIVER gate (SinksSpec pins the
  * row-set round-trips; these put an actual cross-format pipeline
  * under the DuckDB hash compare).
  */
object Formats {

  private def scratch(spark: SparkSession, sfDir: String, tag: String): String =
    graft.Scratch.dir(spark, s"fmt-$tag", sfDir).getAbsolutePath

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(); ()
  }

  /** Registered query `x7_orc_roundtrip` — the parquet orders table
    * rewritten as ORC (Spark's second first-class columnar format:
    * different encoding stack, same Catalyst scan interface), read
    * back off the ORC files, and aggregated. The oracle reads the
    * ORIGINAL parquet, so any value drift through the ORC writer/
    * reader (decimal scale, string encoding, date logic) breaks the
    * hash gate. Scale note: format conversion is an embarrassingly
    * parallel rewrite (no shuffle — partition-local read→encode→write);
    * the aggregate downstream is the usual one-shuffle rollup, and ORC
    * predicate pushdown serves it the same way parquet's does. */
  def orcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = scratch(spark, sfDir, "orc")
    rm(new java.io.File(dir))
    graft.Tables.orders(spark, sfDir).write.mode("overwrite").orc(dir)
    spark.read.orc(dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .as("revenue_cents"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("o_orderstatus"))
  }

  /** Mirror over the original parquet — the conversion must be
    * value-invisible. */
  val orcRoundtripSql: String =
    """SELECT o_orderstatus, count(*) AS n_orders,
      |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    AS revenue_cents,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin
}
