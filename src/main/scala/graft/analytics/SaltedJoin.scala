package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-resilient join: salt the probe side, replicate the build side.
  *
  * When one join-key value dominates (hot key), a plain shuffle join
  * sends that key's entire volume to one task. Salting splits each
  * probe key into `salts` sub-keys (`key × salt`) and replicates each
  * build row `salts` times, so a hot key spreads across `salts` tasks.
  * Results are IDENTICAL to the plain join — which is exactly what the
  * oracle checks (plain-join SQL).
  *
  * AQE's skew-join handling covers the sort-merge case automatically;
  * explicit salting remains the tool for aggregation-free hot-key
  * joins and for engines/paths where AQE can't split (e.g. bucketed
  * tables). `salts` would be sized from key histograms at 100 TB.
  */
object SaltedJoin {

  val Salts = 8

  def saltedEquiJoin(probe: DataFrame, build: DataFrame,
      probeKey: Column, buildKey: Column, salts: Int = Salts): DataFrame = {
    // deterministic per-row-ish salt: input partition id spreads a hot
    // key across however many scan partitions carry it (rand() works
    // too — the join result is salt-independent either way)
    val salted = probe.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
    val replicated = build.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
      probeKey === buildKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Oracled demo: lineitem ⋈ part revenue by brand via the salted
    * join — result equals the plain join. */
  def saltedBrandRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_brand"))
    saltedEquiJoin(l, p, col("l_partkey"), col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy(col("p_brand"))
  }

  val saltedBrandRevenueSql: String =
    """SELECT p_brand, count(*) AS n_lines,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin
}
