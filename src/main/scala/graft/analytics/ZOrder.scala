package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton) clustering — the multi-dimensional data-skipping
  * layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave
  * the bits of two sort dimensions so that range predicates on EITHER
  * column map to a bounded number of z-ranges, and parquet row-group
  * min/max stats can skip on both at once. A plain sort clusters one
  * column perfectly and the other not at all; z-order splits the
  * locality between them.
  *
  * Everything is LONG bit arithmetic (shifts / masks / or) — codegen'd
  * on the Spark side, bit-identical in the DuckDB mirror, and exactly
  * the math a 1000-executor layout job would run per row (a narrow
  * projection; the only shuffle is the final range partition by z).
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to the even bit positions 0,2,…,30
    * (the classic mask-doubling network — 4 shift/or/and rounds, no
    * loop, no branch). */
  def spread16(x: Column): Column = {
    val m1 = x.bitwiseAND(lit(0xFFFFL))
    val m2 = (m1.bitwiseOR(shiftleft(m1, 8))).bitwiseAND(lit(0x00FF00FFL))
    val m3 = (m2.bitwiseOR(shiftleft(m2, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val m4 = (m3.bitwiseOR(shiftleft(m3, 2))).bitwiseAND(lit(0x33333333L))
    (m4.bitwiseOR(shiftleft(m4, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit coordinates: x on even bits, y on
    * odd bits. */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The same spread as SQL text, for the oracle mirror. */
  private def spreadSql(x: String): String = {
    val m1 = s"($x & 65535)"
    val m2 = s"(($m1 | ($m1 << 8)) & 16711935)"
    val m3 = s"(($m2 | ($m2 << 4)) & 252645135)"
    val m4 = s"(($m3 | ($m3 << 2)) & 858993459)"
    s"(($m4 | ($m4 << 1)) & 1431655765)"
  }
  def zValueSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Registered query `x7_zorder`: z-order lineitem on
    * (l_partkey, l_suppkey) masked to 10 bits each, tile the z-space
    * into 2^6-aligned buckets (z >> 12 ⇒ 64×64 coordinate tiles), and
    * report per-tile row counts and coordinate bounds. The bounds make
    * the locality guarantee VISIBLE (and oracle-checkable): within a
    * z >> 2j bucket, x >> j and y >> j are constant — each tile covers
    * one bounded square of the key space, which is precisely why
    * min/max stats can skip files for predicates on either dimension.
    */
  def zorderTiles(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
      .select((col("l_partkey") % 1024).as("x"), (col("l_suppkey") % 1024).as("y"))
    l.select(col("x"), col("y"), zValue(col("x"), col("y")).as("z"))
      .groupBy(shiftright(col("z"), 12).as("tile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .orderBy(col("tile"))
  }

  val zorderTilesSql: String = {
    val z = zValueSql("x", "y")
    s"""WITH pts AS (
       |  SELECT l_partkey % 1024 AS x, l_suppkey % 1024 AS y FROM lineitem),
       |zc AS (SELECT x, y, $z AS zv FROM pts)
       |SELECT zv >> 12 AS tile, CAST(count(*) AS BIGINT) AS n_rows,
       |  min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
       |FROM zc
       |GROUP BY 1
       |ORDER BY tile""".stripMargin
  }

  /** Layout sink: rewrite `df` into `files` parquet files range-
    * clustered by the z-value of two long columns — the persistent
    * form of the query above ([[graft.sink.Sinks.compact]] for one
    * dimension, this for two). Downstream scans with a predicate on
    * either column skip most files on row-group stats. */
  def compactZOrder(df: DataFrame, dir: String, files: Int,
      xCol: String, yCol: String, bits: Int = 16): Unit = {
    val mask = (1L << bits) - 1
    df.withColumn("__z",
        zValue(col(xCol).bitwiseAND(lit(mask)), col(yCol).bitwiseAND(lit(mask))))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }
}
