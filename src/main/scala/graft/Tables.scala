package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver testdata layout
  * (`TESTDATA.md`: one parquet per table under the sf dir).
  *
  * All queries read through here so scan options stay in one place.
  * At cluster scale the same entry point would carry partition-discovery
  * and bucketing metadata; for the flat testdata files a plain
  * vectorized parquet scan (column pruning + predicate pushdown handled
  * by Catalyst) is already the right physical plan.
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "region")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    * read as a timestamp. With `spark.sql.legacy.parquet.nanosAsLong`
    * (set by Verify/Bench/test sessions) it arrives as LongType nanos;
    * convert to a proper TimestampType truncated to micros (Spark's
    * native precision) so event-time operators work unchanged. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = read(spark, sfDir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")
}
