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
  /** events.ts arrives in whatever encoding the lake writer chose, and a
    * 100 TB-grade engine has to read all of them. Observed so far from the
    * driver testdata alone:
    *   - parquet TIMESTAMP(NANOS): Spark 4 refuses it as a timestamp; with
    *     `spark.sql.legacy.parquet.nanosAsLong` (set by Verify/Bench/test
    *     sessions) it arrives as LongType nanos,
    *   - parquet `timestamp[us]` with isAdjustedToUTC=false: Spark 4 reads
    *     TIMESTAMP_NTZ, which `unix_micros` and friends reject,
    *   - UTC-adjusted micros: arrives as session-local TimestampType already.
    * Normalize every arrival to TimestampType (exact under the pinned UTC
    * session TZ) so event-time operators work unchanged. Pinned by
    * TimestampEncodingSpec against all three encodings. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEventTime(read(spark, sfDir, "events"))

  private[graft] def normalizeEventTime(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalArgumentException(
          s"events.ts has unsupported type $other; expected int64 nanos, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")
}
