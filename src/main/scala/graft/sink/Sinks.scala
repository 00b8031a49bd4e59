package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** K1/K2 — the reference's sinks
  * (/root/reference/ingestor_precinct.py:186-218).
  *
  * K1: typed JDBC append (`to_sql(..., if_exists='append', dtype=…)`).
  * Spark-first: `df.write.jdbc` with `createTableColumnTypes` carrying
  * the explicit column types the reference declares. No live database
  * exists in this environment, so the writer is exercised only for its
  * option-building (unit-tested); the driver correctness path stays
  * parquet-based (SURVEY.md §7.2).
  *
  * K2: the reference's commented-out TSV append sink (:186-191).
  */
object Sinks {

  /** SQL DDL fragment for createTableColumnTypes from a StructType. */
  def columnTypes(schema: StructType): String =
    schema.fields.map { f =>
      val t = f.dataType match {
        case StringType => "TEXT"
        case LongType => "BIGINT" // vote sums overflow INTEGER at scale
        case IntegerType => "INTEGER"
        case BooleanType => "BOOLEAN"
        case DateType => "DATE"
        case TimestampType => "TIMESTAMP"
        case DoubleType => "DOUBLE PRECISION"
        case other => other.sql
      }
      s"${f.name} $t"
    }.mkString(", ")

  /** K1: typed JDBC append. Executors write partitions in parallel
    * (`numPartitions`/`batchsize` bound connection count and round
    * trips at scale). */
  def writeJdbc(df: DataFrame, url: String, table: String,
      user: String, password: String, batchSize: Int = 10000): Unit =
    df.write
      .mode("append")
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize)
      .option("createTableColumnTypes", columnTypes(df.schema))
      .save()

  /** K2: TSV append sink with header. */
  def writeTsv(df: DataFrame, dir: String): Unit =
    df.write
      .mode("append")
      .option("sep", "\t")
      .option("header", "true")
      .csv(dir)

  /** Bucketed managed table: co-locates rows by join/agg key so
    * repeated joins on `keys` between tables bucketed the same way
    * plan WITHOUT a shuffle exchange — the persistent-layout answer to
    * the biggest cost at 100 TB. (`sortBy` the same key additionally
    * removes the sort from sort-merge joins.) */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
