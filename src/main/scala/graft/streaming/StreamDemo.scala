package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable Structured Streaming demo:
  * `runMain graft.streaming.StreamDemo [sfDir]`
  *
  * Streams the testdata events parquet through a file source
  * (one file per trigger — simulating arriving batches), applies the
  * SAME windowed aggregation used in batch ([[EventStream
  * .windowedCounts]]) with a 10-minute watermark, and prints the
  * top windows from the memory sink. Demonstrates that the engine's
  * event-time operators run unchanged under `readStream`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the events parquet into a stream-source directory
    val srcDir = Files.createTempDirectory("graft_stream_src")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve("batch0.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val schema = graft.Tables.events(spark, sfDir).schema
    val raw = spark.readStream
      .schema(graft.Tables.read(spark, sfDir, "events").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
    val events =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    require(events.schema("ts").dataType == schema("ts").dataType)

    val q = EventStream.windowedCounts(events)
      .writeStream.outputMode("complete")
      .format("memory").queryName("demo")
      .start()
    q.processAllAvailable()
    val top = spark.table("demo").orderBy(col("n").desc, col("window_start")).limit(5)
    println("=== top 5-minute windows (streaming) ===")
    top.collect().foreach(r => println(
      f"${r.getAs[java.sql.Timestamp]("window_start")}  ${r.getAs[String]("event_type")}%-10s n=${r.getAs[Long]("n")}%-3d sum=${r.getAs[Double]("sum_value")}"))
    println(s"total windows: ${spark.table("demo").count()}")
    q.stop()
    spark.stop()
  }
}
