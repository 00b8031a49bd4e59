package graft

import java.nio.file.Files

import graft.ext.EventWindows
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the timestamp-encoding matrix for `Tables.events`: a lake writes
  * event time as int64 nanos, `timestamp[us]` NTZ, or UTC-adjusted micros,
  * and the engine must normalize every arrival to TimestampType so
  * `unix_micros`-consuming operators analyze on all of them.
  *
  * Round-5 regression pinned here: the driver testdata flipped from
  * TIMESTAMP(NANOS) to `timestamp[us]` NTZ and 7 queries broke.
  */
class TimestampEncodingSpec extends SparkSpec {

  /** 6 events / 2 users; micros-precision instants, fixed values. */
  private val baseMicros = 1700000000000000L // 2023-11-14T22:13:20Z
  private val rows = Seq(
    (1L, 0L, 10L, "view", 1.0, "{}"),
    (2L, 60000000L, 10L, "cart", 2.0, "{}"),
    (3L, 120000000L, 10L, "buy", 3.0, "{}"),
    (4L, 0L, 20L, "view", 4.0, "{}"),
    (5L, 30000000L, 20L, "view", 5.0, "{}"),
    (6L, 90000000L, 20L, "cart", 6.0, "{}")
  )

  private def writeDir(suffix: String): String = {
    val dir = Files.createTempDirectory(s"graft-tsenc-$suffix").toFile
    dir.deleteOnExit()
    dir.getAbsolutePath
  }

  /** Encoding 1: int64 nanos (what `nanosAsLong` yields for TIMESTAMP(NANOS)). */
  private def writeNanosLong(): String = {
    import spark.implicits._
    val dir = writeDir("nanos")
    rows.toDF("event_id", "off", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        (lit(baseMicros) + col("off")).multiply(1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Encoding 2: `timestamp[us]` with isAdjustedToUTC=false → TIMESTAMP_NTZ. */
  private def writeNtzMicros(): String = {
    import spark.implicits._
    val dir = writeDir("ntz")
    rows.toDF("event_id", "off", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        timestamp_micros(lit(baseMicros) + col("off")).cast(TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Encoding 3: UTC-adjusted micros → session-local TimestampType directly. */
  private def writeUtcMicros(): String = {
    import spark.implicits._
    val dir = writeDir("utc")
    rows.toDF("event_id", "off", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        timestamp_micros(lit(baseMicros) + col("off")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def collectMarkov(sfDir: String): Seq[(String, String, Long, Long, Double)] =
    EventWindows.markovTransitions(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq

  test("all three lake encodings normalize to TimestampType") {
    for (dir <- Seq(writeNanosLong(), writeNtzMicros(), writeUtcMicros())) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"dir=$dir yielded ${ev.schema("ts").dataType}")
      // values identical across encodings (exact under the pinned UTC TZ)
      val micros = ev.orderBy("event_id")
        .select(unix_micros(col("ts"))).as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().toSeq
      assert(micros == rows.map(r => baseMicros + r._2), s"dir=$dir micros=$micros")
    }
  }

  test("unix_micros-consuming query (x6_markov) analyzes and agrees on every encoding") {
    val results = Seq(writeNanosLong(), writeNtzMicros(), writeUtcMicros()).map(collectMarkov)
    val expected = Seq(
      ("cart", "buy", 1L, 1L, 1.0),
      ("view", "cart", 2L, 3L, 2.0 / 3.0),
      ("view", "view", 1L, 3L, 1.0 / 3.0)
    )
    for ((res, i) <- results.zipWithIndex)
      assert(res == expected, s"encoding #$i disagreed: $res")
  }

  test("an unsupported ts type is rejected with a clear error") {
    import spark.implicits._
    val bad = Seq((1L, "not-a-time")).toDF("event_id", "ts")
    val err = intercept[IllegalArgumentException](Tables.normalizeEventTime(bad))
    assert(err.getMessage.contains("unsupported"))
  }
}
