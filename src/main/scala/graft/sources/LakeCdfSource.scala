package graft.sources

import org.apache.spark.sql.{DataFrame, GraftSqlShim, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset,
  ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.lake.Lake

/** CHANGE-DATA-FEED streaming source for the [[Lake]] format —
  * `spark.readStream.format("graft-lake-cdf").option("path", dir)`
  * turns a lake table's delta log into an incremental stream: each
  * micro-batch is the change feed of a consecutive VERSION RANGE
  * (inserts / update pre+post images / deletes, stamped with
  * `_change_type` and `_commit_version`), offsets ARE committed
  * versions, and `maxVersionsPerTrigger` gives admission control —
  * Delta's `readChangeFeed` streaming contract, reproduced on the
  * hand-built format.
  *
  * Architecture: the V1 `Source` API (`getBatch` returns a DataFrame)
  * deliberately, because the per-batch plan IS [[Lake.changes]]'s
  * log-direct diff — vectorized parquet scans of exactly the files
  * version k touched, full-outer hash join on the key struct, codegen
  * throughout. The V2 `MicroBatchStream` would demand hand-rolled
  * `PartitionReader`s and forfeit all of it. Admission control and
  * `Trigger.AvailableNow` ride [[SupportsAdmissionControl]] /
  * [[SupportsTriggerAvailableNow]] exactly as Spark's own
  * `FileStreamSource` does (a V1 source with the same two interfaces):
  * the engine passes the LAST COMMITTED offset into `latestOffset`,
  * so rate limiting needs no side-channel state and restarts resume
  * exactly where the checkpoint says — no high-water file, no replayed
  * or skipped version.
  *
  * Options: `path` (table root, required); `startingVersion` (default
  * 1 — the feed opens with version 1's snapshot as `insert` rows, the
  * "whole history" read; `startingVersion = n` starts the feed at
  * version n's OWN commit, i.e. the exclusive baseline is n−1);
  * `maxVersionsPerTrigger` (default: all available in one batch).
  *
  * Scale shape: per micro-batch metadata is O(files touched) by the
  * versions in the batch (the delta log is the diff — no manifest
  * resolution), and data I/O is the touched files only. A stream that
  * falls behind never pays more than the log it has to catch up on. */
class LakeCdfSource extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-lake-cdf"

  private def dirOf(params: Map[String, String]): String =
    params.getOrElse("path", throw new IllegalArgumentException(
      "graft-lake-cdf requires option 'path'"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(),
      LakeCdfSource.feedSchema(sqlContext.sparkSession, dirOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val dir = dirOf(parameters)
    val startingVersion = parameters.get("startingVersion").map(_.toLong).getOrElse(1L)
    require(startingVersion >= 1L, s"startingVersion must be >= 1, got $startingVersion")
    val maxPerTrigger = parameters.get("maxVersionsPerTrigger").map(_.toLong)
      .getOrElse(Long.MaxValue)
    require(maxPerTrigger >= 1L, "maxVersionsPerTrigger must be >= 1")
    new LakeCdfStreamSource(sqlContext.sparkSession, dir, startingVersion,
      maxPerTrigger)
  }
}

private[sources] object LakeCdfSource {
  /** Data columns in snapshot order + the two CDF metadata columns. */
  def feedSchema(spark: SparkSession, dir: String): StructType = {
    val snap = Lake.snapshotSchema(spark, dir)
    StructType(snap.fields.toSeq :+
      StructField("_change_type", StringType) :+
      StructField("_commit_version", LongType))
  }
}

private[sources] class LakeCdfStreamSource(spark: SparkSession, dir: String,
    startingVersion: Long, maxPerTrigger: Long)
    extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val declared = LakeCdfSource.feedSchema(spark, dir)
  // AvailableNow latch: versions committed after the trigger started
  // are left for the next run (the bounded-run contract)
  @volatile private var availableNowTarget: Option[Long] = None

  override def schema: StructType = declared

  private def versionOf(o: V2Offset): Long = o match {
    case lv: LakeCdfOffset => lv.version
    case other => other.json.trim.toLong // SerializedOffset off the checkpoint
  }

  /** The exclusive baseline the stream starts from: version 1's
    * snapshot rides the feed iff startingVersion == 1. */
  override def initialOffset(): V2Offset = LakeCdfOffset(startingVersion - 1L)

  override def deserializeOffset(json: String): V2Offset =
    LakeCdfOffset(json.trim.toLong)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(Lake.latestVersion(dir))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Engine hands the last PROCESSED end offset (null before the
    * first batch); the next batch spans (start, min(latest, start +
    * maxVersionsPerTrigger)] — restart resumes from the checkpointed
    * offset with no source-side state. */
  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
    val base = math.max(
      Option(start).map(versionOf).getOrElse(startingVersion - 1L),
      startingVersion - 1L)
    val latest = availableNowTarget.getOrElse(Lake.latestVersion(dir))
    LakeCdfOffset(math.min(latest, base + maxPerTrigger) max base)
  }

  /** Unused once [[SupportsAdmissionControl]] is present (the engine
    * calls [[latestOffset]]) — same contract as FileStreamSource. */
  override def getOffset: Option[V1Offset] =
    throw new UnsupportedOperationException(
      "getOffset is not called on a SupportsAdmissionControl source")

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(o => versionOf(o)).getOrElse(startingVersion - 1L)
    val to = versionOf(end)
    val align = (df: DataFrame) => df.select(declared.fields.toSeq.map(f =>
      (if (df.columns.contains(f.name)) col(f.name)
       else lit(null).cast(f.dataType)).as(f.name)): _*)
    val snapshotPart = // the from==0 opening batch carries v1 as inserts
      if (from == 0L && to >= 1L)
        Some(align(Lake.read(spark, dir, 1L)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(1L))))
      else None
    val changesPart =
      if (math.max(from, 1L) < to)
        Some(align(Lake.changes(spark, dir, math.max(from, 1L), to)))
      else None
    val batch = (snapshotPart.toSeq ++ changesPart.toSeq)
      .reduceOption(_ unionAll _)
      .getOrElse(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), declared))
    GraftSqlShim.asStreaming(spark, batch)
  }

  override def commit(end: V2Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Offset = the highest lake version the batch has consumed. */
private[sources] case class LakeCdfOffset(version: Long) extends V1Offset {
  override def json: String = version.toString
}
