package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap, OptionalLong}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the K2 TSV sink layout
  * ([[graft.sink.Sinks.writeTsv]]): a directory holding one one-line
  * `00000-header.tsv` plus header-free tab-separated part files — the
  * on-disk shape of the reference's growing TSV output
  * (/root/reference/ingestor_precinct.py:186-191). Reading the engine's
  * own sink format back closes the write→read loop a real pipeline
  * needs (audit, replay, downstream joins).
  *
  * This is the full V2 read surface, not a shim:
  *  - `SupportsPushDownRequiredColumns` — only requested columns are
  *    materialized (the parse still splits the line, but no UTF8String
  *    is allocated for dropped fields);
  *  - `SupportsPushDownFilters` — `EqualTo(string)` / `IsNotNull`
  *    evaluate inside the scan, before rows reach Spark, and are
  *    reported via `pushedFilters`/`description` so `.explain` shows
  *    them; everything else stays a post-scan Catalyst filter;
  *  - one `InputPartition` per data file — parallelism scales with the
  *    file count the parallel writers produced (the production
  *    extension is byte-range splits within large files, exactly how
  *    Spark's own CSV reader scales);
  *  - `SupportsReportStatistics` — sizeInBytes from the file lengths,
  *    so the optimizer can broadcast a small TSV side.
  *
  * Format bounds, ENFORCED at write time: fields are split on the raw
  * delimiter with no quote/escape handling, so both writers refuse
  * values a raw split cannot round-trip ([[graft.sink.Sinks.writeTsv]]
  * raises on tab/quote/CR/LF before the CSV writer would quote them;
  * [[TsvDataWriter]] raises on tab/CR/LF — quotes are verbatim on the
  * V2 path). All columns read as nullable strings (TSV is untyped),
  * and the empty string is the null token on both paths (empty and
  * null deliberately collapse, as in any untyped text format).
  * Executors reopen files with a default Hadoop
  * `Configuration` (classpath-configured filesystems — local/HDFS;
  * custom per-session FS conf would ride an explicit broadcast).
  */
class TsvSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tsv"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TsvSource.schemaFor(options.get("path"))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new TsvTable(schema, properties.get("path"))
}

object TsvSource {
  val HeaderFile = "00000-header.tsv"
  val Delimiter = "\t"

  private[sources] def fs(dir: String) =
    new Path(dir).getFileSystem(new Configuration())

  /** Data part files: everything but the header file and hidden/marker
    * files, sorted by name for deterministic partition order. */
  private[sources] def dataFiles(dir: String): Seq[FileStatus] = {
    val p = new Path(dir)
    fs(dir).listStatus(p).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && st.getLen > 0 && n != HeaderFile &&
          !n.startsWith("_") && !n.startsWith(".")
      }
      .sortBy(_.getPath.getName)
  }

  private[sources] def schemaFor(dir: String): StructType = {
    val hp = new Path(dir, HeaderFile)
    val in = new BufferedReader(new InputStreamReader(fs(dir).open(hp),
      StandardCharsets.UTF_8))
    val header = try in.readLine() finally in.close()
    require(header != null && header.nonEmpty, s"empty TSV header at $hp")
    StructType(header.split(Delimiter, -1).toSeq
      .map(StructField(_, StringType, nullable = true)))
  }
}

private[sources] class TsvTable(schema0: StructType, dir: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_tsv($dir)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsvScanBuilder(schema0, dir)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TsvWriteBuilder(dir, info.schema())
}

private[sources] class TsvScanBuilder(full: StructType, dir: String)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, rest) = filters.partition {
      case EqualTo(c, _: String) => full.fieldNames.contains(c)
      case IsNotNull(c) => full.fieldNames.contains(c)
      case _ => false
    }
    pushed = sup
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new TsvScan(full, required, dir, pushed)
}

private[sources] class TsvScan(
    full: StructType,
    required: StructType,
    dir: String,
    pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftTsvScan(dir=$dir, columns=[${required.fieldNames.mkString(",")}], " +
      s"pushed=[${pushed.mkString(", ")}])"

  override def planInputPartitions(): Array[InputPartition] =
    TsvSource.dataFiles(dir)
      .map(st => TsvInputPartition(st.getPath.toString)).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    // serialize filters to a plain form (sources.Filter is serializable,
    // but a flat spec keeps the executor side trivially stable)
    val eq = pushed.collect { case EqualTo(c, v: String) =>
      full.fieldIndex(c) -> v }
    val nn = pushed.collect { case IsNotNull(c) => full.fieldIndex(c) }
    TsvReaderFactory(full.size, required.fieldNames.map(full.fieldIndex), eq, nn)
  }

  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = TsvSource.dataFiles(dir).map(_.getLen).sum
    override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

private[sources] case class TsvInputPartition(path: String) extends InputPartition

private[sources] case class TsvReaderFactory(
    nCols: Int,
    projection: Array[Int],
    pushedEq: Array[(Int, String)],
    pushedNotNull: Array[Int])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new TsvPartitionReader(p.asInstanceOf[TsvInputPartition].path,
      nCols, projection, pushedEq, pushedNotNull)
}

/** V2 write path with the real two-phase commit protocol:
  *
  *  - each task streams rows into a TEMP file named `_tmp_<uuid>` in
  *    the target directory — the `_` prefix keeps half-written output
  *    invisible to every reader (the scan's listing filter skips it);
  *  - `DataWriter.commit()` hands the temp path to the driver as its
  *    commit message; speculative duplicates of the same task abort and
  *    delete their own temp;
  *  - `BatchWrite.commit(messages)` — driver-side, after ALL tasks
  *    succeeded — renames every temp to a visible `part-…tsv` and stamps
  *    the header file if absent: readers observe the job all-or-nothing
  *    (rename is atomic per file; a reader racing the commit can see a
  *    prefix of the new parts, same contract as Spark's own
  *    FileOutputCommitter v2);
  *  - `BatchWrite.abort()` deletes any surviving temps.
  *
  * Truncate (`SaveMode.Overwrite`) drops existing parts + header before
  * the new ones publish. Values render as TSV text: strings verbatim
  * (the sink's contract: values never contain the delimiter), numerics
  * and booleans via toString, null as the empty string. Date/timestamp
  * columns must be cast to string first — refused at plan time, not
  * corrupted at read time (their internal Int/Long encoding would
  * otherwise render as raw offsets).
  */
private[sources] class TsvWriteBuilder(dir: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val bad = schema.fields.filterNot(f => f.dataType match {
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.BooleanType => true
      case _ => false
    })
    require(bad.isEmpty,
      s"graft-tsv cannot render columns ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}; cast to string first")
    // An append under an existing header must match it: publishing rows
    // with a different column count/order under the old header would
    // make every subsequent read silently misaligned. Plan-time check,
    // same spirit as the type refusal above. (Truncate replaces the
    // header, so any schema is fine there.)
    val fs = TsvSource.fs(dir)
    if (!doTruncate && fs.exists(new Path(dir, TsvSource.HeaderFile))) {
      val existing = TsvSource.schemaFor(dir).fieldNames
      require(existing.sameElements(schema.fieldNames),
        s"graft-tsv append schema [${schema.fieldNames.mkString(",")}] does not " +
          s"match the existing header [${existing.mkString(",")}]; " +
          "align column names/order or overwrite")
    }
    new TsvWrite(dir, schema, doTruncate)
  }
}

private[sources] class TsvWrite(dir: String, schema: StructType, truncate: Boolean)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    TsvWriterFactory(dir, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = TsvSource.fs(dir)
    val base = new Path(dir)
    if (truncate) {
      TsvSource.dataFiles(dir).foreach(st => fs.delete(st.getPath, false))
      fs.delete(new Path(base, TsvSource.HeaderFile), false)
    }
    messages.collect { case TsvCommitMessage(tmp) =>
      val t = new Path(tmp)
      fs.rename(t, new Path(base, t.getName.stripPrefix("_tmp_") + ".tsv"))
    }
    val header = new Path(base, TsvSource.HeaderFile)
    if (!fs.exists(header)) {
      val out = fs.create(header, true)
      try out.write((schema.fieldNames.mkString(TsvSource.Delimiter) + "\n")
        .getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = TsvSource.fs(dir)
    messages.collect { case TsvCommitMessage(tmp) =>
      fs.delete(new Path(tmp), false)
    }
  }
}

private[sources] case class TsvCommitMessage(tmpPath: String) extends WriterCommitMessage

private[sources] case class TsvWriterFactory(dir: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TsvDataWriter(dir, schema, partitionId, taskId)
}

private[sources] class TsvDataWriter(
    dir: String,
    schema: StructType,
    partitionId: Int,
    taskId: Long)
    extends DataWriter[InternalRow] {

  // task+partition in the name keeps speculative attempts distinct
  private val tmp = new Path(dir,
    f"_tmp_part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID().toString.take(8)}")
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    TsvSource.fs(dir).create(tmp, false), StandardCharsets.UTF_8))
  private val types = schema.fields.map(_.dataType)

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder
    var i = 0
    while (i < types.length) {
      if (i > 0) sb.append(TsvSource.Delimiter)
      if (!row.isNullAt(i)) {
        val v = row.get(i, types(i)).toString
        // fail fast instead of corrupting: a tab/newline inside a value
        // is structural in this format (the reader splits raw lines) —
        // refuse the row here, before anything is published. Quote
        // chars are NOT structural on this path (writer and reader are
        // both quote-transparent, values round-trip verbatim).
        if (types(i) == StringType &&
            (v.indexOf('\t') >= 0 || v.indexOf('\n') >= 0 || v.indexOf('\r') >= 0))
          throw new IllegalArgumentException(
            s"graft-tsv: column '${schema.fieldNames(i)}' value contains a " +
              "tab/newline, which the TSV layout cannot represent")
        sb.append(v)
      }
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    TsvCommitMessage(tmp.toString)
  }

  override def abort(): Unit = {
    out.close()
    TsvSource.fs(dir).delete(tmp, false)
  }

  override def close(): Unit = ()
}

private[sources] class TsvPartitionReader(
    path: String,
    nCols: Int,
    projection: Array[Int],
    pushedEq: Array[(Int, String)],
    pushedNotNull: Array[Int])
    extends PartitionReader[InternalRow] {

  private val in = new BufferedReader(new InputStreamReader(
    TsvSource.fs(path).open(new Path(path)), StandardCharsets.UTF_8))
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      val fields = line.split(TsvSource.Delimiter, -1)
      // ragged rows: missing trailing fields read as null (the writer
      // never produces them; defensive for hand-edited files)
      def at(i: Int): String =
        if (i < fields.length && fields(i).nonEmpty) fields(i) else null
      val keep =
        pushedNotNull.forall(i => at(i) != null) &&
          pushedEq.forall { case (i, v) => at(i) == v }
      if (keep) {
        val vals = new Array[Any](projection.length)
        var j = 0
        while (j < projection.length) {
          val s = at(projection(j))
          vals(j) = if (s == null) null else UTF8String.fromString(s)
          j += 1
        }
        row = new GenericInternalRow(vals)
        return true
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
