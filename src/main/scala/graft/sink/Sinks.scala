package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** K1/K2 — the reference's sinks
  * (/root/reference/ingestor_precinct.py:186-218).
  *
  * K1: typed JDBC append (`to_sql(..., if_exists='append', dtype=…)`).
  * Spark-first: `df.write.jdbc` with `createTableColumnTypes` carrying
  * the explicit column types the reference declares. Exercised
  * end-to-end (append → read-back → type assert) against embedded
  * Derby in SinksSpec — no network, the derby jars ship with Spark;
  * the driver correctness path stays parquet-based (SURVEY.md §7.2).
  *
  * K2: the reference's commented-out TSV append sink (:186-191).
  */
object Sinks {

  /** Fragment for `createTableColumnTypes` from a StructType. The
    * strings must be SPARK SQL type names (the option is parsed with
    * the Catalyst schema parser, then rendered per JDBC dialect) —
    * `TEXT`/`DOUBLE PRECISION` are not parsable here. String columns
    * are deliberately OMITTED so the dialect default applies
    * (Postgres → TEXT, exactly the reference's `sqltype.Text` intent;
    * Derby → CLOB): any VARCHAR(n) override would silently cap value
    * length and fail at insert time on the first longer row. */
  def columnTypes(schema: StructType): String =
    schema.fields.flatMap { f =>
      val t = f.dataType match {
        case StringType => None // dialect default: unbounded text
        case LongType => Some("BIGINT") // vote sums overflow INTEGER at scale
        case IntegerType => Some("INTEGER")
        case BooleanType => Some("BOOLEAN")
        case DateType => Some("DATE")
        case TimestampType => Some("TIMESTAMP")
        case DoubleType => Some("DOUBLE")
        case other => Some(other.sql)
      }
      t.map(tt => s"${f.name} $tt")
    }.mkString(", ")

  /** K1: typed JDBC append. Executors write partitions in parallel
    * (`numPartitions`/`batchsize` bound connection count and round
    * trips at scale). */
  def writeJdbc(df: DataFrame, url: String, table: String,
      user: String, password: String, batchSize: Int = 10000): Unit = {
    val w = df.write
      .mode("append")
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize)
    val types = columnTypes(df.schema)
    // all-string schemas produce an empty override list; an empty
    // option string is a parse error, so omit it entirely
    (if (types.nonEmpty) w.option("createTableColumnTypes", types) else w).save()
  }

  /** K2: TSV append sink with header-once semantics (reference:
    * `header=not os.path.exists(path)`). Spark's `header=true` stamps
    * a header into EVERY part file of every append, so instead the
    * data parts are always header-free (fully parallel writers) and
    * the header lives in its own one-line file, created on the first
    * append only. It is named to sort before the part files, so a
    * shell-glob concatenation of the directory (the way the
    * reference's single growing TSV is consumed) sees exactly one
    * header, first. */
  def writeTsv(df: DataFrame, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    val headerFile = new org.apache.hadoop.fs.Path(path, "00000-header.tsv")
    val firstWrite = !fs.exists(headerFile)
    // The layout's readers (shell-glob concat, graft-tsv V2 scan) split
    // raw lines on the delimiter with no quote handling, but Spark's CSV
    // writer QUOTES values containing tab/quote/CR/LF — such a value
    // would silently corrupt on read-back (wrong column count or literal
    // quote chars). Refuse it at write time instead, inside the write
    // scan itself (a codegen'd when/raise_error per string column — no
    // second pass over the data).
    val guarded = df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType != StringType) acc
      else acc.withColumn(f.name,
        when(col(f.name).rlike("[\\t\"\\n\\r]"), raise_error(concat(
          lit(s"writeTsv: column '${f.name}' contains a tab/quote/newline, " +
            "which the TSV layout cannot represent; clean or re-encode: "),
          col(f.name)))).otherwise(col(f.name)))
    }
    guarded.write
      .mode("append")
      .option("sep", "\t")
      .option("header", "false")
      // empty string IS the layout's null token: write it bare (the CSV
      // writer's default would emit a quoted "" the raw-split readers
      // can't decode) — empty and null deliberately collapse, as in any
      // untyped text format
      .option("emptyValue", "")
      .csv(dir)
    if (firstWrite) {
      val out = fs.create(headerFile, true)
      try out.write((df.schema.fieldNames.mkString("\t") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Output-layout hygiene: rewrite a dataframe into a bounded number
    * of range-clustered parquet files. The two sink failure modes at
    * 100 TB are small-file explosion (one file per task per partition
    * value) and giant skewed files; `repartitionByRange` on the sort
    * key bounds the file count, `maxRecordsPerFile` caps size, and the
    * within-file sort leaves row groups min/max-skippable for every
    * downstream range predicate on the key. */
  def compact(df: DataFrame, dir: String, files: Int, sortKeys: Seq[String],
      maxRecordsPerFile: Long = 1000000L): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(files, sortKeys.map(col): _*)
      .sortWithinPartitions(sortKeys.map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(dir)
  }

  /** Hive-style partitioned parquet layout with DYNAMIC partition
    * overwrite: only the partitions present in `df` are replaced;
    * everything else in `dir` survives. This is the idempotent
    * backfill/re-run primitive at 100 TB — a day's re-ingest rewrites
    * that day's directory, not the table — and the partition column
    * becomes a zero-IO pruning predicate for every downstream query
    * (`PartitionFilters` in the scan, no footer reads outside the
    * selected partitions). Keep partition cardinality in the
    * thousands, not millions: over-partitioning (e.g. on a high-card
    * key) recreates the small-file problem [[compact]] solves. */
  def writePartitioned(df: DataFrame, dir: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(dir)

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

  /** [[writeBucketed]] hardened for unattended re-runs: a killed JVM
    * leaves a managed table's LOCATION on disk with no catalog entry
    * (the in-memory metastore dies with the process), and the next
    * CREATE then fails LOCATION_ALREADY_EXISTS — so drop both the
    * catalog entry and any orphaned location first. This is the write
    * path the registered sketch-table lifecycle uses. */
  def replaceBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    val loc = new java.io.File(wh, table.toLowerCase(java.util.Locale.ROOT))
    if (loc.exists()) rm(loc)
    writeBucketed(df, table, buckets, keys)
  }
}
