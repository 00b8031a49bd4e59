package graft.ingest

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.SchemaAlign
import graft.schema.ContestSchema

/** S4 + S5 — raw CSV/TSV scan and multi-file union
  * (/root/reference/ingestor_precinct.py:109-113).
  *
  * Reference behavior: glob a directory, per-file delimiter sniff,
  * `pd.read_csv(f, sep, na_values='Not Found')`, then concat.
  *
  * Spark mapping:
  *  - same-delimiter directories: ONE distributed `spark.read.csv(dir)`
  *    call (splittable, parallel by file/block) with the sep sniffed
  *    from the first file — the fast path at 100 TB;
  *  - mixed delimiters / differing headers: per-file reads unioned by
  *    name (`unionByName(allowMissingColumns=true)` semantics via
  *    [[SchemaAlign]] when a target schema is known).
  *
  * `"Not Found"` → null is the reference's na_values token (:112).
  * Schema inference is per the reference; production ingest should pass
  * an explicit schema (SURVEY.md §1.4).
  */
object RawReader {

  val NullToken = "Not Found"

  def readCsv(spark: SparkSession, path: String, sep: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("nullValue", NullToken)
      .option("inferSchema", "true")
      .csv(path)

  /** Glob + per-file sniff + union-by-name, like the reference loop.
    * Fast-paths to a single multi-file scan when all seps agree and
    * headers match — decided from the FIRST LINE of each file
    * (driver-side, metadata cost), never by eagerly scanning the data
    * for schema inference just to compare column names. */
  def readDir(spark: SparkSession, dir: String): DataFrame = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getPath).sorted
    require(files.nonEmpty, s"no input files in $dir")
    val seps = files.map(Sniffer.sniffFile)
    def header(path: String, sep: String): Seq[String] = {
      val reader = java.nio.file.Files.newBufferedReader(java.nio.file.Paths.get(path))
      try Option(reader.readLine()).getOrElse("").split(java.util.regex.Pattern.quote(sep), -1).toSeq
      finally reader.close()
    }
    val headers = files.zip(seps).map { case (f, s) => header(f, s) }
    if (seps.distinct.length == 1 && headers.distinct.length == 1)
      readCsv(spark, dir, seps.head) // one distributed scan
    else
      files.zip(seps).map { case (f, s) => readCsv(spark, f, s) }
        .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Full reference ingest read: directory → aligned precinct frame. */
  def readAligned(spark: SparkSession, dir: String): DataFrame =
    SchemaAlign(readDir(spark, dir), ContestSchema.precinct)
}
