package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sink.Sinks

/** The V2 TSV connector ([[graft.sources.TsvSource]]) against the K2
  * sink it reads: round-trip, appends, pruning/pushdown, nulls. */
class TsvSourceSpec extends SparkSpec {

  private def newDir() =
    Files.createTempDirectory("graft_tsv_src").toString

  private def writeSample(dir: String): Unit = {
    import spark.implicits._
    Sinks.writeTsv(Seq(
      ("a", "1", "x"), ("b", "2", "y"), ("c", "3", "z"))
      .toDF("k", "v", "tag"), dir)
  }

  test("round-trips the K2 sink layout with schema from the header file") {
    val dir = newDir()
    writeSample(dir)
    val df = spark.read.format("graft-tsv").load(dir)
    assert(df.schema.fieldNames.toSeq === Seq("k", "v", "tag"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() === 3)
    assert(df.filter(col("k") === "b").select("v").collect().map(_.getString(0)).toSeq === Seq("2"))
  }

  test("appended parts are all read; header appears exactly once") {
    import spark.implicits._
    val dir = newDir()
    writeSample(dir)
    Sinks.writeTsv(Seq(("d", "4", "w")).toDF("k", "v", "tag"), dir)
    val df = spark.read.format("graft-tsv").load(dir)
    assert(df.count() === 4)
    // no header row leaked into the data
    assert(df.filter(col("k") === "k").count() === 0)
  }

  test("column pruning and filter pushdown reach the scan") {
    val dir = newDir()
    writeSample(dir)
    val q = spark.read.format("graft-tsv").load(dir)
      .filter(col("k") === "b").select("v")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTsvScan"), plan)
    assert(plan.contains("pushed=[EqualTo(k,b)") ||
      plan.contains("pushed=[IsNotNull(k), EqualTo(k,b)"), plan)
    // pruned read schema: only the filter + projection columns survive
    assert(plan.contains("columns=[") && !plan.contains("tag"), plan)
    assert(q.collect().map(_.getString(0)).toSeq === Seq("2"))
  }

  test("empty fields read back as nulls; IsNotNull pushes down") {
    import spark.implicits._
    val dir = newDir()
    Sinks.writeTsv(Seq(("a", null), ("b", "2"), ("c", null))
      .toDF("k", "v"), dir)
    val df = spark.read.format("graft-tsv").load(dir)
    assert(df.filter(col("v").isNull).count() === 2)
    val nn = df.filter(col("v").isNotNull)
    assert(nn.count() === 1)
    assert(nn.queryExecution.executedPlan.toString.contains("IsNotNull(v)"))
  }

  test("one input partition per data file; optimizer sees the size") {
    import spark.implicits._
    val dir = newDir()
    writeSample(dir)
    Sinks.writeTsv(Seq(("d", "4", "w")).toDF("k", "v", "tag"), dir)
    val df = spark.read.format("graft-tsv").load(dir)
    assert(df.rdd.getNumPartitions >= 2) // two appends -> >= 2 part files
    // SupportsReportStatistics surfaces the real byte size to the
    // optimizer (asserted on the plan stats, not on join strategy —
    // concurrent suites toggle the broadcast threshold on the shared
    // session, so strategy choice here would be racy)
    val stats = df.queryExecution.optimizedPlan.stats
    val onDisk = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && f.getName != "00000-header.tsv")
      .map(_.length).sum
    assert(stats.sizeInBytes.toLong > 0L)
    assert(stats.sizeInBytes.toLong <= onDisk * 10) // size-derived, not the 8 EiB default
  }

  test("V2 write: append publishes committed parts and a header once") {
    import spark.implicits._
    val dir = newDir()
    Seq(("a", 1L, 1.5, true), ("b", 2L, 2.5, false))
      .toDF("k", "n", "x", "flag")
      .write.format("graft-tsv").mode("append").save(dir)
    Seq(("c", 3L, 3.5, true)).toDF("k", "n", "x", "flag")
      .write.format("graft-tsv").mode("append").save(dir)
    val back = spark.read.format("graft-tsv").load(dir)
    assert(back.schema.fieldNames.toSeq === Seq("k", "n", "x", "flag"))
    assert(back.count() === 3)
    // typed values rendered as text
    val row = back.filter(col("k") === "b").collect()(0)
    assert(row.getString(1) === "2" && row.getString(2) === "2.5" && row.getString(3) === "false")
    // no temp files survive the commit
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(!files.exists(_.startsWith("_tmp_")), files.mkString(","))
    assert(files.count(_ == "00000-header.tsv") === 1)
  }

  test("V2 write: overwrite truncates previous parts") {
    import spark.implicits._
    val dir = newDir()
    Seq(("old", "1")).toDF("k", "v").write.format("graft-tsv").mode("append").save(dir)
    Seq(("new", "2")).toDF("k", "v").write.format("graft-tsv").mode("overwrite").save(dir)
    val back = spark.read.format("graft-tsv").load(dir)
    assert(back.collect().map(_.getString(0)).toSeq === Seq("new"))
  }

  test("V2 write: nulls round-trip as empty fields; unrenderable types refused") {
    import spark.implicits._
    val dir = newDir()
    Seq(("a", null), ("b", "2")).toDF("k", "v")
      .write.format("graft-tsv").mode("append").save(dir)
    val back = spark.read.format("graft-tsv").load(dir)
    assert(back.filter(col("v").isNull).count() === 1)
    val err = intercept[Exception] {
      Seq(("a", java.sql.Date.valueOf("2024-01-01"))).toDF("k", "d")
        .write.format("graft-tsv").mode("append").save(newDir())
    }
    assert(err.getMessage.contains("cast to string"), err.getMessage)
  }

  test("V2 write interoperates with the Sinks.writeTsv layout") {
    import spark.implicits._
    val dir = newDir()
    Sinks.writeTsv(Seq(("a", "1")).toDF("k", "v"), dir)
    Seq(("b", "2")).toDF("k", "v")
      .write.format("graft-tsv").mode("append").save(dir)
    val back = spark.read.format("graft-tsv").load(dir)
    assert(back.collect().map(r => (r.getString(0), r.getString(1))).toSet
      === Set(("a", "1"), ("b", "2")))
  }

  test("V2 write: append with a mismatched schema is refused at plan time") {
    import spark.implicits._
    val dir = newDir()
    Seq(("a", "1")).toDF("k", "v").write.format("graft-tsv").mode("append").save(dir)
    // different column count
    val err1 = intercept[Exception] {
      Seq(("b", "2", "extra")).toDF("k", "v", "t")
        .write.format("graft-tsv").mode("append").save(dir)
    }
    assert(err1.getMessage.contains("does not match the existing header"), err1.getMessage)
    // same names, different order — would misalign silently without the check
    val err2 = intercept[Exception] {
      Seq(("2", "b")).toDF("v", "k")
        .write.format("graft-tsv").mode("append").save(dir)
    }
    assert(err2.getMessage.contains("does not match the existing header"), err2.getMessage)
    // overwrite replaces the header, so a new schema is legitimate there
    Seq(("b", "2", "t")).toDF("k", "v", "t")
      .write.format("graft-tsv").mode("overwrite").save(dir)
    assert(spark.read.format("graft-tsv").load(dir)
      .schema.fieldNames.toSeq === Seq("k", "v", "t"))
  }

  test("both writers refuse values the raw-split reader cannot round-trip") {
    import spark.implicits._
    // Spark wraps task failures (SparkException → cause → …); search the
    // whole cause chain for the refusal message
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    // v1 (CSV-writer path): tab would be quoted by the writer and then
    // silently corrupt on raw-split read — refused inside the write scan
    val e1 = intercept[Exception] {
      Sinks.writeTsv(Seq(("a\tb", "1")).toDF("k", "v"), newDir())
    }
    assert(chain(e1).contains("cannot represent"), chain(e1))
    // v1: embedded quote triggers CSV quoting → also refused
    val e2 = intercept[Exception] {
      Sinks.writeTsv(Seq(("a\"b", "1")).toDF("k", "v"), newDir())
    }
    assert(chain(e2).contains("cannot represent"), chain(e2))
    // V2 path: tab is structural → refused before publish, nothing visible
    val dir = newDir()
    val e3 = intercept[Exception] {
      Seq(("a\tb", "1")).toDF("k", "v")
        .write.format("graft-tsv").mode("append").save(dir)
    }
    assert(chain(e3).contains("cannot represent"), chain(e3))
    // V2 path: plain quote chars are NOT structural — verbatim round-trip
    val dir2 = newDir()
    Seq(("""say "hi"""", "1")).toDF("k", "v")
      .write.format("graft-tsv").mode("append").save(dir2)
    assert(spark.read.format("graft-tsv").load(dir2)
      .collect().map(_.getString(0)).toSeq === Seq("""say "hi""""))
  }

  test("v1 writer: empty string writes bare (collapses to the null token)") {
    import spark.implicits._
    val dir = newDir()
    Sinks.writeTsv(Seq(("a", ""), ("b", "2")).toDF("k", "v"), dir)
    val back = spark.read.format("graft-tsv").load(dir)
    // empty and null deliberately collapse in the untyped TSV layout;
    // before the emptyValue fix this row read back as literal `""`
    assert(back.filter(col("v").isNull).count() === 1)
    assert(back.filter(col("v") === "\"\"").count() === 0)
  }

  test("whole-pipeline: county rollup written to TSV and re-read intact") {
    val dir = newDir()
    val out = SparkEntry.queries("a1_county_rollup")(spark, "/root/testdata/sf0.001")
      .limit(50)
    Sinks.writeTsv(out.select(out.columns.map(c => col(c).cast("string")): _*), dir)
    val back = spark.read.format("graft-tsv").load(dir)
    assert(back.schema.fieldNames.toSeq === out.columns.toSeq)
    assert(back.count() === 50)
  }
}
