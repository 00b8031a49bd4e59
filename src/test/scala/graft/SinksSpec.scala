package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.Sinks

/** K1 — typed JDBC append round-trip against EMBEDDED Derby (the
  * derby jars ship in /opt/spark/jars; zero network). This exercises
  * the reference's entire output path
  * (/root/reference/ingestor_precinct.py:192-218): create-on-first-
  * append, append-not-replace, and the declared column types.
  * K2 — TSV append sink header-once semantics. */
class SinksSpec extends SparkSpec {

  test("K1: jdbc append round-trips rows and types through Derby") {
    val home = Files.createTempDirectory("graft-derby").toString
    System.setProperty("derby.system.home", home)
    val url = s"jdbc:derby:$home/db;create=true"
    import spark.implicits._
    val df = Seq(
      ("ALAMANCE", "0001", 1234L, true, 0.25, "2012-11-06"),
      ("WAKE", "01-01", 98765L, false, 0.75, "2012-11-06"))
      .toDF("county", "precinct", "total_votes", "absentee", "turnout", "d")
      .withColumn("election_date", to_date(col("d"))).drop("d")
      // strings longer than any VARCHAR(n) cap: the dialect default
      // (CLOB on Derby, TEXT on Postgres) must hold unbounded text
      .withColumn("notes", concat_ws("", array_repeat(col("county"), 2000)))
    Sinks.writeJdbc(df, url, "precinct_results", "app", "app")
    Sinks.writeJdbc(df, url, "precinct_results", "app", "app") // append, not replace
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "precinct_results")
      .option("user", "app").option("password", "app").load()
    assert(back.count() === 4)
    val types = back.schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    assert(types("county") === StringType)
    assert(types("notes") === StringType) // CLOB → StringType, unbounded
    assert(types("total_votes") === LongType)
    assert(types("absentee") === BooleanType)
    assert(types("turnout") === DoubleType)
    assert(types("election_date") === DateType)
    assert(back.agg(sum(col("total_votes"))).head.getLong(0) === 2L * (1234L + 98765L))
    assert(back.agg(max(length(col("notes")))).head.getInt(0) === 16000)
  }

  test("K1: createTableColumnTypes renders the reference's Postgres DDL under PostgresDialect") {
    // The reference's actual target is Postgres (ingestor_precinct.py:
    // 192-218: sqltype.Text / Integer / Boolean / Date). Derby proves
    // the round trip; this pins the DDL the same option produces under
    // the Postgres dialect — no network needed: schemaString is
    // exactly what df.write.jdbc hands to CREATE TABLE.
    import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    import org.apache.spark.sql.jdbc.JdbcDialects
    val dialect = JdbcDialects.get("jdbc:postgresql://localhost:5432/elections")
    val schema = StructType(Seq(
      StructField("county", StringType),
      StructField("candidate", StringType),
      StructField("total_votes", LongType),
      StructField("winner_flag", IntegerType),
      StructField("has_primary", BooleanType),
      StructField("election_date", DateType)))
    val ddl = JdbcUtils.schemaString(dialect, schema, caseSensitive = false,
      Some(Sinks.columnTypes(schema)))
    def typeOf(colName: String): String = {
      val q = "\"" + colName + "\""
      ddl.split(",").map(_.trim).collectFirst {
        case c if c.startsWith(q) || c.startsWith(colName) =>
          c.stripPrefix(q).stripPrefix(colName).trim.split(" ")(0)
      }.getOrElse(fail(s"column $colName missing from DDL: $ddl"))
    }
    // strings are OMITTED from the override so the dialect default
    // applies — on Postgres that is TEXT, the reference's sqltype.Text
    // (a VARCHAR(n) override would cap value length at insert time)
    assert(typeOf("county") === "TEXT")
    assert(typeOf("candidate") === "TEXT")
    assert(typeOf("total_votes") === "BIGINT") // vote sums: reference Integer, widened
    assert(typeOf("winner_flag") === "INTEGER")
    assert(typeOf("has_primary") === "BOOLEAN")
    assert(typeOf("election_date") === "DATE")
  }

  test("K2: tsv sink writes the header exactly once across appends") {
    val dir = Files.createTempDirectory("graft-tsv").toString + "/out"
    import spark.implicits._
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    Sinks.writeTsv(df, dir)
    Sinks.writeTsv(df, dir)
    val lines = spark.read.textFile(dir).collect()
    assert(lines.count(_ == "k\tv") === 1, s"want exactly one header in ${lines.toSeq}")
    assert(lines.length === 5) // 1 header + 2×2 data rows
  }

  test("compact: bounded range-clustered files, rows preserved, no key overlap") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/orders"
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    Sinks.compact(orders, dir, files = 3, sortKeys = Seq("o_orderkey"))
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getPath).sorted
    assert(parts.length === 3)
    val back = spark.read.parquet(dir)
    assert(back.count() === orders.count())
    // range clustering: per-file key ranges are disjoint
    val ranges = parts.map { p =>
      val r = spark.read.parquet(p)
        .agg(min(col("o_orderkey")), max(col("o_orderkey"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlap in ${ranges.toSeq}")
      case _ =>
    }
  }

  test("format breadth: ORC and JSON round-trip the orders table losslessly") {
    val src = Tables.orders(spark, "/root/testdata/sf0.001")
      // JSON has no timestamp type — ISO strings survive both formats
      .withColumn("o_orderdate", date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
    for (fmt <- Seq("orc", "json")) {
      val dir = Files.createTempDirectory(s"graft-$fmt").toString + "/out"
      src.write.format(fmt).save(dir)
      val back = spark.read.format(fmt)
        .schema(src.schema) // pin the schema: JSON inference widens types
        .load(dir)
      assert(back.count() === src.count(), s"$fmt row count")
      assert(back.exceptAll(src).count() === 0, s"$fmt rows differ")
      assert(src.exceptAll(back).count() === 0, s"$fmt rows missing")
    }
  }

  test("partitioned write: dynamic overwrite replaces only the touched partition") {
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"))
    Sinks.writePartitioned(ev, dir, Seq("event_type"))
    val before = spark.read.parquet(dir)
    val clicksBefore = before.filter(col("event_type") === "click").count()
    val errorsBefore = before.filter(col("event_type") === "error").count()
    assert(clicksBefore > 0 && errorsBefore > 0)
    // rewrite ONLY the click partition, halved
    val halfClicks = ev.filter(col("event_type") === "click" && col("event_id") % 2 === 0)
    Sinks.writePartitioned(halfClicks, dir, Seq("event_type"))
    val after = spark.read.parquet(dir)
    assert(after.filter(col("event_type") === "click").count() ===
      ev.filter(col("event_type") === "click" && col("event_id") % 2 === 0).count())
    assert(after.filter(col("event_type") === "error").count() === errorsBefore) // untouched
    // the partition column prunes at plan time: only one directory scanned
    val plan = after.filter(col("event_type") === "error")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }
}
