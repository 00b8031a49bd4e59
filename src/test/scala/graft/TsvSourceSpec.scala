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
    // small TSV side gets broadcast in a join thanks to reported stats
    val dim = df.select(col("k"), col("tag"))
    val fact = Seq(("a", 10L), ("b", 20L)).toDF("k", "n")
    val plan = fact.join(dim, "k").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
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
