package graft

import java.nio.file.Files

import graft.ingest.RawReader
import graft.ops.Normalize

/** RawReader's single-scan fast path + Normalize date fallback. */
class RawReaderFastPathSpec extends SparkSpec {

  test("S5 fast path: same delimiter + same header → one distributed scan") {
    val dir = Files.createTempDirectory("graft_fast").toFile
    Files.writeString(dir.toPath.resolve("a.csv"), "x,y\n1,2\n")
    Files.writeString(dir.toPath.resolve("b.csv"), "x,y\n3,4\n")
    val df = RawReader.readDir(spark, dir.getPath)
    assert(df.count() === 2) // header consumed per file
    // single FileScan over the directory (not a union of per-file plans)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"expected single scan, got:\n$plan")
  }

  test("P4: unparseable MM/dd/yyyy constant falls back to ISO") {
    import spark.implicits._
    val df = Seq(("w")).toDF("src")
    val out = Normalize(df, Seq("src" -> "a", "2012-11-06" -> "election_date"))
    assert(out.select("election_date").head().getDate(0)
      === java.sql.Date.valueOf("2012-11-06"))
    // garbage constant → null, not an ANSI error
    val out2 = Normalize(df, Seq("src" -> "a", "not a date" -> "election_date"))
    assert(out2.select("election_date").head().isNullAt(0))
  }
}
