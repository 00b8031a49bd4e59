package graft

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.ingest.{RawReader, Staging}
import graft.schema.ContestSchema

/** S1/S2 staging (zip path exercised with a locally built archive —
  * no network in this environment) + S6 empty-schema frame. */
class StagingSpec extends SparkSpec {

  private def makeZip(dir: File, entries: (String, String)*): File = {
    val zf = new File(dir, "bundle.zip")
    val z = new ZipOutputStream(new FileOutputStream(zf))
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    zf
  }

  test("S2: unzip extracts entries and deletes the archive") {
    val dir = Files.createTempDirectory("graft_zip").toFile
    val zf = makeZip(dir,
      "a.csv" -> "County,Total Votes\nWAKE,10\n",
      "b.csv" -> "County,Total Votes\nDURHAM,20\n")
    val files = Staging.unzipAndDelete(zf)
    assert(files.map(_.getName).toSet === Set("a.csv", "b.csv"))
    assert(!zf.exists())
    // staged dir feeds straight into the distributed reader
    val df = RawReader.readDir(spark, dir.getPath)
    assert(df.count() === 2)
  }

  test("S2: zip-slip entries are rejected") {
    val dir = Files.createTempDirectory("graft_zipslip").toFile
    val zf = makeZip(dir, "../evil.csv" -> "x\n1\n")
    intercept[IllegalArgumentException] { Staging.unzipAndDelete(zf) }
  }

  test("S6: empty frame has the full grand schema and zero rows") {
    val e = ContestSchema.emptyFrame(spark)
    assert(e.schema === ContestSchema.precinct)
    assert(e.count() === 0)
    // and works as a union skeleton
    import spark.implicits._
    val df = Seq(("WAKE", 5L)).toDF("county", "total_votes")
    val aligned = e.unionByName(df, allowMissingColumns = true)
    assert(aligned.count() === 1)
    assert(aligned.columns.toSeq === ContestSchema.precinctColumns)
  }
}
