package graft.tools

import org.apache.spark.sql.functions._

import graft.{Graft, Tables}

/** Measures how the MinHash+LSH near-dup path's candidate-pair count
  * grows with corpus size — the empirical backing for SCALING.md's
  * claim that banding keeps dedup ~linear in the corpus (the quadratic
  * exact-Jaccard query is only the verification baseline).
  *
  * For each sf dir given (default all three testdata scales) prints one
  * line: docs, total shingles, band rows, LSH candidate pairs (before
  * exact verification), verified near-dup pairs, and the
  * candidates-per-doc ratio — the number that must stay ~flat as the
  * corpus grows for the 100 TB story to hold.
  *
  * Run: sbt "runMain graft.tools.ScaleProbe" (results go in SCALING.md).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Graft.defaultCores.toString)
    val spark = Graft.builder(s"local[$cpus]", math.min(8, cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"${"sf_dir"}%-28s ${"docs"}%8s ${"band_rows"}%10s ${"cand_pairs"}%11s ${"dup_pairs"}%10s ${"cand/doc"}%9s")
    dirs.foreach { dir =>
      val docs = Tables.documents(spark, dir).count()
      val banded = graft.ext.Dedup.bandedPairsProbe(spark, dir)
      val bandRows = banded("band_rows")
      val cand = banded("cand_pairs")
      val dups = banded("dup_pairs")
      println(f"$dir%-28s $docs%8d $bandRows%10d $cand%11d $dups%10d ${cand.toDouble / docs}%9.3f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
