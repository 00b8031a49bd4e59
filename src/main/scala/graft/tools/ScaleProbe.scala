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

  /** Synthesizes an sf1-equivalent documents table (10× the sf0.1
    * corpus) for the growth measurement ONLY — never for correctness
    * oracles. Each copy gets a rotated alphabet via `translate`: a
    * bijective character map preserves every within-copy shingle-set
    * relation exactly (same near-dup structure, same jaccard values)
    * and makes cross-copy LETTER shingles disjoint. Non-letter
    * characters (digits, spaces, punctuation) are fixed points of the
    * rotation, so shingles dominated by them ARE shared across copies
    * — verified-dup growth stays exactly linear on this corpus (its
    * texts are letter-word prose; measured 10.0× at 10 copies), while
    * candidate pairs pick up a cross-copy excess from those non-letter
    * shingles that the exact-verify step then rejects. SCALING.md
    * reports the measurement with that decomposition. */
  private[tools] def synthesize10x(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, outDir: String): Unit = {
    val base = Tables.documents(spark, srcDir)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val full = (0 until 10).map { c =>
      val rot = alpha.drop(c) + alpha.take(c)
      base.select(
        (col("doc_id") + lit(c.toLong * 1000000000L)).as("doc_id"),
        translate(col("text"), alpha + alpha.toUpperCase,
          rot + rot.toUpperCase).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    full.coalesce(4).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    // Embeddings 10×: each copy flips a deterministic sign pattern over
    // the dims (flip dim i in copy c iff bit (i mod 4) of c is set) — a
    // bijective isometry, so every within-copy cosine (and thus the
    // near-dup structure) is preserved exactly while copies land in
    // different quantizer cells. Growth of semanticDedup's within-cell
    // pair count on this corpus measures the corpus-scaled quantizer.
    val embBase = Tables.embeddings(spark, srcDir)
    val embFull = (0 until 10).map { c =>
      embBase.select(
        (col("vec_id") + lit(c.toLong * 1000000000L)).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> CAST(x * IF((($c >> (i % 4)) & 1) = 1, " +
          "CAST(-1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) AS FLOAT))").as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    embFull.coalesce(4).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "synth10:/tmp/graft-sf1equiv")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Graft.defaultCores.toString)
    val spark = Graft.builder(s"local[$cpus]", math.min(8, cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"${"sf_dir"}%-28s ${"docs"}%8s ${"band_rows"}%10s ${"cand_pairs"}%11s ${"dup_pairs"}%10s ${"cand/doc"}%9s")
    dirs.foreach { spec =>
      val dir = if (spec.startsWith("synth10:")) {
        val out = spec.stripPrefix("synth10:")
        synthesize10x(spark, "/root/testdata/sf0.1", out)
        out
      } else spec
      val docs = Tables.documents(spark, dir).count()
      val banded = graft.ext.Dedup.bandedPairsProbe(spark, dir)
      val bandRows = banded("band_rows")
      val cand = banded("cand_pairs")
      val dups = banded("dup_pairs")
      println(f"$dir%-28s $docs%8d $bandRows%10d $cand%11d $dups%10d ${cand.toDouble / docs}%9.3f")
      spark.catalog.clearCache()
    }
    // SemDeDup corpus-scaled quantizer: within-cell pair work must grow
    // ~linearly with the corpus (pairs/vec ~flat) — the round-5 claim.
    println()
    println(f"${"sf_dir"}%-28s ${"n_vecs"}%8s ${"cells"}%7s ${"within_pairs"}%13s ${"dropped"}%8s ${"pairs/vec"}%10s")
    dirs.foreach { spec =>
      val dir = if (spec.startsWith("synth10:")) spec.stripPrefix("synth10:") else spec
      val m = graft.ext.Dedup.semanticPairsProbe(spark, dir)
      println(f"$dir%-28s ${m("n_vecs")}%8d ${m("cells_used")}%7d ${m("within_pairs")}%13d " +
        f"${m("dropped")}%8d ${m("within_pairs").toDouble / m("n_vecs")}%10.3f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
