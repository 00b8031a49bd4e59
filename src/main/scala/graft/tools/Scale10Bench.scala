package graft.tools

import org.apache.spark.sql.functions._

import graft.{Graft, SparkEntry, Tables}

/** Full-surface 10× growth bench (round-5 stretch): synthesizes a
  * COMPLETE sf1-equivalent directory — every table, not just documents
  * — runs every registered query against it, and prints per-query wall
  * seconds for SCALING.md's growth table. A query whose time grows
  * super-linearly vs its sf0.1 bench number gets a plan audit
  * (documented quadratic baselines excepted).
  *
  * Synthesis shape = the realistic scale-up: FACT tables grow 10×
  * (lineitem/orders with order keys shifted per copy so the
  * order↔lineitem join structure is preserved; events with shifted
  * event ids — users simply become 10× more active), DIMENSIONS stay
  * fixed (customer/supplier/part/nation/region — broadcast sides must
  * stay broadcastable, that is the design point being tested), and
  * documents/embeddings use [[ScaleProbe]]'s structure-preserving
  * isometry copies. Synthetic data is for this measurement ONLY, never
  * for correctness oracles.
  *
  * Run: SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.Scale10Bench"
  */
object Scale10Bench {

  private val KeyShift = 1000000000L

  private[tools] def synthesizeFull(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, outDir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      Tables.read(spark, srcDir, t)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    def facts10x(name: String, shiftCols: Seq[String]): Unit = {
      val base = Tables.read(spark, srcDir, name)
      (0 until 10).map { c =>
        shiftCols.foldLeft(base)((df, sc) =>
          df.withColumn(sc, col(sc) + lit(c * KeyShift)))
      }.reduce(_ unionByName _)
        .coalesce(8).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
    facts10x("lineitem", Seq("l_orderkey"))
    facts10x("orders", Seq("o_orderkey"))
    facts10x("events", Seq("event_id"))
    ScaleProbe.synthesize10x(spark, srcDir, outDir)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = if (args.nonEmpty) args(0) else "/tmp/graft-sf1full"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Graft.defaultCores.toString)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", math.min(8, cpus.toInt).toString)
    val spark = Graft.builder(s"local[$cpus]", shuffle.toInt)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    synthesizeFull(spark, srcDir, outDir)
    // codegen warm-up at the smallest SF (same rationale as Bench)
    val warmSf = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmSf).count() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, outDir).count(); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      println(f"[scale10] $name%-24s ${if (ok) f"$dt%8.2f s" else "FAILED"}")
      (name, dt, ok)
    }
    val total = results.collect { case (_, t, true) => t }.sum
    val errs = results.collect { case (n, _, false) => "\"" + n + "\"" }.mkString("[", ",", "]")
    def fmt(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.sortBy(-_._2)
      .map { case (n, t, ok) => "\"" + n + "\":" + (if (ok) fmt(t) else "-1.0") }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale10_total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"errors":$errs,"queries":$qs}""")
    spark.stop()
  }
}
