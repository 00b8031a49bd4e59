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
  *
  * Filtered growth mode: a second arg of comma-separated name
  * prefixes (e.g. `x8_lake,x6_stream`) restricts the sweep to
  * matching queries AND times each of them min-of-2 at BOTH the
  * source sf and the 10× directory in the same session — same host,
  * same JVM, minutes apart — so the printed per-query growth ratios
  * are free of cross-session host-load skew. Run 1 at each sf pays
  * any shared-fixture memo build (lake history, stream source files,
  * BPE vocab — memos key on the data dir, so the two sfs never share
  * one); run 2 is the steady state the ratio is computed from.
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
    val prefixes: Option[Seq[String]] =
      if (args.length > 1) Some(args(1).split(",").toSeq.filter(_.nonEmpty)) else None
    val selected = SparkEntry.queries.toSeq
      .filter { case (n, _) => prefixes.forall(_.exists(n.startsWith)) }
      .sortBy(_._1)
    synthesizeFull(spark, srcDir, outDir)
    // codegen warm-up at the smallest SF (same rationale as Bench)
    val warmSf = "/root/testdata/sf0.001"
    selected.foreach { case (_, fn) =>
      try fn(spark, warmSf).count() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    def fmt(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, dir).count(); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      (dt, ok)
    }
    if (prefixes.isDefined) {
      // Growth mode: min-of-2 at source sf, then min-of-2 at 10×, one
      // family member at a time so the sf0.1/10× pair sits minutes
      // apart on an identically-loaded host.
      val rows = selected.map { case (name, fn) =>
        val (b1, okB1) = timeOnce(fn, srcDir)
        val (b2, okB2) = timeOnce(fn, srcDir)
        val (t1, okT1) = timeOnce(fn, outDir)
        val (t2, okT2) = timeOnce(fn, outDir)
        val ok = okB1 && okB2 && okT1 && okT2
        val base = math.min(b1, b2); val ten = math.min(t1, t2)
        println(f"[growth] $name%-24s base=${fmt(base)}%8s s (runs ${fmt(b1)},${fmt(b2)})  " +
          f"x10=${fmt(ten)}%8s s (runs ${fmt(t1)},${fmt(t2)})  " +
          (if (ok) f"growth=${fmt(ten / math.max(base, 0.005))}x" else "FAILED"))
        (name, base, ten, ok)
      }
      val errs = rows.collect { case (n, _, _, false) => "\"" + n + "\"" }.mkString("[", ",", "]")
      val qs = rows.sortBy(r => -r._3 / math.max(r._2, 0.005))
        .map { case (n, b, t, ok) =>
          "\"" + n + "\":" + (if (ok) s"""{"base":${fmt(b)},"x10":${fmt(t)},"growth":${fmt(t / math.max(b, 0.005))}}""" else "-1.0")
        }.mkString("{", ",", "}")
      println(s"""{"metric":"scale10_growth","n_queries":${rows.size},"errors":$errs,"queries":$qs}""")
    } else {
      val results = selected.map { case (name, fn) =>
        val (dt, ok) = timeOnce(fn, outDir)
        println(f"[scale10] $name%-24s ${if (ok) f"$dt%8.2f s" else "FAILED"}")
        (name, dt, ok)
      }
      val total = results.collect { case (_, t, true) => t }.sum
      val errs = results.collect { case (n, _, false) => "\"" + n + "\"" }.mkString("[", ",", "]")
      val qs = results.sortBy(-_._2)
        .map { case (n, t, ok) => "\"" + n + "\":" + (if (ok) fmt(t) else "-1.0") }
        .mkString("{", ",", "}")
      println(s"""{"metric":"scale10_total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"errors":$errs,"queries":$qs}""")
    }
    spark.stop()
  }
}
