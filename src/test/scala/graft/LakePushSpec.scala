package graft

import org.apache.spark.sql.functions._

import graft.lake.Lake

/** The two round-10 DSv2 pushdown surfaces of the `graft-lake` format:
  *
  *  - MANIFEST-ONLY AGGREGATES ([[graft.sources.LakeManifestAggScan]]):
  *    an unfiltered, ungrouped COUNT(*)/MIN/MAX over stat-covered
  *    columns plans as a `LocalTableScan` of one pre-computed row —
  *    zero data files opened. At 100 TB that turns the dashboard's
  *    `SELECT count(*) FROM fact` from a full scan into a driver-side
  *    metadata lookup.
  *  - RUNTIME FILE SKIPPING ([[graft.sources.LakeScan]] via
  *    `SupportsRuntimeV2Filtering`): dynamic-pruning feeds the join
  *    keys observed in a reused broadcast back into the scan before
  *    partitions are planned, so a dimension filter landing on a
  *    narrow key band skips non-intersecting fact files at EXECUTION
  *    time — keys that exist in no static predicate.
  */
class LakePushSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshDir(tag: String): String = {
    val d = new java.io.File(graft.Scratch.root,
      s"graft-pushspec-$tag-${spark.sparkContext.applicationId}")
    graft.Scratch.rm(d)
    d.getAbsolutePath
  }

  private def physical(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
  }

  test("unfiltered count/min/max answer from the manifest: LocalTableScan, no file scan") {
    val dir = freshDir("aggpush")
    val orders = Tables.orders(spark, sf)
    Lake.create(orders, dir, "o_orderkey", targetFiles = 6)
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("aggpush_lake")
    val q = spark.sql(
      """SELECT count(*) AS n, min(o_orderkey) AS lo, max(o_orderkey) AS hi
        |FROM aggpush_lake""".stripMargin)
    val r = q.head()
    val (n, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n === orders.count())
    assert(lo === orders.agg(min("o_orderkey")).head().getLong(0))
    assert(hi === orders.agg(max("o_orderkey")).head().getLong(0))
    val phys = physical(q)
    assert(phys.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec]),
      s"manifest aggregate must plan as LocalTableScan only:\n$phys")
    assert(!phys.toString.contains("BatchScan"),
      s"no data file may be scanned for a manifest-answerable aggregate:\n$phys")
  }

  test("a WHERE clause or unsupported function blocks the pushdown but stays correct") {
    val dir = freshDir("aggblock")
    val orders = Tables.orders(spark, sf)
    Lake.create(orders, dir, "o_orderkey", targetFiles = 4)
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("aggblock_lake")
    // filtered: conjuncts stay post-scan, so the rewrite must not fire
    val filtered = spark.sql(
      "SELECT count(*) AS n FROM aggblock_lake WHERE o_orderkey % 2 = 0")
    assert(filtered.head().getLong(0) ===
      orders.filter(col("o_orderkey") % 2 === 0).count())
    assert(physical(filtered).toString.contains("BatchScan"),
      "a filtered aggregate must scan (all conjuncts are post-scan residue)")
    // sum() is not manifest-answerable: no pushdown, full-scan answer
    val summed = spark.sql(
      "SELECT CAST(sum(o_orderkey) AS BIGINT) AS s FROM aggblock_lake")
    assert(summed.head().getLong(0) ===
      orders.agg(sum("o_orderkey").cast("long")).head().getLong(0))
    assert(physical(summed).toString.contains("BatchScan"),
      "sum() must not be answered from min/max stats")
    // min over a column with NO manifest stat (non-key): full scan
    val statless = spark.sql(
      "SELECT min(o_custkey) AS m FROM aggblock_lake")
    assert(statless.head().getLong(0) ===
      orders.agg(min("o_custkey")).head().getLong(0))
    assert(physical(statless).toString.contains("BatchScan"),
      "a stat-less column must not be answered from the manifest")
  }

  test("unfiltered LIMIT opens only a file prefix holding enough rows") {
    val dir = freshDir("limitpush")
    val orders = Tables.orders(spark, sf)
    Lake.create(orders, dir, "o_orderkey", targetFiles = 8)
    graft.sources.LakeScan.lastLimitPrune.set(null)
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("limitpush_lake")
    val n = spark.sql(
      "SELECT count(*) AS n FROM (SELECT * FROM limitpush_lake LIMIT 100)")
      .head().getLong(0)
    assert(n === 100L)
    val prune = graft.sources.LakeScan.lastLimitPrune.get()
    assert(prune != null, "limit pushdown never reached the scan builder")
    val (prunedDir, total, kept) = prune
    assert(prunedDir === dir && total === 8)
    assert(kept === 1, s"100 rows must come from one ~${orders.count() / 8}-row file, kept $kept")
    // a WHERE blocks the pushdown (every conjunct is post-scan residue)
    graft.sources.LakeScan.lastLimitPrune.set(null)
    val filtered = spark.sql(
      """SELECT count(*) AS n FROM
        |  (SELECT * FROM limitpush_lake WHERE o_totalprice > 0 LIMIT 100)""".stripMargin)
      .head().getLong(0)
    assert(filtered === 100L)
    assert(graft.sources.LakeScan.lastLimitPrune.get() == null,
      "a filtered LIMIT must not prune files (the filter is post-scan)")
    // a limit larger than the table keeps every file and all rows
    graft.sources.LakeScan.lastLimitPrune.set(null)
    val all = spark.sql(
      s"SELECT count(*) AS n FROM (SELECT * FROM limitpush_lake LIMIT ${orders.count() * 2})")
      .head().getLong(0)
    assert(all === orders.count())
    val (_, t2, k2) = graft.sources.LakeScan.lastLimitPrune.get()
    assert(k2 === t2)
  }

  test("broadcast-join runtime filter skips fact files outside the dim key band") {
    val dir = freshDir("dpp")
    val orders = Tables.orders(spark, sf)
    Lake.create(orders, dir, "o_orderkey", targetFiles = 8)
    val sb = new graft.sources.LakeScanBuilder(spark, dir,
      Lake.latestVersion(dir), Lake.snapshotSchema(spark, dir))
    val f0 = sb.prunedFiles(Nil).minBy(_.minKey)
    // dim: keys confined to file 0's range, behind a NON-key filter —
    // statically invisible to the fact side, only DPP can prune on it
    val dimPath = freshDir("dppdim")
    orders.filter(col("o_orderkey").between(f0.minKey, f0.maxKey))
      .select(col("o_orderkey").as("d_orderkey"))
      .withColumn("d_flag", lit("keep"))
      .write.parquet(dimPath)
    val lake = spark.read.format("graft-lake").option("path", dir).load()
    val dim = spark.read.parquet(dimPath).filter(col("d_flag") === "keep")
    graft.sources.LakeScan.lastRuntimeFilter.set(null)
    val joined = lake.join(broadcast(dim),
        col("o_orderkey") === col("d_orderkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey")).cast("long").as("keysum"))
    val r = joined.head()
    val expect = orders
      .filter(col("o_orderkey").between(f0.minKey, f0.maxKey))
    assert(r.getLong(0) === expect.count())
    assert(r.getLong(1) ===
      expect.agg(sum("o_orderkey").cast("long")).head().getLong(0))
    val pruneState = graft.sources.LakeScan.lastRuntimeFilter.get()
    assert(pruneState != null,
      "dynamic pruning never reached LakeScan.filter — check the DPP plan")
    val (prunedDir, before, after) = pruneState
    assert(prunedDir === dir)
    assert(after < before,
      s"runtime keys confined to one file's band must skip files ($before -> $after)")
    assert(after >= 1)
  }

  /** Extract the (single) LakeScan the optimizer built for `df` —
    * post-pushdown, so its entry list reflects static file pruning. */
  private def lakeScanOf(df: org.apache.spark.sql.DataFrame): graft.sources.LakeScan = {
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan
    }.collect { case s: graft.sources.LakeScan => s }
    assert(scans.size === 1, s"expected one LakeScan, got ${scans.size}")
    scans.head
  }

  test("pruning-aware scan statistics drive a hint-free auto-broadcast") {
    val dir = freshDir("stats")
    val orders = Tables.orders(spark, sf)
    Lake.create(orders, dir, "o_orderkey", targetFiles = 8)
    val full = spark.read.format("graft-lake").option("path", dir).load()
    val fullStats = lakeScanOf(full).estimateStatistics()
    assert(fullStats.numRows.getAsLong === orders.count(),
      "unfiltered row estimate must equal the manifest row sum")
    val maxKey = orders.agg(max("o_orderkey")).head().getLong(0)
    val pruned = full.filter(col("o_orderkey") <= maxKey / 8)
    val prunedStats = lakeScanOf(pruned).estimateStatistics()
    assert(prunedStats.numRows.getAsLong < fullStats.numRows.getAsLong,
      "a selective key predicate must shrink the row estimate")
    val (loB, hiB) =
      (prunedStats.sizeInBytes.getAsLong, fullStats.sizeInBytes.getAsLong)
    assert(loB < hiB, s"pruned bytes $loB must undercut full bytes $hiB")

    // differential broadcast: a threshold BETWEEN the two estimates
    // broadcasts the pruned dimension and refuses the full one — so
    // the decision provably flows from the reported statistics, not
    // from tiny test data. Static plans (sparkPlan, pre-AQE) isolate
    // the estimate-driven choice from AQE's runtime-size rescue.
    val factPath = freshDir("statsfact")
    Tables.lineitem(spark, sf)
      .withColumnRenamed("l_orderkey", "f_orderkey").write.parquet(factPath)
    val fact = spark.read.parquet(factPath)
    val threshold = (loB + hiB) / 2
    val factBytes = new java.io.File(factPath).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    assert(factBytes > threshold,
      s"fact ($factBytes B) must exceed the threshold ($threshold B) or it broadcasts itself")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
      def staticPlan(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.sparkPlan.toString
      val small = fact.join(pruned, col("f_orderkey") === col("o_orderkey"))
      assert(staticPlan(small).contains("BroadcastHashJoin"),
        s"pruned dim ($loB B < $threshold B) must auto-broadcast:\n${staticPlan(small)}")
      val big = fact.join(full, col("f_orderkey") === col("o_orderkey"))
      assert(!staticPlan(big).contains("BroadcastHashJoin"),
        s"full dim ($hiB B > $threshold B) must not broadcast:\n${staticPlan(big)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
