package graft

import org.apache.spark.sql.functions._

import graft.lake.Lake

/** STORAGE-PARTITIONED JOINS over `compactBucketed` lake tables: two
  * tables hash-bucketed alike on their leading keys report
  * `KeyGroupedPartitioning(bucket(n, key))` from their V2 scans
  * ([[graft.sources.LakeScan]]), the transform resolves against
  * [[graft.sources.GraftBucketFunction]] through the catalog, and the
  * join plans with ZERO exchanges on either side — at 100 TB, the
  * difference between shuffling both fact tables nightly and a
  * file-aligned merge. Also pins the layout bookkeeping: the bucket
  * stat survives the log, a non-bucketed write drops the property
  * (conservative fallback to shuffle, never a wrong answer), and
  * range-stat file skipping still works on the bucketed layout.
  */
class LakeSpjSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def ns(): (String, String) = {
    val wh = new java.io.File(graft.Scratch.root,
      s"graft-spjspec-${spark.sparkContext.applicationId}")
    wh.mkdirs()
    spark.conf.set("spark.sql.catalog.spjcat",
      classOf[graft.sources.LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjcat.warehouse", wh.getAbsolutePath)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjcat.spj")
    (wh.getAbsolutePath, "spjcat.spj")
  }

  private def physical(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("alike-bucketed tables join with zero exchanges and the right rows") {
    val (wh, n) = ns()
    spark.sql(s"DROP TABLE IF EXISTS $n.orders_b")
    spark.sql(s"DROP TABLE IF EXISTS $n.lagg_b")
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .createOrReplaceTempView("spj_orders_src")
    Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"))
      .createOrReplaceTempView("spj_lagg_src")
    spark.sql(s"CREATE TABLE $n.orders_b TBLPROPERTIES ('key'='o_orderkey') " +
      "AS SELECT * FROM spj_orders_src")
    spark.sql(s"CREATE TABLE $n.lagg_b TBLPROPERTIES ('key'='l_orderkey') " +
      "AS SELECT * FROM spj_lagg_src")
    Lake.compactBucketed(spark, s"$wh/spj/orders_b", 8)
    Lake.compactBucketed(spark, s"$wh/spj/lagg_b", 8)
    val q = spark.sql(
      s"""SELECT /*+ MERGE(o) */ o.o_orderkey, o.o_orderpriority, l.n_items
         |FROM $n.orders_b o JOIN $n.lagg_b l
         |  ON o.o_orderkey = l.l_orderkey""".stripMargin)
    val expect = spark.table("spj_orders_src").join(
      spark.table("spj_lagg_src"),
      col("o_orderkey") === col("l_orderkey"))
    assert(q.count() === expect.count())
    assert(q.agg(sum("n_items").cast("long")).head().getLong(0) ===
      expect.agg(sum("n_items").cast("long")).head().getLong(0))
    val phys = physical(q)
    val joins = phys.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
    assert(joins.nonEmpty, s"expected a sort-merge join:\n$phys")
    val exchanges = phys.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"storage-partitioned join must plan ZERO exchanges:\n$phys")
    // both scans grouped per bucket: 8 partitions each
    val scans = phys.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
    assert(scans.size === 2)
    scans.foreach(s => assert(s.inputRDD.getNumPartitions === 8,
      "each side must execute as one task per bucket"))
  }

  test("a later non-bucketed write drops the layout; readers fall back to shuffle") {
    val (wh, n) = ns()
    spark.sql(s"DROP TABLE IF EXISTS $n.orders_f")
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .createOrReplaceTempView("spj_fallback_src")
    spark.sql(s"CREATE TABLE $n.orders_f TBLPROPERTIES ('key'='o_orderkey') " +
      "AS SELECT * FROM spj_fallback_src WHERE o_orderkey % 2 = 0")
    val dir = s"$wh/spj/orders_f"
    Lake.compactBucketed(spark, dir, 4)
    assert(Lake.bucketLayout(Lake.manifest(dir, Lake.latestVersion(dir)))
      === Some(4))
    // an upsert writes fresh range-clustered files -> property drops
    Lake.upsert(spark, dir,
      spark.table("spj_fallback_src").filter(col("o_orderkey") % 2 =!= 0))
    assert(Lake.bucketLayout(Lake.manifest(dir, Lake.latestVersion(dir)))
      === None)
    // and the full row set is intact through the mixed layout
    assert(spark.sql(s"SELECT count(*) FROM $n.orders_f").head().getLong(0)
      === spark.table("spj_fallback_src").count())
  }

  test("CALL bucket(tbl, buckets) re-lays-out through SQL") {
    val (wh, n) = ns()
    spark.sql(s"DROP TABLE IF EXISTS $n.orders_p")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .createOrReplaceTempView("spj_proc_src")
    spark.sql(s"CREATE TABLE $n.orders_p TBLPROPERTIES ('key'='o_orderkey') " +
      "AS SELECT * FROM spj_proc_src")
    val v = spark.sql(
      s"CALL spjcat.bucket(tbl => 'spj.orders_p', buckets => 4)")
      .head().getLong(0)
    val dir = s"$wh/spj/orders_p"
    assert(v === Lake.latestVersion(dir))
    assert(Lake.bucketLayout(Lake.manifest(dir, v)) === Some(4))
  }

  test("bucket ids verify against HashPartitioning and range skipping survives") {
    val (wh, n) = ns()
    spark.sql(s"DROP TABLE IF EXISTS $n.orders_v")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .createOrReplaceTempView("spj_verify_src")
    spark.sql(s"CREATE TABLE $n.orders_v TBLPROPERTIES ('key'='o_orderkey') " +
      "AS SELECT * FROM spj_verify_src")
    val dir = s"$wh/spj/orders_v"
    Lake.compactBucketed(spark, dir, 8)
    val m = Lake.manifest(dir, Lake.latestVersion(dir))
    // every file's recorded bucket equals pmod(hash(key), 8) of its rows
    m.files.foreach { f =>
      val b = f.stats(s"__bucket_8")._1
      val distinct = spark.read.parquet(
          java.nio.file.Paths.get(dir, f.name).toString)
        .select(pmod(hash(col("o_orderkey")), lit(8)).cast("long").as("b"))
        .distinct().collect().map(_.getLong(0)).toSet
      assert(distinct === Set(b))
    }
    // key-range stats still prune: bucketed files carry min/maxKey
    val sb = new graft.sources.LakeScanBuilder(spark, dir,
      Lake.latestVersion(dir), Lake.snapshotSchema(spark, dir))
    val all = sb.prunedFiles(Nil)
    assert(all.size === m.files.size)
    // buckets hash-scatter keys, so a narrow range hits most files —
    // but an IMPOSSIBLE range must still prune everything
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{LessThan, Literal}
    assert(sb.prunedFiles(Seq(
      LessThan(UnresolvedAttribute("o_orderkey"), Literal(0L)))).isEmpty)
  }
}
