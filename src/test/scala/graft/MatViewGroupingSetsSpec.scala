package graft

import org.apache.spark.sql.functions._

import graft.lake.{Lake, MatView}

/** ROLLUP / CUBE / GROUPING SETS served from materialized views
  * ([[graft.plans.MatViewRewrite]] Expand-matching branch): the
  * analyzer's `Aggregate(groups :+ gid, Expand(...))` shape collapses
  * to a union of per-set register rollups over the view. Expected
  * values always come from [[Lake.read]] (a V1 plan the rule can never
  * match). */
class MatViewGroupingSetsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshDir(tag: String): String = {
    val d = new java.io.File(graft.Scratch.root,
      s"graft-mvgsspec-$tag-${spark.sparkContext.applicationId}")
    graft.Scratch.rm(d)
    d.getAbsolutePath
  }

  private def buildSource(tag: String): String = {
    val dir = freshDir(tag)
    val orders = Tables.orders(spark, sf)
      .withColumn("o_cents",
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        col("o_orderstatus"), col("o_cents"))
    Lake.create(orders, dir, "o_orderkey", targetFiles = 4)
    dir
  }

  private def lakeDf(src: String) = {
    org.apache.spark.sql.GraftSqlShim.addOptimization(
      spark, graft.plans.MatViewRewrite)
    spark.read.format("graft-lake").option("path", src).load()
  }

  private def kindOf(df: org.apache.spark.sql.DataFrame,
      src: String): String = {
    MatView.lastRewrite.set(null)
    df.queryExecution.optimizedPlan
    Option(MatView.lastRewrite.get()) match {
      case Some((d, k)) if d == src => k
      case _ => "none"
    }
  }

  private def scannedTables(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.relation.table.name
    }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq.map(v => if (v == null) "∅" else v.toString))
      .sortBy(_.mkString("|")).toSeq

  test("ROLLUP serves as a union of per-set register rollups, gid included") {
    val src = buildSource("rollup")
    MatView.define(spark, src, src + "-view",
      Seq("o_orderpriority", "o_orderstatus"), Seq("o_cents"))
    try {
      def q(df: org.apache.spark.sql.DataFrame) =
        df.rollup(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("o_cents")).as("cents"),
            grouping_id().as("gid"))
      val served = q(lakeDf(src))
      assert(kindOf(served, src) === "direct-gsets")
      val tables = scannedTables(served)
      assert(tables.exists(_.contains("-view")) &&
        !tables.exists(t => t.contains(src) && !t.contains("-view")),
        s"must scan only the view, scanned: $tables")
      assert(sortedRows(served) === sortedRows(q(Lake.read(spark, src))))
    } finally MatView.unregister(src)
  }

  test("CUBE with grouping() flags, avg, and extrema") {
    val src = buildSource("cube")
    MatView.define(spark, src, src + "-view",
      Seq("o_orderpriority", "o_orderstatus"), Seq("o_cents"))
    try {
      def q(df: org.apache.spark.sql.DataFrame) =
        df.cube(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("o_cents")).as("cents"),
            avg(col("o_cents")).as("avg_cents"),
            min(col("o_cents")).as("min_cents"),
            max(col("o_cents")).as("max_cents"),
            grouping(col("o_orderstatus")).as("st_total"))
      val served = q(lakeDf(src))
      assert(kindOf(served, src) === "direct-gsets")
      assert(sortedRows(served) === sortedRows(q(Lake.read(spark, src))))
    } finally MatView.unregister(src)
  }

  test("SQL GROUPING SETS with an explicit empty set") {
    val src = buildSource("sets")
    MatView.define(spark, src, src + "-view",
      Seq("o_orderpriority", "o_orderstatus"), Seq("o_cents"))
    try {
      lakeDf(src).createOrReplaceTempView("gs_t")
      def sqlQ = spark.sql(
        """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
          |  sum(o_cents) AS cents
          |FROM gs_t
          |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
          |  (o_orderstatus), ())""".stripMargin)
      val served = sqlQ
      assert(kindOf(served, src) === "direct-gsets")
      Lake.read(spark, src).createOrReplaceTempView("gs_raw")
      val expected = spark.sql(
        """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
          |  sum(o_cents) AS cents
          |FROM gs_raw
          |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
          |  (o_orderstatus), ())""".stripMargin)
      assert(sortedRows(served) === sortedRows(expected))
    } finally MatView.unregister(src)
  }

  test("stale ROLLUP compensates through updates and deletes (no extrema)") {
    val src = buildSource("stale")
    MatView.define(spark, src, src + "-view",
      Seq("o_orderpriority", "o_orderstatus"), Seq("o_cents"))
    try {
      val cur = Lake.read(spark, src)
      val maxKey = cur.agg(max(col("o_orderkey"))).head().getLong(0)
      Lake.upsert(spark, src,
        cur.filter(col("o_orderkey") <= maxKey / 10)
          .withColumn("o_cents", col("o_cents") * 2))
      Lake.delete(spark, src,
        cur.filter(col("o_orderkey") > maxKey / 10 &&
          col("o_orderkey") <= maxKey / 5).select(col("o_orderkey")))
      def q(df: org.apache.spark.sql.DataFrame) =
        df.rollup(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("o_cents")).as("cents"))
      val served = q(lakeDf(src))
      assert(kindOf(served, src) === "compensated-gsets")
      assert(sortedRows(served) === sortedRows(q(Lake.read(spark, src))))
      // extrema over a delete-bearing slice serve too (round 14): the
      // touched groups re-derive min/max from the fact restricted to
      // those groups, and the rollup takes min-of-mins above
      def qx(df: org.apache.spark.sql.DataFrame) =
        df.rollup(col("o_orderpriority"))
          .agg(min(col("o_cents")).as("mn"))
      val servedX = qx(lakeDf(src))
      assert(kindOf(servedX, src) === "compensated-gsets")
      assert(sortedRows(servedX) === sortedRows(qx(Lake.read(spark, src))))
    } finally MatView.unregister(src)
  }

  test("empty filtered input yields ZERO rows — grand total included") {
    val src = buildSource("empty")
    MatView.define(spark, src, src + "-view",
      Seq("o_orderpriority", "o_orderstatus"), Seq("o_cents"))
    try {
      def q(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("o_orderpriority") === "NO-SUCH")
          .rollup(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
      val served = q(lakeDf(src))
      assert(kindOf(served, src) === "direct-gsets")
      assert(served.count() === 0L)
      assert(q(Lake.read(spark, src)).count() === 0L) // direct agrees
    } finally MatView.unregister(src)
  }

  test("HAVING composes above the grouping-set rewrite") {
    val src = buildSource("having")
    MatView.define(spark, src, src + "-view",
      Seq("o_orderpriority", "o_orderstatus"), Seq("o_cents"))
    try {
      // a Filter over the Aggregate (HAVING): the substitution keeps
      // the aggregate's output exprIds, so the parent still resolves
      def q(df: org.apache.spark.sql.DataFrame) =
        df.rollup(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("o_cents")).as("cents"))
          .where(col("n") > 50L)
      val served = q(lakeDf(src))
      assert(kindOf(served, src) === "direct-gsets")
      assert(sortedRows(served) === sortedRows(q(Lake.read(spark, src))))
    } finally MatView.unregister(src)
  }

  test("ROLLUP over coarser date_trunc buckets serves from a day-grain view") {
    val dir = freshDir("buckets")
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("ts"), col("event_type"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("val_cents"))
    Lake.create(ev, dir, "event_id", targetFiles = 2)
    MatView.define(spark, dir, dir + "-view",
      Seq("day", "event_type"), Seq("val_cents"),
      derived = Seq("day" -> "date_trunc('day', ts)"))
    try {
      def q(df: org.apache.spark.sql.DataFrame) =
        df.rollup(date_trunc("week", col("ts")).as("wk"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("val_cents")).as("cents"))
      val served = q(lakeDf(dir))
      assert(kindOf(served, dir) === "direct-gsets")
      val tables = scannedTables(served)
      assert(!tables.exists(t => t.contains(dir) && !t.contains("-view")),
        s"must not scan the fact, scanned: $tables")
      assert(sortedRows(served) === sortedRows(q(Lake.read(spark, dir))))
      // an HOUR rollup is FINER than the day declaration: refuse
      val fine = lakeDf(dir)
        .rollup(date_trunc("hour", col("ts")), col("event_type"))
        .agg(count(lit(1)).as("n"))
      assert(kindOf(fine, dir) === "none")
    } finally MatView.unregister(dir)
  }

  test("refusals: undeclared grouping column, undeclared register") {
    val src = buildSource("refuse")
    MatView.define(spark, src, src + "-view",
      Seq("o_orderpriority"), Seq("o_cents"))
    try {
      val q1 = lakeDf(src).rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      assert(kindOf(q1, src) === "none")
      val q2 = lakeDf(src).rollup(col("o_orderpriority"))
        .agg(sum(col("o_custkey")).as("s"))
      assert(kindOf(q2, src) === "none")
    } finally MatView.unregister(src)
  }
}
