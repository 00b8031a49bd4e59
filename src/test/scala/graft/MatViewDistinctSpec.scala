package graft

import org.apache.spark.sql.functions._

import graft.lake.{Lake, MatView}

/** COUNT(DISTINCT) views ([[MatView.defineDistinct]] + the
  * [[graft.plans.MatViewRewrite]] value-grain branch): the one
  * aggregate the Σ-register family refuses, answered from a
  * (group × value)-grain aux table — fresh, stale-through-the-feed
  * (deletes included: min/max stay exact here, unlike plain views),
  * partial rollup, NULL exactness, filter transposition, refresh, and
  * the refusal cases. Expected values always come from [[Lake.read]]
  * (a V1 plan the rule can never match). */
class MatViewDistinctSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshDir(tag: String): String = {
    val d = new java.io.File(graft.Scratch.root,
      s"graft-mvdspec-$tag-${spark.sparkContext.applicationId}")
    graft.Scratch.rm(d)
    d.getAbsolutePath
  }

  private def buildSource(tag: String): String = {
    val dir = freshDir(tag)
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        col("o_orderstatus"))
    Lake.create(orders, dir, "o_orderkey", targetFiles = 4)
    dir
  }

  private def lakeDf(src: String) = {
    org.apache.spark.sql.GraftSqlShim.addOptimization(
      spark, graft.plans.MatViewRewrite)
    spark.read.format("graft-lake").option("path", src).load()
  }

  private def userAgg(src: String) =
    lakeDf(src).groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(col("o_custkey")).as("n_val"),
        count(lit(1)).as("n_rows"),
        sum(col("o_custkey")).as("sum_cust"),
        avg(col("o_custkey")).as("avg_cust"),
        min(col("o_custkey")).as("min_cust"),
        max(col("o_custkey")).as("max_cust"))

  private def expectedAgg(src: String) =
    Lake.read(spark, src).groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(col("o_custkey")).as("n_val"),
        count(lit(1)).as("n_rows"),
        sum(col("o_custkey")).as("sum_cust"),
        avg(col("o_custkey")).as("avg_cust"),
        min(col("o_custkey")).as("min_cust"),
        max(col("o_custkey")).as("max_cust"))

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

  private def rows(df: org.apache.spark.sql.DataFrame, order: String*) =
    df.orderBy(order.map(col): _*).collect().map(_.toSeq).toSeq

  test("fresh distinct view: the full x-aggregate family serves off the aux") {
    val src = buildSource("fresh")
    MatView.defineDistinct(spark, src, src + "-dview",
      Seq("o_orderpriority"), "o_custkey")
    try {
      val q = userAgg(src)
      assert(kindOf(q, src) === "direct-distinct")
      val tables = scannedTables(q)
      assert(tables.exists(_.contains("-dview")),
        s"plan must scan the distinct aux, scanned: $tables")
      assert(!tables.exists(t => t.contains(src) && !t.contains("-dview")),
        s"plan must not scan the source, scanned: $tables")
      assert(rows(q, "o_orderpriority") ===
        rows(expectedAgg(src), "o_orderpriority"))
    } finally MatView.unregisterDistinct(src + "-dview")
  }

  test("NULL values: all-NULL groups keep existence, counts and sums are NULL-exact") {
    import spark.implicits._
    val dir = freshDir("nulls")
    val df = Seq(
      (1L, "a", Some(10L)), (2L, "a", Some(10L)), (3L, "a", None),
      (4L, "b", None), (5L, "b", None), // all-NULL group
      (6L, "c", Some(7L)), (7L, "c", Some(9L)))
      .toDF("k", "grp", "x")
    Lake.create(df, dir, "k", targetFiles = 1)
    MatView.defineDistinct(spark, dir, dir + "-dview", Seq("grp"), "x")
    try {
      val q = lakeDf(dir).groupBy(col("grp"))
        .agg(countDistinct(col("x")).as("dct"), count(col("x")).as("nv"),
          count(lit(1)).as("n"), sum(col("x")).as("s"),
          min(col("x")).as("mn"), max(col("x")).as("mx"))
      assert(kindOf(q, dir) === "direct-distinct")
      val got = rows(q, "grp")
      assert(got === Seq(
        Seq("a", 1L, 2L, 3L, 20L, 10L, 10L),
        Seq("b", 0L, 0L, 2L, null, null, null),
        Seq("c", 2L, 2L, 2L, 16L, 7L, 9L)))
    } finally MatView.unregisterDistinct(dir + "-dview")
  }

  test("stale serve: feed compensation through updates AND deletes, min/max exact") {
    val src = buildSource("stale")
    MatView.defineDistinct(spark, src, src + "-dview",
      Seq("o_orderpriority"), "o_custkey", asOfVersion = 1L)
    try {
      val cur = Lake.read(spark, src)
      val maxKey = cur.agg(max(col("o_orderkey"))).head().getLong(0)
      // v2: re-point a band of orders at one shared customer (updates
      // that MOVE distinct values between aux rows)
      Lake.upsert(spark, src,
        cur.filter(col("o_orderkey") <= maxKey / 10)
          .withColumn("o_custkey", lit(1L)))
      // v3: delete a band — may remove group extrema, which a plain
      // view would refuse to serve stale; the aux recounts exactly
      Lake.delete(spark, src,
        cur.filter(col("o_orderkey") > maxKey / 10 &&
          col("o_orderkey") <= maxKey / 5).select(col("o_orderkey")))
      val q = userAgg(src)
      assert(kindOf(q, src) === "compensated-distinct")
      assert(rows(q, "o_orderpriority") ===
        rows(expectedAgg(src), "o_orderpriority"))
    } finally MatView.unregisterDistinct(src + "-dview")
  }

  test("partial rollup: subset grouping and the global distinct count") {
    val src = buildSource("rollup")
    // declared at priority × status grain; queries roll to priority / global
    MatView.defineDistinct(spark, src, src + "-dview",
      Seq("o_orderpriority", "o_orderstatus"), "o_custkey")
    try {
      val q1 = lakeDf(src).groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"))
      assert(kindOf(q1, src) === "direct-distinct-rollup")
      assert(rows(q1, "o_orderpriority") ===
        rows(Lake.read(spark, src).groupBy(col("o_orderpriority"))
          .agg(countDistinct(col("o_custkey")).as("n_cust")),
          "o_orderpriority"))
      val q2 = lakeDf(src)
        .agg(countDistinct(col("o_custkey")).as("n_cust"))
      assert(kindOf(q2, src) === "direct-distinct-rollup")
      assert(q2.head().getLong(0) ===
        Lake.read(spark, src)
          .agg(countDistinct(col("o_custkey"))).head().getLong(0))
    } finally MatView.unregisterDistinct(src + "-dview")
  }

  test("filters transpose: on a group column and on the distinct value itself") {
    val src = buildSource("filter")
    MatView.defineDistinct(spark, src, src + "-dview",
      Seq("o_orderpriority"), "o_custkey")
    try {
      val q = lakeDf(src)
        .filter(col("o_orderpriority") > "2" && col("o_custkey") % 2 === 0)
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_rows"))
      assert(kindOf(q, src) === "direct-distinct")
      assert(!scannedTables(q).exists(t =>
        t.contains(src) && !t.contains("-dview")))
      assert(rows(q, "o_orderpriority") ===
        rows(Lake.read(spark, src)
          .filter(col("o_orderpriority") > "2" && col("o_custkey") % 2 === 0)
          .groupBy(col("o_orderpriority"))
          .agg(countDistinct(col("o_custkey")).as("n_cust"),
            count(lit(1)).as("n_rows")), "o_orderpriority"))
    } finally MatView.unregisterDistinct(src + "-dview")
  }

  test("refreshDistinct: one atomic merge, then a direct serve; idempotent") {
    val src = buildSource("refresh")
    MatView.defineDistinct(spark, src, src + "-dview",
      Seq("o_orderpriority"), "o_custkey", asOfVersion = 1L)
    try {
      val cur = Lake.read(spark, src)
      val maxKey = cur.agg(max(col("o_orderkey"))).head().getLong(0)
      Lake.delete(spark, src,
        cur.filter(col("o_orderkey") <= maxKey / 5).select(col("o_orderkey")))
      val vBefore = Lake.latestVersion(src + "-dview")
      MatView.refreshDistinct(spark, src + "-dview")
      assert(Lake.latestVersion(src + "-dview") === vBefore + 1)
      MatView.refreshDistinct(spark, src + "-dview") // no-op
      assert(Lake.latestVersion(src + "-dview") === vBefore + 1)
      val q = userAgg(src)
      assert(kindOf(q, src) === "direct-distinct")
      assert(rows(q, "o_orderpriority") ===
        rows(expectedAgg(src), "o_orderpriority"))
    } finally MatView.unregisterDistinct(src + "-dview")
  }

  test("defineDistinctOrRecover: same definition recovers from the sidecar") {
    val src = buildSource("recover")
    val d1 = MatView.defineDistinct(spark, src, src + "-dview",
      Seq("o_orderpriority"), "o_custkey")
    try {
      val auxV = Lake.latestVersion(src + "-dview")
      MatView.unregisterDistinct(src + "-dview")
      val d2 = MatView.defineDistinctOrRecover(spark, src, src + "-dview",
        Seq("o_orderpriority"), "o_custkey")
      assert(d2 === d1)
      assert(Lake.latestVersion(src + "-dview") === auxV) // no rebuild
      // a different definition rebuilds
      val d3 = MatView.defineDistinctOrRecover(spark, src, src + "-dview",
        Seq("o_orderstatus"), "o_custkey")
      assert(d3.groupCols === Seq("o_orderstatus"))
    } finally MatView.unregisterDistinct(src + "-dview")
  }

  test("ROLLUP/CUBE over the distinct aux: the distinct pyramid in one serve") {
    val src = buildSource("gsets")
    MatView.defineDistinct(spark, src, src + "-dview",
      Seq("o_orderpriority", "o_orderstatus"), "o_custkey")
    try {
      def q(df: org.apache.spark.sql.DataFrame) =
        df.rollup(col("o_orderpriority"), col("o_orderstatus"))
          .agg(countDistinct(col("o_custkey")).as("n_cust"),
            count(lit(1)).as("n_rows"),
            min(col("o_custkey")).as("mn"),
            grouping_id().as("gid"))
      val served = q(lakeDf(src))
      MatView.lastRewrite.set(null)
      served.queryExecution.optimizedPlan
      assert(Option(MatView.lastRewrite.get())
        .exists(r => r._1 == src && r._2 == "direct-gsets-distinct"))
      def sorted(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq.map(v => if (v == null) "∅" else v.toString))
          .sortBy(_.mkString("|")).toSeq
      assert(sorted(served) === sorted(q(Lake.read(spark, src))))
      // stale: a delete-bearing slice still serves (the aux recounts)
      val cur = Lake.read(spark, src)
      val maxKey = cur.agg(max(col("o_orderkey"))).head().getLong(0)
      Lake.delete(spark, src, cur.filter(col("o_orderkey") <= maxKey / 5)
        .select(col("o_orderkey")))
      val served2 = q(lakeDf(src))
      MatView.lastRewrite.set(null)
      served2.queryExecution.optimizedPlan
      assert(Option(MatView.lastRewrite.get())
        .exists(r => r._1 == src && r._2 == "compensated-gsets-distinct"))
      assert(sorted(served2) === sorted(q(Lake.read(spark, src))))
    } finally MatView.unregisterDistinct(src + "-dview")
  }

  test("derived day grouping: weekly/monthly active users off a daily aux") {
    val dir = freshDir("daily")
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"))
    Lake.create(ev, dir, "event_id", targetFiles = 2)
    MatView.defineDistinct(spark, dir, dir + "-dview",
      Seq("day"), "user_id", derived = Seq("day" -> "date_trunc('day', ts)"))
    try {
      // daily active users: exact-grain direct serve
      def dau(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(date_trunc("day", col("ts")).as("d"))
          .agg(countDistinct(col("user_id")).as("dau"))
      assert(kindOf(dau(lakeDf(dir)), dir) === "direct-distinct")
      // weekly active users: a COARSER bucket recounts the day-grain
      // aux's values per week — exact (values, not counts, roll up)
      def wau(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(date_trunc("week", col("ts")).as("w"))
          .agg(countDistinct(col("user_id")).as("wau"),
            count(lit(1)).as("n_events"))
      val served = wau(lakeDf(dir))
      assert(kindOf(served, dir) === "direct-distinct-rollup")
      assert(!scannedTables(served).exists(t =>
        t.contains(dir) && !t.contains("-dview")))
      def sorted(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
      assert(sorted(served).toSeq === sorted(wau(Lake.read(spark, dir))).toSeq)
      // global distinct users
      val g = lakeDf(dir).agg(countDistinct(col("user_id")).as("u"))
      assert(kindOf(g, dir) === "direct-distinct-rollup")
      assert(g.head().getLong(0) ===
        Lake.read(spark, dir).agg(countDistinct(col("user_id"))).head().getLong(0))
      // an HOUR query is FINER than the day declaration: refuse
      val fine = lakeDf(dir).groupBy(date_trunc("hour", col("ts")))
        .agg(countDistinct(col("user_id")).as("u"))
      assert(kindOf(fine, dir) === "none")
      // stale: a delete-bearing slice still serves through the feed
      val cur = Lake.read(spark, dir)
      Lake.delete(spark, dir, cur.filter(col("event_id") % 3 === 0)
        .select(col("event_id")))
      val served2 = wau(lakeDf(dir))
      assert(kindOf(served2, dir) === "compensated-distinct-rollup")
      assert(sorted(served2).toSeq === sorted(wau(Lake.read(spark, dir))).toSeq)
      // recovery keeps the derived declaration
      MatView.unregisterDistinct(dir + "-dview")
      val rec = MatView.defineDistinctOrRecover(spark, dir, dir + "-dview",
        Seq("day"), "user_id", derived = Seq("day" -> "date_trunc('day', ts)"))
      assert(rec.derived === Seq("day" -> "date_trunc('day', ts)"))
      assert(kindOf(dau(lakeDf(dir)), dir) === "compensated-distinct")
    } finally MatView.unregisterDistinct(dir + "-dview")
  }

  test("refusals: wrong column, non-subset grouping, travel below build, raw filter") {
    val src = buildSource("refuse")
    MatView.defineDistinct(spark, src, src + "-dview",
      Seq("o_orderpriority"), "o_custkey")
    try {
      // distinct over a column the view does not carry
      val q1 = lakeDf(src).groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_orderkey")).as("d"))
      assert(kindOf(q1, src) === "none")
      // grouping outside the declaration
      val q2 = lakeDf(src).groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("d"))
      assert(kindOf(q2, src) === "none")
      // filter on a column that is neither a group nor the value
      val q3 = lakeDf(src).filter(col("o_orderkey") > 100L)
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("d"))
      assert(kindOf(q3, src) === "none")
      // time travel below the build point
      val q0 = spark.read.format("graft-lake").option("path", src)
        .option("versionAsOf", "1").load()
      // (v1 == built version here, so force staleness the other way:
      // commit v2, then pin v1 — the view is too new for that read)
      Lake.upsert(spark, src, Lake.read(spark, src).limit(1))
      MatView.unregisterDistinct(src + "-dview")
      MatView.defineDistinct(spark, src, src + "-dview",
        Seq("o_orderpriority"), "o_custkey") // rebuilt at v2
      val qq = q0.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("d"))
      assert(kindOf(qq, src) === "none")
    } finally MatView.unregisterDistinct(src + "-dview")
  }

  test("DROP COLUMN invalidates a distinct view referencing it") {
    val src = buildSource("drop")
    MatView.defineDistinct(spark, src, src + "-dview",
      Seq("o_orderpriority"), "o_custkey")
    try {
      val (_, dropped) = Lake.dropColumn(spark, src, "o_custkey")
      assert(dropped.contains(src + "-dview"))
      assert(MatView.getDistinct(src + "-dview").isEmpty)
    } finally MatView.unregisterDistinct(src + "-dview")
  }

  test("distinct star view: per-dim-attribute distinct counts; dim churn " +
      "costs nothing (round 12)") {
    import org.apache.spark.sql.functions.broadcast
    val src = buildSource("dstar")
    val dim = freshDir("dstar-dim")
    Lake.create(Tables.customer(spark, sf), dim, "c_custkey", targetFiles = 1)
    MatView.defineDistinctStar(spark, src, Seq((dim, "o_custkey", "c_custkey")),
      src + "-dsview", Seq("o_orderpriority"), "o_orderkey")
    try {
      def userQ() = {
        val f = lakeDf(src)
        val d = lakeDf(dim)
        f.join(d, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(countDistinct(col("o_orderkey")).as("n_orders"),
            count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).as("sum_k"),
            min(col("o_orderkey")).as("min_k"),
            max(col("o_orderkey")).as("max_k"))
      }
      def expected() = Lake.read(spark, src)
        .join(broadcast(Lake.read(spark, dim)),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("sum_k"),
          min(col("o_orderkey")).as("min_k"),
          max(col("o_orderkey")).as("max_k"))
      val q0 = userQ()
      assert(kindOf(q0, src) === "direct-distinct-rollup-join")
      val tables = scannedTables(q0)
      assert(!tables.exists(t => t.contains(src) && !t.contains("-dsview")),
        s"plan must not scan the fact, scanned: $tables")
      assert(rows(q0, "c_mktsegment") === rows(expected(), "c_mktsegment"))
      // CHURN the dim: segments reassigned — the serve needs NO
      // refresh, NO move algebra, NO pin: the aux never stored a
      // segment, the query's own dim read relabels
      Lake.upsert(spark, dim, Lake.read(spark, dim)
        .filter(col("c_custkey") % 3 === 0)
        .withColumn("c_mktsegment", lit("CHURNED")))
      val q1 = userQ()
      assert(kindOf(q1, src) === "direct-distinct-rollup-join",
        "dim churn must not degrade the distinct star serve")
      assert(rows(q1, "c_mktsegment") === rows(expected(), "c_mktsegment"))
      // a FACT delta compensates through the aux roll-forward
      val maxKey = Lake.read(spark, src)
        .agg(max(col("o_orderkey"))).head().getLong(0)
      Lake.upsert(spark, src, Lake.read(spark, src)
        .filter(col("o_orderkey") % 8 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + maxKey + 1L))
      val q2 = userQ()
      assert(kindOf(q2, src) === "compensated-distinct-rollup-join")
      assert(rows(q2, "c_mktsegment") === rows(expected(), "c_mktsegment"))
      // grouping by (dim attr × aux col) serves too
      val q3 = lakeDf(src)
        .join(lakeDf(dim), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(countDistinct(col("o_orderkey")).as("n_orders"))
      assert(kindOf(q3, src).endsWith("-distinct-rollup-join"))
      val e3 = Lake.read(spark, src)
        .join(broadcast(Lake.read(spark, dim)),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(countDistinct(col("o_orderkey")).as("n_orders"))
      assert(rows(q3, "c_mktsegment", "o_orderpriority") ===
        rows(e3, "c_mktsegment", "o_orderpriority"))
      // a filter on the dim attribute transposes onto the serve join
      val q4 = lakeDf(src)
        .join(lakeDf(dim), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "CHURNED")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_orderkey")).as("n_orders"))
      assert(kindOf(q4, src).endsWith("-distinct-rollup-join"))
      val e4 = Lake.read(spark, src)
        .join(broadcast(Lake.read(spark, dim)),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "CHURNED")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_orderkey")).as("n_orders"))
      assert(rows(q4, "o_orderpriority") === rows(e4, "o_orderpriority"))
      // recover from the sidecar keeps the dims
      MatView.unregisterDistinct(src + "-dsview")
      val rec = MatView.recoverDistinct(src + "-dsview")
      assert(rec.dims === Seq((dim, "o_custkey", "c_custkey")))
      assert(kindOf(userQ(), src) === "compensated-distinct-rollup-join")
    } finally MatView.unregisterDistinct(src + "-dsview")
  }

  test("distinct star refusals: wrong join key; a dim NOT keyed on its " +
      "join key refuses the define") {
    val src = buildSource("dstar-ref")
    val dim = freshDir("dstar-ref-dim")
    Lake.create(Tables.customer(spark, sf), dim, "c_custkey", targetFiles = 1)
    MatView.defineDistinctStar(spark, src, Seq((dim, "o_custkey", "c_custkey")),
      src + "-dsview", Seq("o_orderpriority"), "o_orderkey")
    try {
      // join on a NON-declared key pair: no rewrite
      val q = lakeDf(src)
        .join(lakeDf(dim), col("o_orderkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("o_orderkey")).as("n"))
      assert(kindOf(q, src) === "none")
      // a dim keyed on something other than the join key refuses define
      val badDim = freshDir("dstar-ref-bad")
      Lake.create(Tables.customer(spark, sf)
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        badDim, "c_name", targetFiles = 1)
      val err = intercept[IllegalArgumentException] {
        MatView.defineDistinctStar(spark, src,
          Seq((badDim, "o_custkey", "c_custkey")),
          src + "-dsview-bad", Seq("o_orderpriority"), "o_orderkey")
      }
      assert(err.getMessage.contains("KEYED on its join key"))
    } finally MatView.unregisterDistinct(src + "-dsview")
  }

  test("two distinct views over the same value column with different " +
      "groupings coexist (ADVICE r11: no cross-shape eviction)") {
    val src = buildSource("coexist")
    MatView.defineDistinct(spark, src, src + "-dview",
      Seq("o_orderpriority"), "o_custkey")
    MatView.defineDistinct(spark, src, src + "-dview2",
      Seq("o_orderstatus"), "o_custkey")
    try {
      // BOTH registered: defining the by-status view must not evict
      // the by-priority one
      assert(MatView.getDistinct(src + "-dview").isDefined,
        "by-priority view was evicted by a different-shape definition")
      assert(MatView.getDistinct(src + "-dview2").isDefined)
      // and each serves its own query
      val q1 = lakeDf(src).groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"))
      assert(kindOf(q1, src) === "direct-distinct")
      val q2 = lakeDf(src).groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"))
      assert(kindOf(q2, src) === "direct-distinct")
      assert(rows(q1, "o_orderpriority") ===
        rows(Lake.read(spark, src).groupBy(col("o_orderpriority"))
          .agg(countDistinct(col("o_custkey")).as("n_cust")),
          "o_orderpriority"))
      assert(rows(q2, "o_orderstatus") ===
        rows(Lake.read(spark, src).groupBy(col("o_orderstatus"))
          .agg(countDistinct(col("o_custkey")).as("n_cust")),
          "o_orderstatus"))
      // SAME-shape redefinition at a new dir still evicts (last wins)
      MatView.defineDistinct(spark, src, src + "-dview3",
        Seq("o_orderpriority"), "o_custkey")
      assert(MatView.getDistinct(src + "-dview").isEmpty,
        "same-shape redefinition must replace the prior registration")
      assert(MatView.getDistinct(src + "-dview3").isDefined)
    } finally {
      MatView.unregisterDistinct(src + "-dview")
      MatView.unregisterDistinct(src + "-dview2")
      MatView.unregisterDistinct(src + "-dview3")
    }
  }
}
