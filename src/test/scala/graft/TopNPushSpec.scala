package graft

import org.apache.spark.sql.functions._

import graft.lake.Lake
import graft.sources.LakeScan

/** File-granular TopN pushdown on the lake scan
  * ([[graft.sources.LakeScanBuilder.pushTopN]]): boundary prefix/suffix
  * selection for `ORDER BY <leading key> [DESC][, tie-breakers…]
  * LIMIT n`, the strict-disjointness gate that keeps a straddling tie
  * group sound, and the refusals. */
class TopNPushSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def fresh(tag: String): String = {
    val d = new java.io.File(graft.Scratch.root,
      s"graft-topn-$tag-${spark.sparkContext.applicationId}")
    graft.Scratch.rm(d)
    d.getAbsolutePath
  }

  private def lastPrune(dir: String): Option[(Int, Int)] =
    Option(LakeScan.lastTopNPrune.get()).collect {
      case (d, live, kept) if d == dir => (live, kept)
    }

  test("composite ORDER BY with a tie-breaker prunes to boundary files " +
      "in both directions") {
    val dir = fresh("multi")
    Lake.create(Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority")),
      dir, "o_orderkey", targetFiles = 8)
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("tn_multi")
    for (dirn <- Seq("ASC", "DESC")) {
      LakeScan.lastTopNPrune.set(null)
      val got = spark.sql(
        s"""SELECT o_orderkey, o_orderpriority FROM tn_multi
           |ORDER BY o_orderkey $dirn, o_orderpriority LIMIT 5""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val all = Lake.read(spark, dir)
        .collect().map(r => (r.getAs[Long]("o_orderkey"),
          r.getAs[String]("o_orderpriority"))).toSeq
      val exp = (if (dirn == "ASC") all.sorted else all.sorted.reverse).take(5)
      assert(got === exp, s"$dirn answer")
      val Some((live, kept)) = lastPrune(dir)
      assert(kept < live, s"$dirn must prune: kept $kept of $live")
    }
  }

  test("duplicate leading keys straddling a file boundary refuse the " +
      "prune (strict disjointness) and the answer stays exact") {
    import spark.implicits._
    val dir = fresh("straddle")
    // composite key (k, sub): k repeats 40×, so range clustering by
    // (k, sub) must split some k group across two of the 8 files —
    // adjacent files then share a boundary key and a.maxKey < b.minKey
    // fails
    val df = (0 until 400).map(i => (i / 40L, i % 40L, s"p${i % 7}"))
      .toDF("k", "sub", "tag")
    Lake.create(df, dir, "k,sub", targetFiles = 8)
    val m = Lake.manifest(dir, Lake.latestVersion(dir))
    val sorted = m.files.filter(_.rows > 0).sortBy(_.minKey)
    assume(sorted.sliding(2).exists {
      case Seq(a, b) => a.maxKey >= b.minKey
      case _ => false
    }, "fixture must produce a straddling boundary key")
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("tn_straddle")
    LakeScan.lastTopNPrune.set(null)
    val got = spark.sql(
      """SELECT k, sub FROM tn_straddle
        |ORDER BY k, tag, sub LIMIT 50""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exp = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy { case (k, sub, tag) => (k, tag, sub) }
      .take(50).map { case (k, sub, _) => (k, sub) }.toSeq
    assert(got === exp)
    // overlapped snapshot: the prune must NOT have dropped files
    lastPrune(dir).foreach { case (live, kept) =>
      assert(kept === live, "overlapped ranges must keep every file")
    }
  }

  test("non-key sort column: analyze with cluster-by unlocks the boundary " +
      "prune; nulls gate NULLS FIRST") {
    import spark.implicits._
    val dir = fresh("nonkey")
    val df = (1 to 400).map(i =>
      (i.toLong, if (i % 50 == 0) None else Some(i.toLong * 3 % 997), s"t$i"))
      .toDF("k", "score", "tag")
    Lake.create(df, dir, "k", targetFiles = 4)
    // cluster + analyze by the NON-KEY score column: disjoint per-file
    // score ranges, null counts recorded
    Lake.compactAnalyzed(spark, dir, Seq("score"), targetFiles = 8,
      clusterCol = Some("score"))
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("tn_nonkey")
    val all = Lake.read(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    // DESC (NULLS LAST): prunes to the max-side suffix, nulls never enter
    LakeScan.lastTopNPrune.set(null)
    val gotDesc = spark.sql(
      "SELECT k, score FROM tn_nonkey ORDER BY score DESC LIMIT 10")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toSeq
    val expDesc = all.filter(_._2.isDefined)
      .sortBy { case (k, s) => (-s.get, k) }.take(10)
    assert(gotDesc.map(_._2).sorted === expDesc.map(_._2).sorted.toSeq)
    val Some((liveD, keptD)) = Option(LakeScan.lastTopNPrune.get()).collect {
      case (d, l, kp) if d == dir => (l, kp) }
    assert(keptD < liveD, s"DESC on the analyzed column must prune: $keptD/$liveD")
    // ASC (NULLS FIRST) with nulls present: NO prune — a null row in
    // any file sorts into the top-n
    LakeScan.lastTopNPrune.set(null)
    val gotAsc = spark.sql(
      "SELECT score FROM tn_nonkey ORDER BY score LIMIT 10")
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Long])).toSeq
    assert(gotAsc.count(_.isEmpty) === 8, "the 8 null scores sort first")
    assert(Option(LakeScan.lastTopNPrune.get()).isEmpty,
      "NULLS FIRST over a null-bearing column must keep every file")
    // ASC NULLS LAST: prunes to the min-side prefix by NON-NULL counts
    LakeScan.lastTopNPrune.set(null)
    val gotAscNl = spark.sql(
      "SELECT score FROM tn_nonkey ORDER BY score ASC NULLS LAST LIMIT 10")
      .collect().map(_.getLong(0)).toSeq
    val expAscNl = all.flatMap(_._2).sorted.take(10).toSeq
    assert(gotAscNl === expAscNl)
    val Some((liveA, keptA)) = Option(LakeScan.lastTopNPrune.get()).collect {
      case (d, l, kp) if d == dir => (l, kp) }
    assert(keptA < liveA, s"ASC NULLS LAST must prune: $keptA/$liveA")
  }

  test("ORDER BY a non-leading column refuses the pushdown; answer exact") {
    val dir = fresh("refuse")
    Lake.create(Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey")),
      dir, "o_orderkey", targetFiles = 4)
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("tn_refuse")
    LakeScan.lastTopNPrune.set(null)
    val got = spark.sql(
      "SELECT o_custkey FROM tn_refuse ORDER BY o_custkey LIMIT 3")
      .collect().map(_.getLong(0)).toSeq
    val exp = Lake.read(spark, dir).orderBy(col("o_custkey")).limit(3)
      .collect().map(_.getAs[Long]("o_custkey")).toSeq
    assert(got === exp)
    assert(lastPrune(dir).isEmpty,
      "a non-leading-key order must never reach the boundary prune")
  }

  test("WHERE + ORDER BY + LIMIT prunes to the boundary of the " +
      "filter-surviving files (TopNFilterPrune rule), both directions") {
    val dir = fresh("filter")
    Lake.create(Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority")),
      dir, "o_orderkey", targetFiles = 8)
    // a threshold inside file index 2's range: files 0-1 are wholly
    // eliminated, file 2 is partial (counts 0), files 3+ are whole
    val m = Lake.manifest(dir, Lake.latestVersion(dir))
    val sorted = m.files.filter(_.rows > 0).sortBy(_.minKey)
    assume(sorted.size == 8)
    val x = (sorted(2).minKey + sorted(2).maxKey) / 2
    // the plain-builder test session has no GraftExtensions: register
    // the post-pushdown rule the same way the engine's queries do
    org.apache.spark.sql.GraftSqlShim.addOptimization(
      spark, graft.plans.TopNFilterPrune)
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("tn_filter")
    for (dirn <- Seq("ASC", "DESC")) {
      LakeScan.lastTopNPrune.set(null)
      val q = spark.sql(
        s"""SELECT o_orderkey, o_orderpriority FROM tn_filter
           |WHERE o_orderkey >= $x
           |ORDER BY o_orderkey $dirn LIMIT 5""".stripMargin)
      val got = q.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val all = Lake.read(spark, dir).filter(col("o_orderkey") >= x)
        .collect().map(r => (r.getAs[Long]("o_orderkey"),
          r.getAs[String]("o_orderpriority"))).toSeq
      val exp = (if (dirn == "ASC") all.sortBy(_._1)
        else all.sortBy(-_._1)).take(5)
      assert(got === exp, s"$dirn answer")
      val Some((live, kept)) = lastPrune(dir)
      assert(kept < live, s"$dirn must prune: kept $kept of $live")
      // the engaged composition is plan-visible (VERDICT r12 #7)
      assert(q.queryExecution.executedPlan.toString
          .contains("topn+filter=pruned"),
        "scan description must carry the engage verdict")
    }
  }

  test("WHERE + LIMIT (no sort) opens only a prefix of the " +
      "filter-surviving files — any n passing rows suffice") {
    val dir = fresh("limitfilter")
    Lake.create(Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey")),
      dir, "o_orderkey", targetFiles = 8)
    val m = Lake.manifest(dir, Lake.latestVersion(dir))
    val sorted = m.files.filter(_.rows > 0).sortBy(_.minKey)
    assume(sorted.size == 8)
    // threshold inside file 1: file 0 wholly eliminated, file 1
    // partial (counts 0), files 2+ wholly satisfy
    val x = (sorted(1).minKey + sorted(1).maxKey) / 2
    org.apache.spark.sql.GraftSqlShim.addOptimization(
      spark, graft.plans.TopNFilterPrune)
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("tn_limitf")
    LakeScan.lastLimitPrune.set(null)
    val q = spark.sql(
      s"SELECT o_orderkey FROM tn_limitf WHERE o_orderkey >= $x LIMIT 5")
    val rows = q.collect().map(_.getLong(0)).toSeq
    assert(rows.size === 5)
    assert(rows.forall(_ >= x), "every returned row satisfies the filter")
    val Some((live, kept)) = Option(LakeScan.lastLimitPrune.get()).collect {
      case (d, l, k) if d == dir => (l, k)
    }
    assert(kept < live, s"must prune: kept $kept of $live")
    assert(q.queryExecution.executedPlan.toString
        .contains("limit+filter=pruned"),
      "the engaged prune must be plan-visible")
  }

  test("boundary counts use the INTERSECTION lower bound: satisfying " +
      "rows minus sort-column nulls, never min(non-null, satisfying)") {
    // Round-14 soundness regression (ADVICE r13 high): NULLS LAST
    // order over a null-bearing analyzed sort column, composed with a
    // whole-contained filter on a DIFFERENT null-bearing column. The
    // filter-satisfying rows and the non-null-sort rows are distinct
    // subsets — the sort-null rows can hide entirely INSIDE the
    // satisfying set, so min(nn, sat) overstates provably-qualifying
    // rows and the kept boundary can carry < n real result rows.
    import graft.sources.LakeScanBuilder
    def fe(name: String, lo: Long, hi: Long, sortNulls: Long,
        filterNulls: Long): Lake.FileEntry =
      Lake.FileEntry(name, rows = 100, minKey = lo, maxKey = hi,
        stats = Map("s" -> (lo, hi), "f" -> (0L, 10L)),
        nulls = Map("s" -> sortNulls, "f" -> filterNulls))
    // high file: 100 rows, 60 null sort keys (nn=40), filter kills 20
    // → satisfying=80, but provably-qualifying = 80-60 = 20 (old
    // formula claimed min(40, 80) = 40)
    val high = fe("b", 100, 200, sortNulls = 60, filterNulls = 20)
    val low = fe("a", 0, 99, sortNulls = 0, filterNulls = 20)
    val sat: Lake.FileEntry => Long = f => f.rows - f.nulls("f")
    // DESC NULLS LAST, n=30: the high file certifies only 20 rows —
    // the boundary MUST widen to both files (the old min() kept 1)
    val kept = LakeScanBuilder.topNBoundary(Seq(low, high), "s",
      colIsKey = false, desc = true, nullsFirst = false, n = 30, sat)
    assert(kept.map(_.map(_.name)) === Some(Seq("b", "a")))
    // n=20 is fully certified by the high file alone
    val tight = LakeScanBuilder.topNBoundary(Seq(low, high), "s",
      colIsKey = false, desc = true, nullsFirst = false, n = 20, sat)
    assert(tight.map(_.map(_.name)) === Some(Seq("b")))
    // no residual filter (MaxValue sentinel): contribution clamps to
    // the non-null sort count, not the sentinel
    val nofilter = LakeScanBuilder.topNBoundary(Seq(low, high), "s",
      colIsKey = false, desc = true, nullsFirst = false, n = 41,
      _ => Long.MaxValue)
    assert(nofilter.map(_.map(_.name)) === Some(Seq("b", "a")),
      "nn=40 < 41 must widen past the high file")
  }

  test("aliased sort keys chase through the project list (round 14): " +
      "SELECT k AS kk ... ORDER BY kk prunes like the direct key") {
    val dir = fresh("alias")
    Lake.create(Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey")),
      dir, "o_orderkey", targetFiles = 8)
    val m = Lake.manifest(dir, Lake.latestVersion(dir))
    val sorted = m.files.filter(_.rows > 0).sortBy(_.minKey)
    val x = (sorted(2).minKey + sorted(2).maxKey) / 2
    org.apache.spark.sql.GraftSqlShim.addOptimization(
      spark, graft.plans.TopNFilterPrune)
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("tn_alias")
    LakeScan.lastTopNPrune.set(null)
    val q = spark.sql(
      s"""SELECT o_orderkey AS kk, o_custkey FROM tn_alias
         |WHERE o_orderkey >= $x
         |ORDER BY kk DESC LIMIT 5""".stripMargin)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exp = Lake.read(spark, dir).filter(col("o_orderkey") >= x)
      .collect().map(r => (r.getAs[Long]("o_orderkey"),
        r.getAs[Long]("o_custkey"))).sortBy(-_._1).take(5).toSeq
    assert(got === exp)
    val Some((live, kept)) = lastPrune(dir)
    assert(kept < live, s"aliased key must prune: kept $kept of $live")
    // a NON-MONOTONE computed key still refuses
    LakeScan.lastTopNPrune.set(null)
    val qBad = spark.sql(
      s"""SELECT o_orderkey % 7 AS m, o_custkey FROM tn_alias
         |WHERE o_orderkey >= $x
         |ORDER BY m LIMIT 5""".stripMargin)
    qBad.collect()
    assert(lastPrune(dir).isEmpty,
      "a non-monotone computed sort key must never prune")
  }

  test("monotone wrapper: ORDER BY date_trunc(month, ts) over the " +
      "analyzed ts-clustered layout prunes; a tie-breaker refuses") {
    val dir = fresh("trunc")
    Lake.create(Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_custkey")),
      dir, "o_orderkey", targetFiles = 4)
    Lake.compactAnalyzed(spark, dir, Seq("o_orderdate"), targetFiles = 8,
      clusterCol = Some("o_orderdate"))
    org.apache.spark.sql.GraftSqlShim.addOptimization(
      spark, graft.plans.TopNFilterPrune)
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("tn_trunc")
    import java.time.LocalDateTime
    val all = Lake.read(spark, dir).collect()
      .map(r => (r.getAs[LocalDateTime]("o_orderdate"),
        r.getAs[Long]("o_orderkey")))
    val cut = all.map(_._1).sortBy(_.toString).apply(all.length / 3)
    // single wrapped sort key: outside-boundary rows can only TIE on
    // the truncated month — any n kept rows are a valid top-n
    LakeScan.lastTopNPrune.set(null)
    val q = spark.sql(
      s"""SELECT date_format(date_trunc('month', o_orderdate), 'yyyy-MM')
         |    AS mon_s,
         |  date_trunc('month', o_orderdate) AS mon
         |FROM tn_trunc
         |WHERE o_orderdate >= timestamp_ntz'$cut'
         |ORDER BY mon DESC LIMIT 10""".stripMargin)
    val got = q.collect().map(_.getString(0)).toSeq
    val exp = all.filter(t => !t._1.isBefore(cut)).map(_._1)
      .map(t => f"${t.getYear}%04d-${t.getMonthValue}%02d")
      .sorted.reverse.take(10).toSeq
    assert(got === exp, "truncated months must match the full sort")
    val Some((live, kept)) = lastPrune(dir)
    assert(kept < live, s"wrapped key must prune: kept $kept of $live")
    // with a TIE-BREAKER, a pruned row could tie on month and win on
    // the second key — must refuse
    LakeScan.lastTopNPrune.set(null)
    spark.sql(
      s"""SELECT date_trunc('month', o_orderdate) AS mon, o_custkey
         |FROM tn_trunc WHERE o_orderdate >= timestamp_ntz'$cut'
         |ORDER BY mon DESC, o_custkey LIMIT 10""".stripMargin).collect()
    assert(lastPrune(dir).isEmpty,
      "non-injective wrapper + tie-breaker must keep every file")
  }

  test("a row-granular residual filter cannot certify a boundary: " +
      "no file is dropped, the answer stays exact, the plan says so") {
    val dir = fresh("rowgranular")
    Lake.create(Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey")),
      dir, "o_orderkey", targetFiles = 4)
    org.apache.spark.sql.GraftSqlShim.addOptimization(
      spark, graft.plans.TopNFilterPrune)
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("tn_rowg")
    LakeScan.lastTopNPrune.set(null)
    val q = spark.sql(
      """SELECT o_orderkey, o_custkey FROM tn_rowg
        |WHERE o_custkey % 2 = 0
        |ORDER BY o_orderkey LIMIT 5""".stripMargin)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exp = Lake.read(spark, dir).filter(col("o_custkey") % 2 === 0)
      .orderBy(col("o_orderkey")).limit(5)
      .collect().map(r => (r.getAs[Long]("o_orderkey"),
        r.getAs[Long]("o_custkey"))).toSeq
    assert(got === exp)
    assert(lastPrune(dir).isEmpty,
      "a row-granular filter certifies no per-file count — no prune")
    assert(q.queryExecution.executedPlan.toString.contains("topn+filter="),
      "the disengaged composition must still be plan-visible")
  }
}
