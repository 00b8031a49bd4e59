package graft

import graft.analytics.StarQueries

/** Star-schema analytics sanity (oracle equality is covered by the
  * driver's DuckDB gate; these check engine-side invariants). */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx sketches assert their own error bounds (and exacts agree)") {
    val exact = StarQueries.distinctCounts(spark, sf).head()
    val approx = StarQueries.approxStats(spark, sf).head()
    assert(approx.getAs[Long]("exact_orders") === exact.getAs[Long]("n_orders"))
    assert(approx.getAs[Long]("exact_parts") === exact.getAs[Long]("n_parts"))
    assert(approx.getAs[Boolean]("orders_in_bounds"))
    assert(approx.getAs[Boolean]("parts_in_bounds"))
    assert(approx.getAs[Boolean]("median_in_bounds"))
    assert(approx.getAs[Boolean]("p99_in_bounds"))
    assert(approx.getAs[Double]("exact_p99_price") >=
      approx.getAs[Double]("exact_median_price"))
  }

  test("rollup emits per-nation, per-region subtotal and grand total rows") {
    val rows = StarQueries.rollupSales(spark, sf).collect()
    val grand = rows.filter(r => r.getString(0) == "(all)" && r.getString(1) == "(all)")
    assert(grand.length === 1)
    val regionSubtotals = rows.filter(r => r.getString(0) != "(all)" && r.getString(1) == "(all)")
    assert(regionSubtotals.nonEmpty)
    // grand total equals sum of region subtotals
    assert(grand.head.getAs[Long]("n_customers") ===
      regionSubtotals.map(_.getAs[Long]("n_customers")).sum)
  }

  test("entry() flagship smoke: >0 rows at sf0.001") {
    assert(SparkEntry.entry(spark).limit(1).count() === 1)
  }

  test("every oracleSql key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("window sweep: running_total ends at the partition sum, ranks stay bounded") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.FunctionSweeps.windowFuncs(spark, sf)
    val last = rows.groupBy(col("o_custkey"))
      .agg(max(col("running_total")).as("rt"), max(col("quartile")).as("q"),
        max(col("cume")).as("cd"))
      .collect()
    assert(last.nonEmpty)
    last.foreach { r =>
      assert(r.getAs[Long]("q") >= 1L && r.getAs[Long]("q") <= 4L)
      assert(math.abs(r.getAs[Double]("cd") - 1.0) < 1e-12) // cume_dist tops at 1
    }
  }

  test("scd1 merge: op classes partition the key space") {
    import org.apache.spark.sql.functions._
    val m = graft.analytics.MergeUpsert.scd1Merge(spark, sf).cache()
    try {
      val byOp = m.groupBy(col("op")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val base = Tables.customer(spark, sf)
      val nBase = base.count()
      val nUpd = base.filter(col("c_custkey") % 7 === 0).count()
      val nIns = base.filter(col("c_custkey") % 97 === 0).count()
      assert(byOp.getOrElse("updated", 0L) === nUpd)
      assert(byOp.getOrElse("inserted", 0L) === nIns)
      assert(byOp.getOrElse("kept", 0L) === nBase - nUpd)
      // merge keys stay unique
      assert(m.select("c_custkey").distinct().count() === m.count())
    } finally m.unpersist()
  }

  test("quality signals: fractions bounded, top unigram at least as frequent as any") {
    val rows = graft.ext.TextStats.qualitySignals(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val uf = r.getAs[Double]("top_tok_frac")
      val bf = r.getAs[Double]("top_bigram_frac")
      assert(uf > 0.0 && uf <= 1.0)
      assert(bf >= 0.0 && bf <= 1.0)
      assert(r.getAs[Long]("top_tok_n") >= r.getAs[Long]("top_bigram_n"))
    }
  }

  test("fuzzy join: blocked resolve equals the unblocked all-pairs best match") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = graft.analytics.FuzzyJoin.fuzzyResolve(spark, sf)
      .select("probe_id", "matched_name", "dist")
      .as[(Long, String, Long)].collect().toSet
    assert(got.nonEmpty)
    // naive reference: cross join every probe against the full catalog
    // (no blocking), keep best (dist, name); must agree exactly because
    // the synthesized corruption never touches the blocking prefix
    val part = Tables.part(spark, sf)
    val probes = part
      .filter(col("p_partkey") % 7 === 0 && length(col("p_name")) >= 4)
      .select(col("p_partkey").as("probe_id"),
        expr("concat(substring(p_name, 1, 2 + pmod(p_partkey, length(p_name) - 2)), " +
          "substring(p_name, 4 + pmod(p_partkey, length(p_name) - 2), length(p_name)))")
          .as("dirty_name"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("dist"), col("p_name"))
    val naive = probes.crossJoin(part.select(col("p_name")).distinct())
      .withColumn("dist", levenshtein(col("dirty_name"), col("p_name")))
      .filter(col("dist") <= 2)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("probe_id"), col("p_name"), col("dist").cast("long"))
      .as[(Long, String, Long)].collect().toSet
    assert(got === naive)
    // every probe resolves: a single deletion is within distance 1
    assert(got.map(_._1) === naive.map(_._1))
    got.foreach { case (_, _, d) => assert(d >= 1 && d <= 2) }
  }

  test("histogram: buckets partition all orders, edges ordered") {
    val rows = graft.analytics.FunctionSweeps.histogram(spark, sf).collect()
    assert(rows.length > 1 && rows.length <= 20)
    val total = rows.map(_.getAs[Long]("n_orders")).sum
    assert(total === Tables.orders(spark, sf).count())
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b < 20)
      assert(r.getAs[Double]("min_price") <= r.getAs[Double]("max_price"))
    }
    // bucket ranges are disjoint and ordered
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Double]("max_price") < hi.getAs[Double]("min_price"))
      case _ =>
    }
  }

  test("lm score: repeated text scores higher than unique text") {
    import spark.implicits._
    val scored = graft.ext.TextStats.lmScore(spark, sf).collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      val s = r.getAs[Double]("lm_score")
      // floor-div instance scores are in [0, 1e6]
      assert(s >= 0.0 && s <= 1000000.0)
      assert(r.getAs[Boolean]("low_quality") === (s < 20000.0))
    }
  }

  test("pii redact: no email or phone survives redaction, counts positive") {
    val rows = graft.ext.Redact.piiRedact(spark, sf).collect()
    assert(rows.nonEmpty)
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    val phone = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}".r
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(email.findFirstIn(red).isEmpty, red)
      assert(phone.findFirstIn(red).isEmpty, red)
      assert(red.contains("[EMAIL]") && red.contains("[PHONE]"))
      assert(r.getAs[Long]("n_emails") === 1L)
      assert(r.getAs[Long]("n_phones") === 1L)
    }
  }

  test("pagerank: ranks descend, every node keeps the damping floor, ids resolve") {
    import org.apache.spark.sql.functions.col
    val rows = graft.analytics.PageRank.pagerank(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 20)
    assert(rows.map(_.getAs[Long]("rk")).toSeq === (1L to rows.length).toSeq)
    val ranks = rows.map(_.getAs[Long]("rank_micro"))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    // r' = 150000 + damped inbound mass ⇒ nothing can fall below the floor
    assert(ranks.forall(_ >= 150000L))
    assert(rows.forall(r => Set("cust", "supp").contains(r.getAs[String]("kind"))))
    val custIds = graft.Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val suppIds = graft.Tables.supplier(spark, sf)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val id = r.getAs[Long]("entity_id")
      if (r.getAs[String]("kind") == "cust") assert(custIds.contains(id))
      else assert(suppIds.contains(id))
    }
  }

  test("triangles: count matches driver-side brute force, wedge bound holds") {
    import org.apache.spark.sql.functions.{col, count => cnt, lit}
    val r = graft.analytics.Triangles.triangles(spark, sf).head()
    // independent brute force: rebuild the support-filtered edge set,
    // collect it (small by construction), count common-neighbor closures
    val l = graft.Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey"))
    val a = l.select(col("l_orderkey").as("ok"), col("l_partkey").as("p1"))
    val b = l.select(col("l_orderkey").as("ok"), col("l_partkey").as("p2"))
    val edges = a.join(b, "ok").filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2")).agg(cnt(lit(1)).as("s"))
      .filter(col("s") >= graft.analytics.Triangles.MinSupport)
      .select("p1", "p2").collect().map(x => (x.getLong(0), x.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    edges.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    val bruteTri = edges.map { case (u, v) => (adj(u) & adj(v)).size }.sum / 3L
    assert(r.getAs[Long]("n_triangles") === bruteTri)
    assert(r.getAs[Long]("n_edges") === edges.length.toLong)
    assert(r.getAs[Long]("n_wedges") >= 3 * r.getAs[Long]("n_triangles"))
    assert(r.getAs[Long]("global_cc_bp") >= 0 && r.getAs[Long]("global_cc_bp") <= 10000)
  }

  test("kmeans: distributed Lloyd equals a driver-side reimplementation") {
    import org.apache.spark.sql.functions.{col, expr}
    val out = graft.ext.KMeans.kmeansLloyd(spark, sf).collect()
      .map(r => (r.getAs[Long]("j"), (r.getAs[Long]("n_members"),
        r.getAs[Long]("inertia_m"), r.getAs[Long]("first_member")))).toMap
    val pts = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 10000000) as bigint))").as("iv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    def d2(x: Array[Long], y: Array[Long]): Long =
      x.indices.map(i => { val d = x(i) - y(i); d * d }).sum
    var cent: Map[Long, Array[Long]] =
      pts.filter(_._1 < graft.ext.KMeans.K).map { case (id, v) => (id, v) }.toMap
    for (_ <- 1 to graft.ext.KMeans.Iters) {
      val assigned = pts.map { case (id, v) =>
        val j = cent.toSeq.map { case (cj, cv) => (d2(v, cv), cj) }.min._2
        (j, v)
      }
      cent = assigned.groupBy(_._1).map { case (j, vs) =>
        val n = vs.length
        val dims = vs.head._2.indices.map { i =>
          math.floor(vs.map(_._2(i)).sum.toDouble / n).toLong
        }.toArray
        (j, dims)
      }
    }
    val fin = pts.map { case (id, v) =>
      val (dist, j) = cent.toSeq.map { case (cj, cv) => (d2(v, cv), cj) }.min
      (j, id, dist)
    }
    val expected = fin.groupBy(_._1).map { case (j, xs) =>
      (j, (xs.length.toLong, xs.map(_._3 / 1000000L).sum, xs.map(_._2).min))
    }
    assert(out === expected)
  }

  test("array sweep: aggregate/transform identities hold") {
    val rows = graft.analytics.FunctionSweeps.arrayFuncs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("sum_doubled") === 2 * r.getAs[Long]("total_qty"))
      assert(r.getAs[Long]("first_qty") === r.getAs[Long]("min_qty")) // sorted array
      assert(r.getAs[Long]("last_qty") === r.getAs[Long]("max_qty"))
      assert(r.getAs[Long]("n_distinct_qty") <= r.getAs[Long]("n_items"))
    }
  }

  test("data quality gate: clean corpus all-pass; injected violations each counted") {
    import spark.implicits._
    val clean = graft.ext.DataQuality.dataQuality(spark, sf).collect()
    assert(clean.length === 6)
    assert(clean.forall(_.getAs[String]("status") == "pass"),
      s"testdata should pass every constraint: ${clean.mkString(", ")}")
    // corrupted fixture: one violation of each kind
    val dir = java.nio.file.Files.createTempDirectory("graft-dq").toString
    def jl(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
    Seq(
      (jl(1L), jl(10L), 100.0, "O"),
      (jl(1L), jl(10L), 50.0, "F"), // duplicate orderkey
      (jl(2L), null.asInstanceOf[java.lang.Long], 70.0, "P"), // null custkey
      (jl(3L), jl(10L), -5.0, "O"), // non-positive price
      (jl(4L), jl(10L), 30.0, "X"), // bad status
      (jl(5L), jl(99L), 20.0, "F"), // orphan custkey
      (null.asInstanceOf[java.lang.Long], jl(10L), 40.0, "O")) // null orderkey
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(Tuple1(10L)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val bad = graft.ext.DataQuality.dataQuality(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    // the null-keyed row books under COMPLETENESS, not uniqueness:
    // count(o_orderkey) - count(DISTINCT o_orderkey) sees only the
    // genuine repeat of orderkey 1
    assert(bad("orderkey_unique") === (1L, "fail"))
    assert(bad("orderkey_complete") === (1L, "fail"))
    assert(bad("custkey_complete") === (1L, "fail"))
    assert(bad("totalprice_positive") === (1L, "fail"))
    assert(bad("orderstatus_domain") === (1L, "fail"))
    // orphans: custkey 99 missing from dims, PLUS the null-keyed row —
    // a null key never equi-matches, so anti-join keeps it, and DuckDB's
    // NOT EXISTS agrees; both engines count 2 (completeness separately
    // reports the null itself)
    assert(bad("custkey_referential") === (2L, "fail"))
  }
}
