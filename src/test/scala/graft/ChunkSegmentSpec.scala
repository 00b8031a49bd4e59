package graft

import org.apache.spark.sql.functions._

import graft.ext.{Chunks, Dedup, EventWindows}

/** Round-3 batch: chunking, boilerplate segment removal, SQ8 re-rank,
  * integer z-score anomalies — invariants beyond the driver hash gate. */
class ChunkSegmentSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("chunks tile every document with the declared overlap") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), length(col("text")).as("len"))
    val chunks = Chunks.chunkDocs(spark, sf)
    val byDoc = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n"),
      max(col("start") + col("chunk_len") - 1).as("covered"),
      min(col("start")).as("first"))
      .join(docs, "doc_id")
    // first chunk starts at 1, last chunk reaches the end of the doc
    assert(byDoc.filter(col("first") =!= 1L).count() === 0)
    assert(byDoc.filter(col("covered") =!= col("len")).count() === 0)
    // chunk count = number of stride positions
    assert(byDoc.filter(col("n") =!=
      ceil(greatest(col("len"), lit(1)).cast("double") / Chunks.ChunkStride).cast("long")).count() === 0)
    // consecutive chunks overlap by width − stride (except a short tail)
    val overlap = Chunks.ChunkWidth - Chunks.ChunkStride
    val bad = chunks.as("a").join(chunks.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.chunk_id") === col("a.chunk_id") + 1)
      .filter(col("a.start") + col("a.chunk_len") - col("b.start") =!= overlap &&
        col("a.chunk_len") === Chunks.ChunkWidth)
    assert(bad.count() === 0)
  }

  test("segment dedup drops exactly the segments shared by >= BoilerDocs docs") {
    val out = Dedup.segmentDedup(spark, sf)
    val docs = Tables.documents(spark, sf)
    assert(out.count() === docs.count())
    // reassembly identity: docs with zero dropped segments round-trip verbatim
    val joined = out.join(docs, "doc_id")
    val untouched = joined.filter(col("n_dropped") === 0)
    assert(untouched.filter(col("clean_text") =!= col("text")).count() === 0)
    // dropped counts are consistent with the corpus-wide df computation
    val segs = docs.select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "w")
      .groupBy(col("doc_id"), expr(s"pos div ${Dedup.SegWords}").as("seg"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
        _.getField("w")), " ").as("seg_text"))
    val df = segs.groupBy("seg_text").agg(countDistinct("doc_id").as("nd"))
    val expected = segs.join(df, "seg_text")
      .filter(col("nd") >= Dedup.BoilerDocs)
      .groupBy("doc_id").agg(count(lit(1)).as("exp_dropped"))
    val mismatches = out.join(expected, Seq("doc_id"), "left")
      .filter(col("n_dropped") =!= coalesce(col("exp_dropped"), lit(0L)))
    assert(mismatches.count() === 0)
  }

  test("sq8 re-rank: overfetch window contains the true top-k here (exact recall)") {
    val exact = graft.ext.Similarity.cosineTopK(spark, sf)
      .select("q_id", "rk", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sq = graft.ext.Similarity.sqRerank(spark, sf)
      .select("q_id", "rk", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // full triples incl. WHICH vector ranked where — not just the grid
    assert(sq === exact)
  }

  test("cohort retention: offset-0 cells are full cohorts; counts never exceed cohort size") {
    val m = EventWindows.cohortRetention(spark, sf)
    assert(m.filter(col("day_offset") === 0 &&
      (col("n_active") =!= col("cohort_size") || col("retention") =!= 1.0)).count() === 0)
    assert(m.filter(col("n_active") > col("cohort_size")).count() === 0)
    // cohort sizes sum to the distinct-user count
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val sizes = m.filter(col("day_offset") === 0)
      .agg(sum(col("cohort_size"))).head.getLong(0)
    assert(sizes === users)
  }

  test("top paths: every path has at most PathLen hops and counts sum to <= distinct users") {
    val p = EventWindows.topPaths(spark, sf).collect()
    assert(p.nonEmpty && p.length <= EventWindows.PathTopK)
    p.foreach { r =>
      assert(r.getString(0).split(">").length <= EventWindows.PathLen)
    }
    // sorted by count desc
    val counts = p.map(_.getLong(1))
    assert(counts.sameElements(counts.sorted.reverse))
  }

  test("scd2 history: intervals chain per customer with one open row") {
    val h = graft.analytics.MergeUpsert.scd2History(spark, sf)
    // exactly one current row per customer
    val multi = h.filter(col("is_current")).groupBy("o_custkey")
      .agg(count(lit(1)).as("n")).filter(col("n") =!= 1)
    assert(multi.count() === 0)
    // each non-current row's valid_to equals the next row's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("valid_from"), col("o_orderkey"))
    val chained = h.withColumn("nxt", lead(col("valid_from"), 1).over(w))
      .filter(!col("is_current"))
    assert(chained.filter(col("valid_to") =!= col("nxt")).count() === 0)
  }

  test("delta dedup = full near-dup pair set restricted to pairs with a delta side") {
    val full = Dedup.minhashNearDup(spark, sf).select("i", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val delta = Dedup.minhashDeltaDedup(spark, sf).select("i", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(delta === full.filter { case (i, j) => i % 5 == 0 || j % 5 == 0 })
  }

  test("merged intervals are disjoint per user and cover every event") {
    import graft.ext.EventWindows
    val islands = EventWindows.mergeIntervals(spark, sf)
    // disjoint: next island starts strictly after this one ends
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("island"))
    val overlap = islands
      .withColumn("next_start", lead(col("island_start"), 1).over(w))
      .filter(col("next_start").isNotNull && col("next_start") <= col("island_end"))
    assert(overlap.count() === 0)
    // conservation: island event counts sum to the events table size
    val n = islands.agg(sum(col("n_events"))).head.getLong(0)
    assert(n === Tables.events(spark, sf).count())
  }

  test("quality gate: keep is exactly the AND of the rule columns; rules match raw recomputation") {
    import graft.ext.TextStats
    val g = TextStats.qualityGate(spark, sf)
    assert(g.filter(col("keep") =!=
      (col("r_len") && col("r_word_len") && col("r_stopwords") && col("r_repetition"))).count() === 0)
    // spot-check the repetition rule against qualitySignals' top-token fraction
    val qs = TextStats.qualitySignals(spark, sf)
      .select(col("doc_id"), (col("top_tok_n") * 5 <= col("n_tokens")).as("exp_rep"))
    assert(g.join(qs, "doc_id").filter(col("r_repetition") =!= col("exp_rep")).count() === 0)
  }

  test("rfm: quartile scores are 1..4 and segment encodes them") {
    val r = graft.ext.EventWindows.rfmSegments(spark, sf)
    for (c <- Seq("r_score", "f_score", "m_score"))
      assert(r.filter(col(c) < 1 || col(c) > 4).count() === 0)
    assert(r.filter(col("segment") =!=
      concat(col("r_score"), col("f_score"), col("m_score"))).count() === 0)
    // recency 0 exists (the user with the corpus-max purchase)
    assert(r.filter(col("recency_days") === 0).count() >= 1)
  }

  test("epoch order: each epoch is a complete permutation, and epochs differ") {
    import graft.ext.Sampling
    val e = Sampling.epochOrder(spark, sf)
    val docs = Tables.documents(spark, sf).count()
    val byEpoch = e.groupBy("epoch").agg(
      count(lit(1)).as("n"),
      countDistinct("doc_id").as("nd"),
      max(col("position")).as("maxp"))
    assert(byEpoch.filter(col("n") =!= docs || col("nd") =!= docs || col("maxp") =!= docs)
      .count() === 0)
    // different epochs order documents differently (same doc, different position)
    val moved = e.filter(col("epoch") === 0).as("a")
      .join(e.filter(col("epoch") === 1).as("b"), col("a.doc_id") === col("b.doc_id"))
      .filter(col("a.position") =!= col("b.position"))
    assert(moved.count() > 0)
  }

  test("anomalies are exactly the |z| > 2 events of groups with n >= AnomalyMinN") {
    val ev = Tables.events(spark, sf)
      .withColumn("cents", (col("value").cast("decimal(18,2)") * 100).cast("long"))
    val stats = ev.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"),
        sum(col("cents") * col("cents")).as("q"))
      .filter(col("n") >= EventWindows.AnomalyMinN)
    // recompute with float z-scores and compare the flag sets
    val expected = ev.join(stats, Seq("user_id", "event_type"))
      .withColumn("mean", col("s").cast("double") / col("n"))
      .withColumn("varr",
        (col("n") * col("q") - col("s") * col("s")).cast("double") /
          (col("n") * col("n")).cast("double"))
      .filter(pow(col("cents") - col("mean"), 2) > lit(4.0) * col("varr"))
      .select("event_id")
    val got = EventWindows.anomalies(spark, sf).select("event_id")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }
}
