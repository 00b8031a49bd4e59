package graft

import org.apache.spark.sql.functions._

import graft.ext.Sampling

/** Deterministic split assignment: stable across runs, complete and
  * disjoint over the corpus, thresholds honored. */
class SamplingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("split assignment is deterministic and threshold-consistent") {
    val a = Sampling.deterministicSplit(spark, sf).collect()
    val b = Sampling.deterministicSplit(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    a.foreach { r =>
      val bucket = r.getAs[Long]("bucket")
      assert(bucket >= 0 && bucket < 10) // verification slice
      assert(r.getAs[String]("split") === "train") // all of [0,10) is train
    }
  }

  test("quota sample: exactly k per stratum, hash-ordered, stable") {
    val rows = Sampling.quotaSample(spark, sf).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    val nDocs = graft.Tables.documents(spark, sf)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rs) =>
      // full quota when the stratum has >= 10 docs, else the whole stratum
      assert(rs.length === math.min(10L, nDocs(src)))
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq === (1L to rs.length).toSeq)
      // rank order follows hash order
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("h")).toSeq ===
        sorted.map(_.getAs[Long]("h")).sortBy(identity).toSeq)
    }
    // deterministic across runs
    assert(Sampling.quotaSample(spark, sf).collect().toSeq === rows.toSeq)
  }

  test("mix weights: sqrt temperature upweights small sources, budget respected") {
    val rows = Sampling.mixWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    val allocSum = rows.map(_.getAs[Long]("alloc")).sum
    assert(allocSum <= 100000L) // floor division never overshoots
    assert(allocSum > 100000L - rows.length * 2) // and wastes < 2 per source
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val w = r.getAs[Long]("w")
      assert(w * w <= n && (w + 1) * (w + 1) > n) // w = isqrt(n)
    }
    // sqrt flattens: share ratio between two sources is sub-linear in n
    val byN = rows.sortBy(_.getAs[Long]("n"))
    val (lo, hi) = (byN.head, byN.last)
    if (lo.getAs[Long]("n") < hi.getAs[Long]("n")) {
      val shareRatio = hi.getAs[Double]("share_bp") / lo.getAs[Double]("share_bp")
      val nRatio = hi.getAs[Long]("n").toDouble / lo.getAs[Long]("n").toDouble
      assert(shareRatio <= nRatio)
    }
  }

  test("clean pipeline: audit reasons consistent with the gates") {
    val rows = graft.ext.CleanPipeline.cleanPipeline(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rows.length === docs.size) // audit covers every doc
    val reasons = rows.map(_.getAs[String]("reason")).toSet
    assert(reasons.subsetOf(Set("lang", "length", "repetition", "exact_dup", "near_dup", "kept")))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (lang, nChars) = docs(id)
      val reason = r.getAs[String]("reason")
      assert(r.getAs[Boolean]("kept") === (reason == "kept"))
      // first-failing-stage semantics
      if (lang == "zh") assert(reason === "lang")
      else if (nChars < 100 || nChars > 500) assert(reason === "length")
      else assert(reason != "lang" && reason != "length")
    }
    assert(rows.count(_.getAs[Boolean]("kept")) > 0)
  }

  test("dsir selection: top-N candidates only, ranked, target excluded, stable") {
    val sel = Sampling.dsirSelect(spark, sf).collect()
    assert(sel.length === Sampling.DsirTopN)
    // ranks are 1..N in order; scores non-increasing along the ranks;
    // ties broken by doc_id (strict total order)
    sel.zipWithIndex.foreach { case (r, i) => assert(r.getAs[Long]("rk") === i + 1L) }
    sel.sliding(2).foreach { case Array(a, b) =>
      val (sa, sb) = (a.getAs[Long]("score"), b.getAs[Long]("score"))
      assert(sa > sb || (sa == sb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
    }
    // the target domain provides the distribution, never the candidates
    assert(!sel.exists(_.getAs[String]("source") == Sampling.DsirTarget))
    sel.foreach(r => assert(r.getAs[Long]("n_tokens") > 0L))
    // integer arithmetic end-to-end ⇒ bit-stable across runs
    val again = Sampling.dsirSelect(spark, sf).collect()
    assert(sel.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("decontaminated split: every held-out doc scored once, verdict matches threshold") {
    val rows = Sampling.decontaminatedSplit(spark, sf).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length === ids.length, "held-out doc scored twice")
    rows.foreach { r =>
      assert(Set("val", "test")(r.getAs[String]("split")))
      val bp = r.getAs[Long]("containment_bp")
      assert(bp >= 0L && bp <= 10000L)
      assert(r.getAs[Boolean]("quarantined") === (bp >= Sampling.LeakThresholdBp))
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_shingles"))
    }
    // coverage: a proper manifest holds SOME but not ALL docs (the
    // 80/10/10 split leaves ~20% held out)
    val total = graft.Tables.documents(spark, sf).count()
    val heldOut = rows.length.toLong
    assert(heldOut > 0 && heldOut < total)
  }

  test("X9 coreset: per-cell caps hold and rank-1 really is the cell's argmax") {
    import spark.implicits._
    val rows = Sampling.coresetSample(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCell = rows.groupBy(_.getAs[Long]("cell"))
    byCell.foreach { case (cell, members) =>
      val size = members.head.getAs[Long]("cell_size")
      assert(members.forall(_.getAs[Long]("cell_size") === size))
      // the coreset takes min(cell_size, CoresetPerCell) members
      assert(members.length === math.min(size, Sampling.CoresetPerCell.toLong))
      // ranks are 1..k dense and ordered by descending prototypicality
      val ordered = members.sortBy(_.getAs[Long]("rk"))
      assert(ordered.map(_.getAs[Long]("rk")).toSeq === (1L to members.length))
      val sims = ordered.map(_.getAs[Double]("proto_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"cell $cell coreset not sorted by prototypicality")
      sims.foreach(s => assert(s <= 1.0 + 1e-9 && s >= -1.0 - 1e-9))
    }
    // every selected vec belongs to the cell it was selected for, and
    // rank 1 is the true argmax over the FULL cell membership
    val cells = graft.ext.Dedup.semanticCells(Tables.embeddings(spark, sf))
      .select($"vec_id", $"cell").as[(Long, Long)].collect()
    val cellOf = cells.toMap
    rows.foreach(r => assert(cellOf(r.getAs[Long]("vec_id")) === r.getAs[Long]("cell")))
    val fullSizes = cells.groupBy(_._2).map { case (c, ms) => (c, ms.length.toLong) }
    byCell.foreach { case (cell, members) =>
      assert(members.head.getAs[Long]("cell_size") === fullSizes(cell)) }
  }

  test("dedup-adjusted mix: weights derive from POST-dedup counts, budget respected") {
    val rows = Sampling.dedupAdjustedMix(spark, sf).collect()
    val retention = graft.ext.Dedup.dedupRetention(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))).toMap
    assert(rows.map(_.getAs[String]("source")).toSet === retention.keySet)
    val wTotal = rows.map(r => r.getAs[Long]("w")).sum
    rows.foreach { r =>
      val (nDocs, nKept) = retention(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") === nDocs)
      assert(r.getAs[Long]("n_kept") === nKept)
      // the weight is the isqrt of the KEPT count, not the raw count
      val w = r.getAs[Long]("w")
      assert(w * w <= nKept && (w + 1) * (w + 1) > nKept,
        s"w=$w is not isqrt(n_kept=$nKept)")
      assert(r.getAs[Long]("alloc") === 100000L * w / wTotal)
    }
    // allocations never exceed the budget (floor division undershoots)
    assert(rows.map(_.getAs[Long]("alloc")).sum <= 100000L)
  }

  test("mix report covers every document exactly once") {
    val total = graft.Tables.documents(spark, sf).count()
    val mix = Sampling.splitMix(spark, sf)
    assert(mix.agg(sum(col("n"))).head.getLong(0) === total)
    val splits = mix.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits === Set("train", "val", "test"))
    // per-language fractions are in basis points and sum to ~10000
    val fracs = mix.groupBy(col("lang")).agg(sum(col("frac_bp")).as("s")).collect()
    fracs.foreach(r => assert(math.abs(r.getAs[Double]("s") - 10000.0) < 3.0))
  }
}
