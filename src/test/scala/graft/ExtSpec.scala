package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, EventWindows, Multimodal, Sampling, Similarity, TextStats}

/** Dedup / similarity / multimodal behavior on sf0.001 testdata. */
class ExtSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("X1 exact dedup: doubled corpus collapses back to original ids") {
    val out = Dedup.exactDedup(spark, sf)
    val ids = out.select("doc_id").collect().map(_.getLong(0))
    assert(ids.length === Tables.documents(spark, sf).count())
    assert(ids.forall(_ < 1000000)) // lowest doc_id kept
  }

  test("X2 minhash LSH finds the same pairs as exact jaccard") {
    val exact = Dedup.ngramJaccard(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDup(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh === exact)
  }

  test("X2 simhash: near-dup pairs are a superset-overlap of jaccard dups") {
    val jac = Dedup.ngramJaccard(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashNearDup(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash at radius 3 should recover most of the planted near-dups
    assert(jac.intersect(sim).size >= jac.size / 2)
  }

  test("X3 cosine: self-similarity ranks first at ~1.0") {
    val out = Similarity.cosineTopK(spark, sf).collect()
    val top1 = out.filter(_.getAs[Long]("rk") == 1L)
    assert(top1.length === Similarity.NumQueries)
    top1.foreach { r =>
      assert(r.getAs[Long]("q_id") === r.getAs[Long]("vec_id"))
      // sim = n2/(sqrt(n2)*sqrt(n2)) is 1.0 up to one ulp (and
      // bit-identical across engines, which is what the oracle checks)
      assert(math.abs(r.getAs[Double]("sim") - 1.0) < 1e-12)
    }
  }

  test("X3 ANN LSH: recall@5 vs exact top-k is usable") {
    val exact = Similarity.cosineTopK(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annCosineTopK(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every query finds itself; same-bucket pruning keeps a usable
    // fraction overall (exact OUTPUT equality incl. the pruning is
    // what the mirrored DuckDB oracle hash-verifies — this is only a
    // sanity floor on bucket quality at the testdata's ~0.3-0.5 sim
    // margins, where sign-LSH recall is inherently ~50%)
    assert(ann.count { case (q, v) => q == v } === Similarity.NumQueries)
    assert(exact.intersect(ann).size >= (exact.size * 2) / 5)
  }

  test("X3 PQ-ADC: every query finds itself; recall@5 above the pinned floor") {
    val exact = Similarity.cosineTopK(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqAdcTopK(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a query's own codes reconstruct its own subvectors better than
    // any other vector's, so ADC ranks self in the overfetch set and
    // the exact re-rank puts it at rank 1
    assert(pq.count { case (q, v) => q == v } === Similarity.NumQueries)
    val floorBp = Similarity.RecallFloorsBp("ann_pq")
    assert(exact.intersect(pq).size * 10000L >= exact.size * floorBp,
      s"PQ recall ${exact.intersect(pq).size}/${exact.size} below ${floorBp}bp")
  }

  test("X3 IVF grid: self found, probed-cell recall usable, mirrors oracle shape") {
    val exact = Similarity.cosineTopK(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val grid = Similarity.ivfGridTopK(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grid.count { case (q, v) => q == v } === Similarity.NumQueries)
    assert(exact.intersect(grid).size >= (exact.size * 2) / 5)
  }

  test("X3 IVF-SQ8: self found, agrees with exact-scored IVF over the same probes") {
    val grid = Similarity.ivfGridTopK(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Similarity.ivfSqTopK(spark, sf).collect()
    val ivfsq = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    // same multiprobe candidate pool as ivfGridTopK; the int8 cut with
    // 4x overfetch should almost never evict a true top-k member
    assert(ivfsq.count { case (q, v) => q == v } === Similarity.NumQueries)
    assert(grid.intersect(ivfsq).size * 5 >= grid.size * 4,
      s"IVF-SQ8 overlap with exact-scored IVF too low: ${grid.intersect(ivfsq).size}/${grid.size}")
    // ranks dense per query, sims non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length).toSeq)
      val sims = sorted.map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("X3 IVF ANN: recall@5 vs exact top-k is usable") {
    val exact = Similarity.cosineTopK(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfCosineTopK(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.count { case (q, v) => q == v } === Similarity.NumQueries) // self found
    assert(exact.intersect(ivf).size >= exact.size / 2)
  }

  test("X5 multimodal: real resize keeps row count + emits true 8x8 PNGs; frame-sample explodes rows") {
    val n = Multimodal.mediaTable(spark, sf).count()
    val r = Multimodal.resized(spark, sf, 8, 8)
    assert(r.count() === n)
    val first = r.filter(col("media_id") === 0L).head()
    assert(first.width === 8L && first.height === 8L)
    // the output payload is a REAL PNG: the codec reads it back with
    // the target dimensions, and the roundtrip is deterministic
    val (dw, dh, dsum) = Multimodal.ImageIoCodec.decode(first.png)
    assert((dw, dh) === (8, 8))
    val again = Multimodal.resized(spark, sf, 8, 8)
      .filter(col("media_id") === 0L).head()
    assert(Multimodal.ImageIoCodec.decode(again.png)._3 === dsum)
    // and the resampled sum matches a direct resample of the source
    val srcPng = Multimodal.pngTable(spark, sf)
      .filter(col("media_id") === 0L).head().png
    val px = Multimodal.ImageIoCodec.resizeNearest(srcPng, 8, 8)
    assert(px.foldLeft(0L)(_ + _) === dsum)
    val f = Multimodal.frames(spark, sf, frameSize = 64, stride = 4)
    assert(f.count() > n) // 1 asset → many frames
    val f0 = f.filter(col("media_id") === 0L).collect()
    assert(f0.map(_.frame_no).toSeq === f0.map(_.frame_no).toSeq.sorted)
    assert(f0.forall(_.frame_no % 4 == 0))
  }

  test("X5 multimodal: stub decoder produces features for every asset") {
    val media = Multimodal.mediaTable(spark, sf)
    val feats = Multimodal.extractFeatures(spark, sf)
    assert(feats.count() === media.count())
    val f = feats.filter(col("media_id") === 0L).head()
    assert(f.n_bytes > 0)
    assert(f.width >= 16 && f.width < 80)
    assert(f.brightness > 0.0 && f.brightness <= 1.0)
    // deterministic across runs
    assert(Multimodal.extractFeatures(spark, sf)
      .filter(col("media_id") === 0L).head() === f)
  }

  test("X5 multimodal: ImageIoCodec PNG roundtrip is lossless incl. truncation and padding") {
    import graft.ext.Multimodal.ImageIoCodec
    // exact fit
    val exact = Array.tabulate(12)(i => (i * 21).toByte)
    val (w1, h1, s1) = ImageIoCodec.decode(ImageIoCodec.encodePng(exact, 4, 3))
    assert((w1, h1) === (4, 3))
    assert(s1 === exact.map(b => (b & 0xff).toLong).sum)
    // short payload zero-pads (padding adds nothing to the sum)
    val short = Array[Byte](1, 2, 3)
    val (w2, h2, s2) = ImageIoCodec.decode(ImageIoCodec.encodePng(short, 4, 4))
    assert((w2, h2) === (4, 4) && s2 === 6L)
    // long payload truncates at w*h
    val long = Array.tabulate(100)(_ => 1.toByte)
    val (_, _, s3) = ImageIoCodec.decode(ImageIoCodec.encodePng(long, 5, 5))
    assert(s3 === 25L)
    // high-bit bytes survive the 8-bit gray channel
    val hi = Array[Byte](-1, -128, 127) // 255, 128, 127
    val (_, _, s4) = ImageIoCodec.decode(ImageIoCodec.encodePng(hi, 3, 1))
    assert(s4 === 255L + 128L + 127L)
  }

  test("X5 multimodal: decodeMeta drives the real codec and matches the arithmetic oracle") {
    val rows = Multimodal.decodeMeta(spark, sf).collect()
    assert(rows.length === Multimodal.mediaTable(spark, sf).count())
    // spot-check one row against direct computation from the document
    val doc = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") === 0L).select("text").head().getString(0)
    val r0 = rows.find(_.getLong(0) == 0L).get
    val (w, h) = (16 + 0 % 17, 16 + doc.length % 13)
    assert(r0.getLong(1) === w.toLong && r0.getLong(2) === h.toLong)
    assert(r0.getLong(3) === doc.take(w * h).map(_.toLong).sum)
  }

  test("X4 repetition/novelty: ratios well-formed and internally consistent") {
    val rep = TextStats.repetitionSignals(spark, sf).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val (t2, t3, d2, d3) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(t2 > 0.0 && t2 <= 1.0 && t3 > 0.0 && t3 <= 1.0)
      assert(d2 >= 0.0 && d2 <= 1.0 && d3 >= 0.0 && d3 <= 1.0)
      // a duplicated 3-gram forces duplicated 2-grams inside it
      if (d3 > 0.0) assert(d2 > 0.0)
    }
    val nov = TextStats.noveltyScores(spark, sf).collect()
    assert(nov.length === rep.length)
    nov.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("X4 hll distinct: estimate within spec error, merge-invariant across partitionings") {
    import spark.implicits._
    val rows = TextStats.hllDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // raw-estimator regime (no ln-based corrections): p=8 typical
      // error is ~6.5 %; 15 % is the hard spec bound
      assert(r.getAs[Long]("err_bp") < 1500L,
        s"${r.getAs[String]("source")}: estimate off by ${r.getAs[Long]("err_bp")} bp")
      assert(r.getAs[Double]("hll_est") > 0.0)
    }
    // the sketch must be a true mergeable aggregate: the estimate
    // cannot depend on how input rows are split across partial buffers
    val base = Tables.documents(spark, sf)
      .select(col("source"), explode(expr(Dedup.shinglesExpr)).as("tk"))
      .withColumn("h", expr("cast(conv(substring(md5(tk), 1, 15), 16, 10) as bigint)"))
    def est(parts: Int): Map[String, Double] = base.repartition(parts)
      .groupBy(col("source"))
      .agg(graft.functions.HllAgg.hll_estimate(col("h")).as("e"))
      .as[(String, Double)].collect().toMap
    assert(est(1) === est(7), "estimate depends on partial-buffer split")
  }

  test("X4 diversity card: distinct bounds, bp ranges, bigram arithmetic") {
    val rows = TextStats.diversityCard(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, dw) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_distinct_words"))
      val (b, db) = (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_distinct_bigrams"))
      assert(dw >= 1L && dw <= w)
      assert(db <= b)
      assert(r.getAs[Long]("ttr_bp") === dw * 10000L / w)
      assert(r.getAs[Long]("bigram_ttr_bp") === db * 10000L / math.max(b, 1L))
      assert(r.getAs[Long]("ttr_bp") <= 10000L)
    }
  }

  test("X4 source overlap: ordered pairs, containment bounded, diagonal dropped") {
    val rows = TextStats.sourceOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      val bp = r.getAs[Long]("containment_bp")
      assert(bp >= 0L && bp <= 10000L, s"containment out of range: $bp")
      assert(r.getAs[Long]("n_shared") >= 1L)
    }
  }

  test("X2 semantic dedup: drops are witnessed by exact pairs, same-cell only") {
    import spark.implicits._
    // every (dup_of, vec_id) witness must appear in the EXACT
    // corpus-wide pair set (semantic dedup examines a subset of pairs,
    // so it can miss cross-cell dups but never invent one), with the
    // same similarity, and best_sim must clear the threshold
    val exact = Dedup.embeddingCosineDedup(spark, sf)
      .select("i", "j", "sim").as[(Long, Long, Double)].collect()
      .map { case (i, j, s) => (i, j) -> s }.toMap
    val dropped = Dedup.semanticDedup(spark, sf).collect()
    assert(dropped.nonEmpty, "testdata's planted embedding dups must collide in some cell")
    dropped.foreach { r =>
      val (i, j) = (r.getAs[Long]("dup_of"), r.getAs[Long]("vec_id"))
      assert(i < j, s"witness must be the earlier id: ($i, $j)")
      val sim = exact.getOrElse((i, j), fail(s"witness pair ($i,$j) not in exact pair set"))
      assert(sim >= Dedup.CosineDupThreshold)
      assert(r.getAs[Double]("best_sim") >= Dedup.CosineDupThreshold)
      assert(r.getAs[Long]("n_near") >= 1L)
    }
    // and it is a strict subset relation: no dropped doc without an
    // exact-pair witness, while exact pairs MAY span cells unseen here
    assert(dropped.length <= exact.size)
  }

  test("X2 dup clusters: edges stay intra-cluster, reps are cluster minima") {
    import spark.implicits._
    val clusters = Dedup.dupClusters(spark, sf)
      .select("doc_id", "cluster").as[(Long, Long)].collect().toMap
    val edges = Dedup.minhashNearDup(spark, sf)
      .select("i", "j").as[(Long, Long)].collect()
    assert(edges.nonEmpty)
    edges.foreach { case (i, j) =>
      assert(clusters(i) === clusters(j), s"pair ($i,$j) split across clusters")
    }
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(label === members.keys.min, s"cluster $label rep is not its minimum")
    }
  }

  test("X2 canonical-by-quality: winner is the cluster's richest member, folds add up") {
    import spark.implicits._
    val clusters = Dedup.dupClusters(spark, sf)
      .select("doc_id", "cluster").as[(Long, Long)].collect()
    val byCluster = clusters.groupBy(_._2).map { case (c, ms) => (c, ms.map(_._1).toSet) }
    val distinctTokens = Tables.documents(spark, sf)
      .select(col("doc_id"), size(array_distinct(split(col("text"), " "))).cast("long"))
      .as[(Long, Long)].collect().toMap
    val canon = Dedup.canonicalByQuality(spark, sf).collect()
    assert(canon.length === byCluster.size)
    canon.foreach { r =>
      val members = byCluster(r.getAs[Long]("cluster"))
      val winner = r.getAs[Long]("canonical_doc")
      assert(members.contains(winner), "canonical doc must belong to its cluster")
      assert(r.getAs[Long]("cluster_size") === members.size.toLong)
      assert(r.getAs[Long]("n_folded") === members.size.toLong - 1)
      val best = members.map(distinctTokens).max
      assert(r.getAs[Long]("canonical_distinct") === best,
        s"cluster ${r.getAs[Long]("cluster")} kept a poorer copy than its best")
      // deterministic tiebreak: among equally-rich members, lowest id wins
      val tied = members.filter(distinctTokens(_) == best)
      assert(winner === tied.min)
    }
  }

  test("X2 retention: kept+dropped=total per source, bp formula, drops match pair set") {
    import spark.implicits._
    val rows = Dedup.dedupRetention(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars".cast("long"))
      .as[(Long, String, Long)].collect()
    val bySource = docs.groupBy(_._2)
    assert(rows.map(_.getAs[String]("source")).toSet === bySource.keySet)
    val droppedIds = Dedup.minhashNearDup(spark, sf)
      .select("j").as[Long].collect().toSet
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val members = bySource(src)
      val nDocs = r.getAs[Long]("n_docs")
      val nKept = r.getAs[Long]("n_kept")
      val nDropped = r.getAs[Long]("n_dropped")
      assert(nDocs === members.length.toLong)
      assert(nKept + nDropped === nDocs)
      assert(nDropped === members.count(m => droppedIds(m._1)).toLong)
      assert(r.getAs[Long]("chars_total") === members.map(_._3).sum)
      assert(r.getAs[Long]("chars_kept") ===
        members.filterNot(m => droppedIds(m._1)).map(_._3).sum)
      assert(r.getAs[Long]("retention_bp") === nKept * 10000L / nDocs)
    }
  }

  test("X2 connected components: diameter-100 path graph converges without lineage blowup") {
    import spark.implicits._
    // A deliberately DEEP graph — one path 0-1-2-…-100 (diameter 100,
    // far beyond any real near-dup cluster) plus a disjoint triangle.
    // Plain min-label propagation needs 100 rounds (> MaxIters=50) and
    // an ever-growing plan; pointer jumping must close it in
    // ~log2(100) ≈ 7 rounds, and the periodic localCheckpoint keeps
    // the lineage bounded. Passing at all proves the acceleration;
    // the label assertions prove it stayed correct.
    val path = (0L until 100L).map(k => (k, k + 1))
    val tri = Seq((200L, 201L), (201L, 202L), (200L, 202L))
    val edges = (path ++ tri).toDF("i", "j")
    val labels = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(labels.size === 104)
    (0L to 100L).foreach(k => assert(labels(k) === 0L, s"path node $k"))
    Seq(200L, 201L, 202L).foreach(k => assert(labels(k) === 200L, s"triangle node $k"))
    spark.catalog.clearCache()
  }

  test("X2 dup clusters: clean corpus (zero near-dup edges) is all singletons") {
    import spark.implicits._
    // a corpus with no near-dups is a legitimate input, not an error:
    // the propagation loop must converge immediately (empty edge set →
    // null sum guard) and every doc must come back as its own cluster
    val dir = java.nio.file.Files.createTempDirectory("graft-clean-corpus").toString
    Seq(
      (0L, "alpha bravo charlie delta echo foxtrot golf hotel", "en", "web", 48L),
      (1L, "uno dos tres cuatro cinco seis siete ocho nueve", "es", "web", 47L),
      (2L, "zwei drei vier funf sechs sieben acht neun zehn", "de", "news", 47L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.dupClusters(spark, dir).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("cluster") === r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("cluster_size") === 1L)
      assert(r.getAs[Boolean]("is_rep"))
    }
  }

  test("X2 substring dedup: clusters are cross-doc and internally consistent") {
    val rows = Dedup.substringDedup(spark, sf).collect()
    assert(rows.nonEmpty, "testdata's planted near-dups must share ≥1 span")
    rows.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      assert(nDocs >= 2)
      assert(r.getAs[Long]("n_occurrences") >= nDocs)
      assert(r.getAs[Long]("first_doc") < r.getAs[Long]("last_doc"))
    }
  }

  test("X3 MMR: equals a driver-side greedy reimplementation, scores non-increasing") {
    import org.apache.spark.sql.functions.{col, expr}
    val out = graft.ext.Mmr.mmrSelect(spark, sf).collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("vec_id"), r.getAs[Double]("mmr")))
    // non-increasing greedy scores: the step-t winner was available at
    // t-1 with a maxsim that can only have grown since
    assert(out.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // driver-side reimplementation with the identical IEEE arithmetic
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 10000000) as bigint))").as("iv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    def sim(a: Long, b: Long): Double =
      dot(vecs(a), vecs(b)).toDouble /
        (math.sqrt(dot(vecs(a), vecs(a)).toDouble) * math.sqrt(dot(vecs(b), vecs(b)).toDouble))
    val cand = vecs.keys.filter(_ > 0).toSeq
      .map(id => (id, sim(0L, id))).sortBy { case (id, r) => (-r, id) }
      .take(graft.ext.Mmr.PoolK)
    var sel = Vector.empty[(Long, Long, Double)]
    for (s <- 1 to graft.ext.Mmr.SelectK) {
      val chosen = cand.filterNot(c => sel.exists(_._2 == c._1)).map { case (id, rel) =>
        // max over the SELECTED SET (can be negative); 0 only when empty
        val sims = sel.map(x => sim(id, x._2))
        val maxsim = if (sims.isEmpty) 0.0 else sims.max
        (id, (0.7 * rel) - (0.3 * maxsim))
      }.sortBy { case (id, m) => (-m, id) }.head
      sel :+= ((s.toLong, chosen._1, chosen._2))
    }
    assert(out.toSeq === sel)
  }

  test("X4 BM25: ranks dense 1..k, scores descend, hits contain a query term") {
    import spark.implicits._
    val rows = TextStats.bm25TopDocs(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getAs[Long]("rk")).toSeq === (1L to rows.length).toSeq)
    val scores = rows.map(_.getAs[Long]("bm25_micro"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ > 0L)) // idf (2N-2df+1)/(2df+1) > 0 even at df = N
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    rows.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).split(" ").toSet
      assert(TextStats.Bm25Terms.exists(toks.contains),
        s"doc ${r.getAs[Long]("doc_id")} scored without any query term")
    }
  }

  test("X2 edit verify: candidates are the simhash pairs; survivors meet the 5% bar") {
    import spark.implicits._
    val cands = Dedup.simhashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Dedup.editVerify(spark, sf).collect()
    assert(rows.nonEmpty, "fixture corpus should contain verifiable near-dups")
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    rows.foreach { r =>
      val (i, j) = (r.getAs[Long]("i"), r.getAs[Long]("j"))
      assert(cands.contains((i, j)), s"($i,$j) not in the simhash candidate set")
      val ed = r.getAs[Long]("ed")
      val mx = r.getAs[Long]("len_max")
      assert(mx === math.max(texts(i).length, texts(j).length).toLong)
      assert(ed * Dedup.EditVerifyPct20 <= mx, s"($i,$j) ed=$ed over the bar for mx=$mx")
      assert(r.getAs[Long]("ed_permille") === ed * 1000 / mx)
    }
    // the verification is a FILTER on candidates, never an expansion
    assert(rows.length <= cands.size)
  }

  test("X2 containment: subsumed doc scores 1.0; asymmetric pairs invisible to jaccard") {
    import spark.implicits._
    // doc 1's shingle set is a strict subset of doc 0's → containment
    // 1.0 but jaccard well under the 0.5 near-dup bar; doc 2 is disjoint
    val dir = java.nio.file.Files.createTempDirectory("graft-containment").toString
    val core = "the quick brown fox jumps over the lazy dog near the riverbank today"
    Seq(
      (0L, core + " and then a very long unrelated continuation stretches this document " +
        "with many additional unique words that dilute the union size considerably more",
        "en", "web", 160L),
      (1L, core, "en", "web", 70L),
      (2L, "completely different content about databases and distributed query engines",
        "en", "news", 74L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.containmentDedup(spark, dir).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("i") === 0L && rows.head.getAs[Long]("j") === 1L)
    assert(rows.head.getAs[Double]("containment") === 1.0)
    // the same pair is NOT a jaccard near-dup (union dominated by doc 0)
    val jac = Dedup.ngramJaccard(spark, dir).collect()
    assert(!jac.exists(r => r.getAs[Long]("i") == 0L && r.getAs[Long]("j") == 1L),
      "fixture pair unexpectedly passed the jaccard bar — weaken the overlap")
  }

  test("X6 attribution: purchases credit the last in-window touch, else direct") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-attribution").toString
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    Seq(
      // user 1: click then purchase 10 min later → credited to click
      (0L, t(0), 1L, "click", 0.0, "{}"),
      (1L, t(10), 1L, "purchase", 10.0, "{}"),
      // user 1: second purchase 45 min after the click → outside the
      // 30-min lookback (the first purchase is not a touch) → direct
      (2L, t(45), 1L, "purchase", 5.0, "{}"),
      // user 2: no prior touch at all → direct
      (3L, t(20), 2L, "purchase", 2.5, "{}"),
      // user 3: view then click then purchase → last touch (click) wins
      (4L, t(1), 3L, "view", 0.0, "{}"),
      (5L, t(2), 3L, "click", 0.0, "{}"),
      (6L, t(3), 3L, "purchase", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = EventWindows.attribution(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows === Map(
      "click" -> (2L, 17.0), // 10.0 (user 1) + 7.0 (user 3)
      "direct" -> (2L, 7.5))) // 5.0 (user 1 late) + 2.5 (user 2)
  }

  test("X9 weighted sample: deterministic k smallest integer priorities, length-biased") {
    import spark.implicits._
    val out = Sampling.weightedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length === Sampling.WeightedSampleK)
    // identical on re-run (no rand() anywhere)
    val out2 = Sampling.weightedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === out2.toSeq)
    // matches a from-scratch recomputation of priority = h div n_chars
    val all = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"),
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"))
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, src, nc, h) => (id, src, nc, h / math.max(nc, 1L)) }
    val expected = all.sortBy(r => (r._4, r._1)).take(Sampling.WeightedSampleK)
    assert(out.toSeq === expected.toSeq)
    // the selection is genuinely length-biased: winners' mean length
    // exceeds the corpus mean (priority divides the hash by n_chars)
    val meanAll = all.map(_._3).sum.toDouble / all.length
    val meanWin = out.map(_._3).sum.toDouble / out.length
    assert(meanWin > meanAll,
      s"weighted sample mean length $meanWin not above corpus mean $meanAll")
  }
}
