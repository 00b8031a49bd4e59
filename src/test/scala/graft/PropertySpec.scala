package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.FuzzyMatch

/** Property-based checks for the driver-side metadata operators,
  * using plain scalacheck generators (no scalatestplus bridge in the
  * offline cache) with deterministic seeds. */
class PropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(42L + i)))

  private val name: Gen[String] =
    Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.alphaLowerChar, Gen.const('_'), Gen.const(' '))).map(_.mkString))

  test("ratio is bounded [0,100], 100 on self, symmetric") {
    for (Seq(a, b) <- samples(Gen.zip(name, name)).map(t => Seq(t._1, t._2))) {
      val r = FuzzyMatch.ratio(a, b)
      assert(r >= 0 && r <= 100)
      assert(r === FuzzyMatch.ratio(b, a))
    }
    for (a <- samples(name) if a.trim.nonEmpty)
      assert(FuzzyMatch.ratio(a, a) === 100)
  }

  test("separator normalization: underscores and spaces are equivalent") {
    for (a <- samples(name))
      assert(FuzzyMatch.ratio(a, a.replace('_', ' ')) === 100)
  }

  test("levenshtein triangle inequality") {
    for ((a, (b, c)) <- samples(Gen.zip(name, Gen.zip(name, name)))) {
      assert(FuzzyMatch.levenshtein(a, c) <=
        FuzzyMatch.levenshtein(a, b) + FuzzyMatch.levenshtein(b, c))
    }
  }

  test("sniffer picks the dominant delimiter for generated rows") {
    val field = Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
    val gen = Gen.zip(Gen.oneOf(',', '\t', ';', '|'), Gen.chooseNum(2, 8), field)
    for ((sep, nCols, f) <- samples(gen)) {
      val line = List.fill(nCols)(f).mkString(sep.toString)
      assert(graft.ingest.Sniffer.sniffLine(line) === sep.toString)
    }
  }

  test("district extraction leaves non-matching names untouched") {
    import spark.implicits._
    // no spaces → can't match 'DISTRICT <x>'; exact fidelity for the
    // matching branches is pinned by DistrictExtractSpec
    val safe = Gen.listOfN(8, Gen.alphaUpperChar).map(_.mkString)
    val names = samples(safe, 40).distinct.filterNot(_.contains("DISTRICT"))
    val df = names.zipWithIndex.map { case (n, i) => (i.toString, n) }
      .toDF("id", "contest_name")
    val out = graft.ops.DistrictExtract(df).collect()
    assert(out.length === names.length)
    out.foreach { r =>
      assert(names.contains(r.getString(1)))
      assert(r.isNullAt(2))
    }
  }

  test("binned range join ≡ naive theta join on random intervals/points/widths") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val gen = for {
      w <- Gen.chooseNum(1L, 50L)
      // negative domain included deliberately: integral `div` truncates
      // toward zero (not floor), so bins are uneven around 0 — coverage
      // must still be exact there
      ivs <- Gen.listOfN(30, Gen.zip(Gen.chooseNum(-500L, 500L), Gen.chooseNum(1L, 120L)))
      pts <- Gen.listOfN(60, Gen.chooseNum(-700L, 700L))
    } yield (w, ivs, pts)
    for ((w, ivs, pts) <- samples(gen, n = 15)) {
      val intervals = ivs.zipWithIndex
        .map { case ((lo, len), i) => (i.toLong, lo, lo + len) }
        .toDF("iid", "lo", "hi")
      val points = pts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("pid", "t")
      val binned = graft.analytics.RangeJoin
        .binnedRangeJoin(intervals, points, "lo", "hi", "t", w)
        .select("iid", "pid").as[(Long, Long)].collect().toSet
      val naive = intervals.join(points, col("t") >= col("lo") && col("t") < col("hi"))
        .select("iid", "pid").as[(Long, Long)].collect().toSet
      assert(binned === naive, s"width=$w")
    }
  }

  test("registered queries are shuffle-partition invariant") {
    // THE distributed-correctness property: results must not depend on
    // physical parallelism. Exercised on the operators whose plans
    // lean hardest on partitioning — banded LSH joins, the iterative
    // CC loop, broadcast+TakeOrdered selection, session windows, the
    // persist-reusing lang-ID — by re-running each under a different
    // shuffle-partition count (runtime conf, affects every exchange)
    // and requiring row-identical output.
    val sf = "/root/testdata/sf0.001"
    val names = Seq("x2_minhash_lsh", "x2_dup_clusters", "x9_dsir_select",
      "x6_session_window", "x4_lang_id", "x2_sem_dedup")
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    try {
      names.foreach { n =>
        val fn = SparkEntry.queries(n)
        spark.conf.set(key, "3")
        val a = fn(spark, sf).collect().map(_.toSeq).toSeq
        spark.catalog.clearCache()
        spark.conf.set(key, "7")
        val b = fn(spark, sf).collect().map(_.toSeq).toSeq
        spark.catalog.clearCache()
        assert(a === b, s"$n output depends on shuffle partitioning")
        assert(a.nonEmpty, s"$n returned no rows at sf0.001")
      }
    } finally spark.conf.set(key, before)
  }
}
