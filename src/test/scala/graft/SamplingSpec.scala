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
