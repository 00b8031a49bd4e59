package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection — Catalyst's answer to semi-join
  * pruning at 100 TB: when one side of a shuffle join is selectively
  * filtered, the optimizer builds a bloom filter over its join keys
  * and pushes a `might_contain` probe into the other side's scan, so
  * fact rows that can't match never reach the shuffle. Free (no query
  * change) — this spec pins the conditions under which it fires, since
  * the thresholds silently disable it on small data.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom probe into the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffle join (broadcast would prune by itself) and
      // drop the size gates that assume cluster-scale inputs
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val l = Tables.lineitem(spark, sf)
      val s = Tables.supplier(spark, sf).filter(col("s_acctbal") > 9900.0) // selective
      val joined = l.join(s, l("l_suppkey") === s("s_suppkey"))
        .groupBy(col("s_name")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") || optimized.contains("BloomFilter")
        || optimized.contains("might_contain"), optimized)
      assert(joined.count() >= 0) // executes cleanly with the probe in place
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
