package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join splitting — the runtime answer to skewed keys (the
  * compile-time answer, salting, lives in `analytics/SaltedJoin`).
  * A hot key's shuffle partition is split into task-sized chunks and
  * the other side's matching partition is replicated. This spec pins
  * the thresholds that make it fire, on a deliberately skewed join.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // testdata-sized skew thresholds (defaults assume GB partitions)
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.shuffle.partitions", "8")
      import spark.implicits._
      // one hot key (0) carrying a third of all rows — its shuffle
      // partition dwarfs the median, which is what AQE's PER-PARTITION
      // skew detection keys on (a merely-popular key hides inside an
      // average partition). No aggregate downstream: a required hash
      // distribution would veto the split (forceOptimizeSkewedJoin off)
      val skewed = spark.range(0, 60000)
        .select((when(col("id") % 3 === 0, 0L).otherwise(col("id") % 500)).as("k"),
          col("id").as("v"))
      val dim = spark.range(0, 500).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = skewed.join(dim, "k").select(col("v"), col("w"))
      // drive THIS dataset's own execution (count() would plan a separate
      // query and leave joined's adaptive plan un-finalized)
      assert(joined.collect().length === 60000)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true"), finalPlan)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
