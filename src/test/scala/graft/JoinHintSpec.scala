package graft

import org.apache.spark.sql.functions._

/** Join-strategy hints — the manual override when AQE's choice is
  * wrong for a known workload (the 100 TB tuning lever): pin each hint
  * to the physical operator it must produce, so a Spark upgrade that
  * silently stops honoring one fails loudly here.
  */
class JoinHintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(hint: String): String = {
    val l = Tables.lineitem(spark, sf)
    val s = Tables.supplier(spark, sf)
    l.join(s.hint(hint), l("l_suppkey") === s("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
  }

  test("broadcast hint → BroadcastHashJoin") {
    assert(planOf("broadcast").contains("BroadcastHashJoin"))
  }

  test("merge hint → SortMergeJoin") {
    assert(planOf("merge").contains("SortMergeJoin"))
  }

  test("shuffle_hash hint → ShuffledHashJoin") {
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"))
  }

  test("hints survive through aggregation pushdown unchanged results") {
    import spark.implicits._
    val a = planOf("broadcast")
    val counts = Seq("broadcast", "merge", "shuffle_hash").map { h =>
      val l = Tables.lineitem(spark, sf)
      val s = Tables.supplier(spark, sf)
      l.join(s.hint(h), l("l_suppkey") === s("s_suppkey"))
        .groupBy(col("s_name")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n"))).as[Long].head()
    }
    assert(counts.distinct.size === 1, s"strategy changed the result: $counts; $a")
  }
}
