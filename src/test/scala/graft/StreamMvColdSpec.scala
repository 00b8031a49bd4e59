package graft

/** Regression guard for the serve-plan memo × in-place view rebuild
  * (round 14): [[graft.lake.MatView]] `defineImpl` deletes and
  * rebuilds the view table on every call, reproducing the same
  * version pins over fresh data-file UUIDs — a memoized serve plan
  * from the previous invocation would execute over the deleted files.
  * `x6_stream_mv` is the query that exposed it (plain `define` per
  * invocation, so Bench's min-of-2 second run failed pass-then-fail),
  * and the Bench cold pass (invalidateMemos → identical rebuild) is
  * the second exposure, covered by MatViewMaintenanceSpec's replay. */
class StreamMvColdSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  test("x6_stream_mv min-of-2 then cold") {
    val q = SparkEntry.queries("x6_stream_mv")
    q(spark, sf).count()
    spark.catalog.clearCache()
    q(spark, sf).count()   // bench min-of-2: define rm+rebuilds the view
    spark.catalog.clearCache()
    SparkEntry.invalidateMemos()
    q(spark, sf).count()   // bench cold pass
    SparkEntry.invalidateMemos()
  }
}
