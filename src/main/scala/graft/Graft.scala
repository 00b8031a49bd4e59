package graft

import org.apache.spark.sql.SparkSession

/** Library front door — the one-call session a user of the engine
  * starts from:
  *
  * {{{
  *   val spark = Graft.session()          // local, extensions wired
  *   graft.SparkEntry.queries("a1_county_rollup")(spark, dir)
  * }}}
  *
  * Wires everything the library registers via
  * `SparkSessionExtensions` (custom expressions `vec_dot`/`vec_qdot`/
  * `vec_sq8dot`/`nfc_normalize`/`rolling_hash`, the `shingles`
  * generator, the TopKPerKey planner strategy, the BinnedRangeJoin
  * optimizer rule) plus the local-mode configs the mains use. On a
  * real cluster, pass the same extension class through
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` and
  * only the session-builder sugar here is local-specific.
  */
object Graft {
  /** Default core count for local sessions (measured sweet spot on
    * the 32-core contract machine — see Bench). */
  def defaultCores: Int = math.min(16, Runtime.getRuntime.availableProcessors())

  def builder(
      master: String = s"local[$defaultCores]",
      shufflePartitions: Int = 8): SparkSession.Builder =
    LocalDirs.configure(
      SparkSession.builder()
        .master(master)
        .withExtensions(new graft.functions.GraftExtensions)
        .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        // storage-partitioned joins over compactBucketed lake tables:
        // honor a V2 scan's KeyGroupedPartitioning instead of shuffling
        .config("spark.sql.sources.v2.bucketing.enabled", "true"))

  /** `getOrCreate` returns a PRE-EXISTING session unchanged (its
    * builder-time extensions never ran in that case), so the function
    * surface is (re-)registered post-hoc — temp-function registration
    * is idempotent and works on any session. The TopKPerKey strategy
    * self-registers on first use (GraftSqlShim) and the range-join
    * rule is only additive, so functions are the one piece that would
    * otherwise go missing. */
  def session(): SparkSession = {
    val s = builder().getOrCreate()
    graft.functions.VectorFunctions.register(s)
    graft.functions.StringFunctions.register(s)
    graft.functions.Shingles.register(s)
    s
  }
}
