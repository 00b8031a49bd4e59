package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline observability: `observe()` attaches metric aggregates to a
  * running query (collected as the rows stream through — no second
  * pass over the data), which is how a production ingest job reports
  * rows-read / bytes / null-rate without doubling its I/O. */
class ObservationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("observe(): ingest metrics ride the query, no extra scan") {
    val obs = Observation("ingest_metrics")
    val docs = Tables.documents(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(col("n_chars")).as("chars_in"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("null_lang"))
    // downstream consumes a FILTERED view; the observation still sees
    // every row that passed through its point in the plan
    val kept = docs.filter(col("n_chars") > 100).count()
    val m = obs.get
    val total = Tables.documents(spark, sf).count()
    assert(m("rows_in") === total)
    assert(kept < total)
    assert(m("null_lang") === 0L)
    assert(m("chars_in").asInstanceOf[Long] > 0L)
  }

  test("observe() composes with the flagship rollup") {
    val obs = Observation("rollup_metrics")
    val out = SparkEntry.queries("a1_county_rollup")(spark, sf)
      .observe(obs, count(lit(1)).as("groups_out"))
    val n = out.count()
    assert(obs.get("groups_out") === n)
  }
}
