package graft

import org.apache.spark.sql.functions._
import graft.ops.CountyRollup

case class PrecRow(
    election_date: String, contest_group_id: String, contest_name: String,
    district: String, county: String, candidate: String,
    contest_type: String, party_contest: String, first_name: String,
    middle_name: String, last_name: String, name_suffix_lbl: String,
    nick_name: String, party_candidate: String, term: String,
    is_unexpired: Boolean, has_primary: Boolean, is_partisan: Boolean,
    vote_for: Long, candidacy_date: String,
    election_day: Long, one_stop: Long, absentee_by_mail: Long,
    provisional: Long, total_votes: Long, winner_flag: Long)

/** A1 semantics on a hand-computed frame (the oracle covers the full
  * testdata path; this locks the aggregate definitions themselves). */
class CountyRollupSpec extends SparkSpec {
  import spark.implicits._

  test("rollup aggregates: sorted-distinct join, bool_or, sums, maxes") {
    val precinct = Seq(
      PrecRow("2024-01-01", "G1", "C", "d", "W", "A", "state", "REP", "FN1", null,
        "LN1", null, null, "DEM", "4yr", true, false, false, 3L, "2023-01-01",
        1L, 2L, 3L, 4L, 10L, 0L),
      PrecRow("2024-01-01", "G1", "C", "d", "W", "A", "county", "DEM", "FN1", "M",
        "LN1", null, null, "DEM", "2yr", false, true, false, 5L, "2023-06-01",
        10L, 20L, 30L, 40L, 100L, 1L),
    ).toDS().toDF()
      .withColumn("election_date", col("election_date").cast("date"))
      .withColumn("candidacy_date", col("candidacy_date").cast("date"))

    val out = CountyRollup(precinct).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("contest_type") === "county|state") // sorted
    assert(r.getAs[String]("party_contest") === "DEM|REP")
    assert(r.getAs[String]("middle_name") === "M") // nulls skipped
    assert(r.getAs[String]("nick_name") === "")    // all-null → empty join
    assert(r.getAs[String]("term") === "2yr|4yr")
    assert(r.getAs[Long]("vote_for") === 5L)               // max
    assert(r.getAs[String]("candidacy_date") === "2023-06-01") // max, ISO string
    assert(r.getAs[Boolean]("is_unexpired") === true)  // bool_or
    assert(r.getAs[Boolean]("has_primary") === true)
    assert(r.getAs[Boolean]("is_partisan") === false)
    assert(r.getAs[Long]("total_votes") === 110L)
    assert(r.getAs[Long]("winner_flag") === 1L)
    assert(r.getAs[Long]("election_day") === 11L)
  }
}
