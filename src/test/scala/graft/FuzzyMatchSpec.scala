package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.FuzzyMatch

/** T3 — threshold-60 fuzzy mapping + candidate→choice fallback
  * (/root/reference/ingestor_precinct.py:125-132). */
class FuzzyMatchSpec extends AnyFunSuite {

  test("exact and near matches score high") {
    assert(FuzzyMatch.ratio("county", "County") === 100)
    assert(FuzzyMatch.ratio("election_date", "Election Date") === 100)
    assert(FuzzyMatch.ratio("total_votes", "Total Votes") === 100)
    assert(FuzzyMatch.ratio("contest_name", "Contest Name") === 100)
  }

  test("unrelated names score below threshold") {
    assert(FuzzyMatch.ratio("candidate", "zzzz") < FuzzyMatch.Threshold)
  }

  test("mapColumns picks best incoming column per schema column") {
    val m = FuzzyMatch.mapColumns(
      Seq("county", "election_date", "total_votes"),
      Seq("County", "Election Date", "Total Votes", "Junk"))
    assert(m === Map(
      "county" -> "County",
      "election_date" -> "Election Date",
      "total_votes" -> "Total Votes"))
  }

  test("candidate falls back to matching 'choice'") {
    val m = FuzzyMatch.mapColumns(Seq("candidate"), Seq("Choice", "County"))
    assert(m === Map("candidate" -> "Choice"))
  }

  test("no mapping emitted when nothing clears the threshold") {
    val m = FuzzyMatch.mapColumns(Seq("winner_flag"), Seq("abc", "xyz"))
    assert(m.isEmpty)
  }
}
