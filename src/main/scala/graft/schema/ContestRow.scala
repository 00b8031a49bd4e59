package graft.schema

import java.sql.Date

/** Typed domain row for the normalize stage (SURVEY.md §1.4's
  * `Dataset[ContestRow]` option): compile-time field checks where the
  * pipeline is schema-stable; generic `DataFrame` stays the currency
  * for ingest, where incoming columns are unknown until mapped. */
case class ContestRow(
    contest_group_id: String,
    contest_name: String,
    election_date: Date,
    contest_type: String,
    party_contest: String,
    is_unexpired: Boolean,
    has_primary: Boolean,
    is_partisan: Boolean,
    vote_for: Long,
    term: String,
    district: String,
    county: String,
    precinct: String,
    candidate: String,
    first_name: String,
    middle_name: String,
    last_name: String,
    name_suffix_lbl: String,
    nick_name: String,
    party_candidate: String,
    election_day: Long,
    one_stop: Long,
    absentee_by_mail: Long,
    provisional: Long,
    total_votes: Long,
    winner_flag: Long,
    candidacy_date: Date)
