package graft.schema

import org.apache.spark.sql.types._

/** Canonical "grand schema" of the reference's contest tables.
  *
  * Columns: /root/reference/schema_precinct.csv:1 and
  * schema_county.csv:1; types from the JDBC sink dtype map at
  * /root/reference/ingestor_precinct.py:192-218.
  *
  * The reference loads a header-only CSV as an empty pandas frame and
  * uses it both as a fuzzy-match target and as a schema-alignment
  * skeleton. Here the schema is a `StructType` constant: it drives
  * [[graft.ops.SchemaAlign]] (union-pad missing columns, canonical
  * order) and [[graft.ops.Normalize]] (fuzzy target names).
  *
  * Measures are `LongType` rather than the reference's 32-bit Integer:
  * at the 100 TB design point vote-count sums overflow Int, and parquet
  * stats/pushdown work identically for int64.
  */
object ContestSchema {

  val precinct: StructType = StructType(Seq(
    StructField("contest_group_id", StringType),
    StructField("contest_name", StringType),
    StructField("election_date", DateType),
    StructField("contest_type", StringType),
    StructField("party_contest", StringType),
    StructField("is_unexpired", BooleanType),
    StructField("has_primary", BooleanType),
    StructField("is_partisan", BooleanType),
    StructField("vote_for", LongType),
    StructField("term", StringType),
    StructField("district", StringType),
    StructField("county", StringType),
    StructField("precinct", StringType),
    StructField("candidate", StringType),
    StructField("first_name", StringType),
    StructField("middle_name", StringType),
    StructField("last_name", StringType),
    StructField("name_suffix_lbl", StringType),
    StructField("nick_name", StringType),
    StructField("party_candidate", StringType),
    StructField("election_day", LongType),
    StructField("one_stop", LongType),
    StructField("absentee_by_mail", LongType),
    StructField("provisional", LongType),
    StructField("total_votes", LongType),
    StructField("winner_flag", LongType),
    StructField("candidacy_date", DateType),
  ))

  /** contest_county = the contest_precinct field SET minus `precinct`,
    * in the reference's own county column ORDER (schema_county.csv:1
    * puts election_date first and the boolean flags after
    * party_candidate — a different order than the precinct layout). */
  val county: StructType = {
    val byName = precinct.fields.map(f => f.name -> f).toMap
    StructType(Seq(
      "election_date", "contest_group_id", "contest_name", "contest_type",
      "party_contest", "vote_for", "term", "district", "county",
      "candidate", "first_name", "middle_name", "last_name",
      "name_suffix_lbl", "nick_name", "party_candidate",
      "is_unexpired", "has_primary", "is_partisan",
      "election_day", "one_stop", "absentee_by_mail", "provisional",
      "total_votes", "winner_flag", "candidacy_date").map(byName))
  }

  val precinctColumns: Seq[String] = precinct.fieldNames.toSeq
  val countyColumns: Seq[String] = county.fieldNames.toSeq

  /** S6 — the reference's "empty typed frame from a header-only CSV"
    * (ingestor_precinct.py:20), Spark-native: zero rows, full schema.
    * Union target / alignment skeleton. */
  def emptyFrame(spark: org.apache.spark.sql.SparkSession,
      schema: StructType = precinct): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
}
