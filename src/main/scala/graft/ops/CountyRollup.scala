package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A1 — the reference's flagship query: the county rollup that
  * materializes contest_county from contest_precinct
  * (/root/reference/README.md:61-90).
  *
  * GROUP BY (election_date, contest_group_id, contest_name, district,
  * county, candidate); 9 `string_agg(distinct x, '|')`, `max(vote_for)`,
  * `max(candidacy_date)`, 3 `bool_or`, 6 `sum`.
  *
  * Postgres `string_agg(DISTINCT …)` has unspecified order; the engine
  * defines the semantics as SORTED distinct join
  * (`array_join(array_sort(collect_set(x)), "|")`) so results are
  * deterministic and oracle-comparable (SURVEY.md §4). DuckDB mirror:
  * `COALESCE(string_agg(DISTINCT x, '|' ORDER BY x), '')` — collect_set
  * of all-null yields [] → array_join '' ; string_agg yields NULL.
  *
  * Scale: one hash-aggregate with map-side partial aggregation over the
  * 6-key group; collect_set partials stay small (low per-group
  * cardinality by construction of the domain — party/type/name fields).
  * No join, no window: at 100 TB this is a single shuffle on the group
  * key, and AQE coalesces post-shuffle partitions.
  */
object CountyRollup {

  val groupKeys: Seq[String] =
    Seq("election_date", "contest_group_id", "contest_name", "district", "county", "candidate")

  private val stringAggCols = Seq(
    "contest_type", "party_contest", "first_name", "middle_name", "last_name",
    "name_suffix_lbl", "nick_name", "party_candidate", "term")

  private val boolOrCols = Seq("is_unexpired", "has_primary", "is_partisan")

  private val sumCols = Seq(
    "absentee_by_mail", "one_stop", "provisional", "election_day", "total_votes", "winner_flag")

  /** Sorted-distinct pipe-join — engine-canonical string_agg(distinct). */
  private def sortedDistinctJoin(c: String) =
    array_join(array_sort(collect_set(col(c))), "|").as(c)

  /** Output convention: DATE columns leave as ISO-8601 strings so the
    * oracle hash-compare is representation-independent (engine parquet
    * DATE vs DuckDB DATE round-trip differently through pandas). */
  def apply(precinct: DataFrame): DataFrame = {
    val aggs =
      stringAggCols.map(sortedDistinctJoin) ++
      Seq(max(col("vote_for")).as("vote_for"),
          max(col("candidacy_date")).cast("string").as("candidacy_date")) ++
      boolOrCols.map(c => bool_or(col(c)).as(c)) ++
      sumCols.map(c => sum(col(c)).as(c))
    precinct
      .withColumn("election_date", col("election_date").cast("string"))
      .groupBy(groupKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Materialize contest_county (the reference's `CREATE TABLE
    * contest_county AS …`, README.md:59-90) as parquet partitioned by
    * election_date: at 100 TB every downstream query filtering on the
    * election prunes to its partition before any IO. */
  def materialize(precinct: DataFrame, outPath: String): Unit =
    apply(precinct).write
      .mode("overwrite")
      .partitionBy("election_date")
      .parquet(outPath)

  /** DuckDB oracle body (append to [[ContestData.oracleCte]]). */
  val oracleSelect: String = {
    val sAgg = stringAggCols.map(c =>
      s"COALESCE(string_agg(DISTINCT $c, '|' ORDER BY $c), '') AS $c")
    val bOr = boolOrCols.map(c => s"bool_or($c) AS $c")
    val sums = sumCols.map(c => s"CAST(SUM($c) AS BIGINT) AS $c")
    val keys = groupKeys.map {
      case "election_date" => "CAST(election_date AS VARCHAR) AS election_date"
      case k => k
    }
    s"""SELECT ${keys.mkString(", ")},
       |  ${(sAgg ++ Seq("CAST(MAX(vote_for) AS BIGINT) AS vote_for",
                         "CAST(MAX(candidacy_date) AS VARCHAR) AS candidacy_date") ++ bOr ++ sums).mkString(",\n  ")}
       |FROM contest_precinct
       |GROUP BY ${groupKeys.mkString(", ")}
       |ORDER BY ${groupKeys.mkString(", ")}""".stripMargin
  }
}
