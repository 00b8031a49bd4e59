package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.ContestSchema

/** Oracled query forms of the ingest-pipeline operators (SURVEY.md §2a):
  * P1–P4 normalize, F1 regex filter, T1+T2 district extraction,
  * U1 schema-align, V1 preview. Each runs on driver testdata
  * ([[ContestData]] projections) and has a DuckDB mirror.
  */
object ContestQueries {

  // ---- P1-P4: mapping applier (projection+rename+literal+date parse) ----

  private val normalizeMapping = Seq(
    "o_orderkey" -> "order_id",
    "o_totalprice" -> "total_price",
    "o_orderpriority" -> "priority",
    "NC" -> "county",            // P3: constant injection
    "11/06/2012" -> "election_date", // P4: constant date parse
  )

  def normalize(spark: SparkSession, sfDir: String): DataFrame =
    Normalize(graft.Tables.orders(spark, sfDir), normalizeMapping)
      .withColumn("election_date", col("election_date").cast("string"))
      .orderBy(col("order_id"))

  val normalizeSql: String =
    """SELECT o_orderkey AS order_id, o_totalprice AS total_price,
      |  o_orderpriority AS priority, 'NC' AS county,
      |  CAST(DATE '2012-11-06' AS VARCHAR) AS election_date
      |FROM orders
      |ORDER BY order_id""".stripMargin

  // ---- F1: regex predicate ----

  def regexFilter(spark: SparkSession, sfDir: String): DataFrame =
    ContestData.rawContestNames(spark, sfDir)
      .filter(col("contest_name").rlike(DistrictExtract.patterns.head))
      .select(col("row_id"), col("contest_name"))
      .orderBy(col("row_id"))

  val regexFilterSql: String =
    ContestData.oracleRawNamesCte +
      """
        |SELECT row_id, contest_name FROM raw_names
        |WHERE regexp_matches(contest_name, '(?i)DISTRICT \d')
        |ORDER BY row_id""".stripMargin

  // ---- T1+T2 (+F2 gate): district extraction ----

  def districtExtract(spark: SparkSession, sfDir: String): DataFrame =
    DistrictExtract.withGate(ContestData.rawContestNames(spark, sfDir))
      .select(col("row_id"), col("contest_name"), col("district"))
      .orderBy(col("row_id"))

  /** Single-'DISTRICT'-occurrence inputs ⇒ first-occurrence split is
    * rsplit-equivalent and the 3 sequential patterns collapse to one
    * alternation (rewritten names contain no 'DISTRICT'). */
  val districtExtractSql: String =
    ContestData.oracleRawNamesCte +
      """
        |SELECT row_id,
        |  CASE WHEN m THEN substr(u, 1, strpos(u, 'DISTRICT') - 1) ELSE contest_name END AS contest_name,
        |  CASE WHEN m THEN substr(u, strpos(u, 'DISTRICT') + 8) ELSE district END AS district
        |FROM (
        |  SELECT row_id, contest_name, district, upper(contest_name) AS u,
        |    regexp_matches(contest_name,
        |      '(?i)(DISTRICT \d|DISTRICT [a-z]\b|DISTRICT (IX|I?V|V?I{1,3})\b)') AS m
        |  FROM raw_names) t
        |ORDER BY row_id""".stripMargin

  // ---- U1: schema-aligned union/pad ----

  def schemaAlign(spark: SparkSession, sfDir: String): DataFrame = {
    val partial = ContestData.precinct(spark, sfDir)
      .select(col("contest_name"), col("county"), col("total_votes"))
    SchemaAlign(partial, ContestSchema.precinct)
      .withColumn("election_date", col("election_date").cast("string"))
      .withColumn("candidacy_date", col("candidacy_date").cast("string"))
      .orderBy(col("contest_name"), col("county"), col("total_votes"))
  }

  val schemaAlignSql: String = {
    val cols = ContestSchema.precinctColumns.map {
      case c @ ("contest_name" | "county" | "total_votes") => c
      case c @ ("election_date" | "candidacy_date") => s"CAST(NULL AS VARCHAR) AS $c"
      case c @ ("is_unexpired" | "has_primary" | "is_partisan") => s"CAST(NULL AS BOOLEAN) AS $c"
      case c @ ("vote_for" | "election_day" | "one_stop" | "absentee_by_mail" |
                "provisional" | "winner_flag") => s"CAST(NULL AS BIGINT) AS $c"
      case c => s"CAST(NULL AS VARCHAR) AS $c"
    }
    ContestData.oracleCte +
      s"""
         |SELECT ${cols.mkString(", ")}
         |FROM contest_precinct
         |ORDER BY contest_name, county, total_votes""".stripMargin
  }

  // ---- A2: contest winners (the domain question the rollup feeds) ----

  /** Winner per contest: rank candidates inside each county-level
    * contest by rolled-up total_votes (ties → candidate name). This is
    * what `winner_flag` encodes in the reference's domain — computed
    * here from first principles over the A1 output. */
  def winners(spark: SparkSession, sfDir: String): DataFrame = {
    // winners only need the rolled-up total_votes — aggregate it
    // directly rather than paying for A1's 9 collect_sets + 11 other
    // aggregates (the full rollup is CountyRollup; its oracle mirror
    // below uses the same single-sum county CTE)
    val county = ContestData.precinct(spark, sfDir)
      .withColumn("election_date", col("election_date").cast("string"))
      .groupBy(CountyRollup.groupKeys.map(col): _*)
      .agg(sum(col("total_votes")).as("total_votes"))
    // arg-max via the custom bounded-heap top-k operator (k = 1):
    // "highest votes, ties to the lexicographically first candidate"
    // with one running champion per group and NO sort anywhere — the
    // window formulation sorts every partition of the candidate-level
    // frame, and a min_by-over-struct aggregate falls back to
    // SortAggregate (string-in-struct buffers aren't hash-aggregable),
    // which is how this query originally cost ~4x the A1 shuffle
    graft.plans.TopKPerKey(county, 1,
        Seq("election_date", "contest_group_id", "contest_name", "district", "county"),
        Seq(("total_votes", true), ("candidate", false)))
      .select(col("election_date"), col("contest_group_id"), col("contest_name"),
        col("district"), col("county"), col("candidate").as("winner"),
        col("total_votes"))
      .orderBy(col("election_date"), col("contest_group_id"), col("contest_name"),
        col("district"), col("county"))
  }

  val winnersSql: String =
    ContestData.oracleCte +
      """,
        |county AS (
        |  SELECT CAST(election_date AS VARCHAR) AS election_date, contest_group_id,
        |    contest_name, district, county, candidate,
        |    CAST(SUM(total_votes) AS BIGINT) AS total_votes
        |  FROM contest_precinct
        |  GROUP BY 1, 2, 3, 4, 5, 6)
        |SELECT election_date, contest_group_id, contest_name, district, county,
        |  candidate AS winner, total_votes
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY election_date, contest_group_id, contest_name, district, county
        |    ORDER BY total_votes DESC, candidate) AS rk
        |  FROM county) t
        |WHERE rk = 1
        |ORDER BY election_date, contest_group_id, contest_name, district, county""".stripMargin

  // ---- V1: preview head + fillna ----

  def preview(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = Seq("contest_name", "county", "precinct", "candidate", "middle_name")
    ContestData.precinct(spark, sfDir)
      .select((cols.map(col) :+ col("total_votes")): _*)
      .na.fill(".")
      .orderBy((cols.map(col) :+ col("total_votes")): _*)
      .limit(5)
  }

  val previewSql: String =
    ContestData.oracleCte +
      """
        |SELECT contest_name, county, precinct, candidate,
        |  COALESCE(middle_name, '.') AS middle_name, total_votes
        |FROM contest_precinct
        |ORDER BY contest_name, county, precinct, candidate,
        |  COALESCE(middle_name, '.'), total_votes
        |LIMIT 5""".stripMargin
}
