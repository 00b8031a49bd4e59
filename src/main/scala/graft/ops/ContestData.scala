package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic contest_precinct-shaped frame derived from the driver
  * testdata `lineitem` table.
  *
  * The reference's domain tables (contest_precinct / contest_county,
  * /root/reference/README.md:15-57) don't exist in the driver testdata,
  * so every contest-pipeline query (A1 rollup, T2 district extraction,
  * U1 schema-align, ...) runs over this synthesized projection instead.
  * The mapping is pure column arithmetic on lineitem — a narrow
  * projection with no shuffle, which Catalyst collapses into the
  * parquet scan — and is mirrored 1:1 by [[oracleCte]] so DuckDB can
  * replay it for the correctness diff.
  *
  * Everything is integer/modular arithmetic or string concat: no
  * floating point, so engine/oracle results are bit-identical.
  */
object ContestData {

  private def s(c: Column): Column = c.cast("string")

  /** Spark-side synthesis. Mirror of [[oracleCte]] — keep in sync. */
  def precinct(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val ok = col("l_orderkey"); val pk = col("l_partkey"); val sk = col("l_suppkey")
    val party: Column => Column = k =>
      when(k % 3 === 0, "DEM").when(k % 3 === 1, "REP").otherwise("LIB")
    l.select(
      concat(lit("G"), s(ok % 50)).as("contest_group_id"),
      concat(lit("CONTEST "), col("l_returnflag")).as("contest_name"),
      date_trunc("month", col("l_shipdate")).cast("date").as("election_date"),
      when(ok % 2 === 0, "state").otherwise("county").as("contest_type"),
      party(pk).as("party_contest"),
      (ok % 3 === 0).as("is_unexpired"),
      (pk % 2 === 0).as("has_primary"),
      (sk % 3 === 0).as("is_partisan"),
      col("l_linenumber").cast("long").as("vote_for"),
      when(sk % 2 === 0, "4yr").otherwise("2yr").as("term"),
      s(col("l_linenumber") % 7).as("district"),
      concat(lit("COUNTY_"), s(sk % 10)).as("county"),
      concat(lit("P"), s(pk % 20)).as("precinct"),
      concat(lit("CAND_"), s(pk % 5)).as("candidate"),
      concat(lit("FN"), s(pk % 5)).as("first_name"),
      when(ok % 7 === 0, "M").otherwise(lit(null).cast("string")).as("middle_name"),
      concat(lit("LN"), s(pk % 5)).as("last_name"),
      when(ok % 11 === 0, "JR").otherwise(lit(null).cast("string")).as("name_suffix_lbl"),
      when(ok % 13 === 0, "NICK").otherwise(lit(null).cast("string")).as("nick_name"),
      party(sk).as("party_candidate"),
      (ok % 97).as("election_day"),
      (pk % 89).as("one_stop"),
      (sk % 83).as("absentee_by_mail"),
      (ok % 13).as("provisional"),
      (ok % 97 + pk % 89 + sk % 83 + ok % 13).as("total_votes"),
      when(ok % 10 === 0, 1L).otherwise(0L).as("winner_flag"),
      date_trunc("year", col("l_shipdate")).cast("date").as("candidacy_date"),
    )
  }

  /** Typed view of [[precinct]] (`Dataset[ContestRow]`, SURVEY §1.4). */
  def typedPrecinct(spark: SparkSession, sfDir: String)
      : org.apache.spark.sql.Dataset[graft.schema.ContestRow] = {
    import spark.implicits._
    precinct(spark, sfDir)
      .select(graft.schema.ContestSchema.precinctColumns.map(col): _*)
      .as[graft.schema.ContestRow]
  }

  /** Raw contest names for exercising F1/T2 (district extraction):
    * part-table-derived names hitting each regex branch — digit,
    * single-letter, roman numeral, mixed case, and no-district.
    * `district` starts null so the F2 gate passes. Mirror of
    * [[oracleRawNamesCte]].
    *
    * Note: every name contains at most ONE 'DISTRICT' occurrence, so
    * the DuckDB oracle can split on the first occurrence (RE2 has no
    * lookbehind for a last-occurrence regex); multi-occurrence rsplit
    * fidelity is covered by the ScalaTest suite instead. */
  def rawContestNames(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
    val pk = col("p_partkey"); val sz = col("p_size")
    p.select(
      pk.as("row_id"),
      when(pk % 5 === 0, lit("US SENATE"))
        .when(pk % 5 === 1, concat(lit("US HOUSE OF REPRESENTATIVES DISTRICT "), s(sz)))
        .when(pk % 5 === 2, concat(lit("SUPERIOR COURT DISTRICT "), expr("char(65 + p_size % 26)")))
        .when(pk % 5 === 3, concat(lit("SANITARY DISTRICT "),
          element_at(array(Seq("I", "II", "III", "IV", "V", "VI", "VII", "VIII").map(lit): _*),
            (sz % 8 + 1).cast("int"))))
        .otherwise(concat(lit("Board of Education District "), s(sz % 10)))
        .as("contest_name"),
      lit(null).cast("string").as("district"),
    )
  }

  val oracleRawNamesCte: String =
    """WITH raw_names AS (
      |  SELECT
      |    p_partkey AS row_id,
      |    CASE p_partkey % 5
      |      WHEN 0 THEN 'US SENATE'
      |      WHEN 1 THEN 'US HOUSE OF REPRESENTATIVES DISTRICT ' || CAST(p_size AS VARCHAR)
      |      WHEN 2 THEN 'SUPERIOR COURT DISTRICT ' || chr(65 + p_size % 26)
      |      WHEN 3 THEN 'SANITARY DISTRICT ' || (['I','II','III','IV','V','VI','VII','VIII'])[p_size % 8 + 1]
      |      ELSE 'Board of Education District ' || CAST(p_size % 10 AS VARCHAR)
      |    END AS contest_name,
      |    CAST(NULL AS VARCHAR) AS district
      |  FROM part
      |)""".stripMargin

  /** DuckDB CTE reproducing [[precinct]] verbatim over the same parquet
    * `lineitem` table. Prepend to any contest-query oracle SQL. */
  val oracleCte: String =
    """WITH contest_precinct AS (
      |  SELECT
      |    'G' || CAST(l_orderkey % 50 AS VARCHAR) AS contest_group_id,
      |    'CONTEST ' || l_returnflag AS contest_name,
      |    CAST(date_trunc('month', l_shipdate) AS DATE) AS election_date,
      |    CASE WHEN l_orderkey % 2 = 0 THEN 'state' ELSE 'county' END AS contest_type,
      |    CASE l_partkey % 3 WHEN 0 THEN 'DEM' WHEN 1 THEN 'REP' ELSE 'LIB' END AS party_contest,
      |    l_orderkey % 3 = 0 AS is_unexpired,
      |    l_partkey % 2 = 0 AS has_primary,
      |    l_suppkey % 3 = 0 AS is_partisan,
      |    CAST(l_linenumber AS BIGINT) AS vote_for,
      |    CASE WHEN l_suppkey % 2 = 0 THEN '4yr' ELSE '2yr' END AS term,
      |    CAST(l_linenumber % 7 AS VARCHAR) AS district,
      |    'COUNTY_' || CAST(l_suppkey % 10 AS VARCHAR) AS county,
      |    'P' || CAST(l_partkey % 20 AS VARCHAR) AS precinct,
      |    'CAND_' || CAST(l_partkey % 5 AS VARCHAR) AS candidate,
      |    'FN' || CAST(l_partkey % 5 AS VARCHAR) AS first_name,
      |    CASE WHEN l_orderkey % 7 = 0 THEN 'M' ELSE NULL END AS middle_name,
      |    'LN' || CAST(l_partkey % 5 AS VARCHAR) AS last_name,
      |    CASE WHEN l_orderkey % 11 = 0 THEN 'JR' ELSE NULL END AS name_suffix_lbl,
      |    CASE WHEN l_orderkey % 13 = 0 THEN 'NICK' ELSE NULL END AS nick_name,
      |    CASE l_suppkey % 3 WHEN 0 THEN 'DEM' WHEN 1 THEN 'REP' ELSE 'LIB' END AS party_candidate,
      |    l_orderkey % 97 AS election_day,
      |    l_partkey % 89 AS one_stop,
      |    l_suppkey % 83 AS absentee_by_mail,
      |    l_orderkey % 13 AS provisional,
      |    l_orderkey % 97 + l_partkey % 89 + l_suppkey % 83 + l_orderkey % 13 AS total_votes,
      |    CAST(CASE WHEN l_orderkey % 10 = 0 THEN 1 ELSE 0 END AS BIGINT) AS winner_flag,
      |    CAST(date_trunc('year', l_shipdate) AS DATE) AS candidacy_date
      |  FROM lineitem
      |)""".stripMargin
}
