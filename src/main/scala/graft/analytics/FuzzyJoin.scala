package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Blocked fuzzy join — entity resolution at scale.
  *
  * Distributed generalization of the reference's fuzzy column matcher
  * (`/root/reference/ingest_util.py` fuzzy header resolution, SURVEY §2a
  * T3): the reference fuzz-matches a handful of header strings on the
  * driver; a training-data pipeline needs the same "match dirty strings
  * to a canonical catalog" operation over billions of rows (entity/
  * source dedup, catalog reconciliation).
  *
  * An edit-distance predicate has no equi-key, so the naive formulation
  * is an all-pairs cross join with `levenshtein() <= k` — quadratic and
  * unshardable. The scale shape is BLOCKING: derive a deterministic
  * blocking key from each string (here: first two characters, which a
  * single edit beyond position 2 cannot touch), equi-join within blocks
  * only, then run the expensive distance residually on the candidates
  * and keep each probe's best match via one per-probe window. Production
  * systems union several complementary blocking keys (length band,
  * phonetic code, k-gram sample) to cover edits in the blocked prefix;
  * one key suffices here because the synthesized corruption never edits
  * positions 1-2 — stated, not hidden.
  *
  * The probe set is synthesized deterministically from `part`: every
  * 7th part's name gets one character (position ≥ 3) deleted — so the
  * oracle can mirror the corruption and the driver verifies the whole
  * pipeline, blocking + levenshtein + best-match tie-break included
  * (Spark and DuckDB both implement plain Levenshtein edit distance).
  */
object FuzzyJoin {

  /** Registered query `x8_fuzzy_join`: corrupted part names matched back
    * to the canonical name catalog; ties break on (distance, name).
    */
  def fuzzyResolve(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.part(spark, sfDir)
    // dirty probes: drop one character at a key-derived position >= 3
    val probes = part
      .filter(col("p_partkey") % 7 === 0 && length(col("p_name")) >= 4)
      .select(col("p_partkey").as("probe_id"),
        expr("concat(substring(p_name, 1, 2 + pmod(p_partkey, length(p_name) - 2)), " +
          "substring(p_name, 4 + pmod(p_partkey, length(p_name) - 2), length(p_name)))")
          .as("dirty_name"))
    val catalog = part.select(col("p_name")).distinct()
      .withColumn("blk", substring(col("p_name"), 1, 2))
    val cands = probes
      .withColumn("blk", substring(col("dirty_name"), 1, 2))
      .join(catalog, Seq("blk"))
      .withColumn("dist", levenshtein(col("dirty_name"), col("p_name")))
      .filter(col("dist") <= 2)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("dist"), col("p_name"))
    cands.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("probe_id"), col("dirty_name"),
        col("p_name").as("matched_name"), col("dist").cast("long").as("dist"))
      .orderBy(col("probe_id"))
  }

  val fuzzyResolveSql: String =
    """WITH probes AS (
      |  SELECT p_partkey AS probe_id,
      |    substr(p_name, 1, 2 + (p_partkey % (length(p_name) - 2)))
      |      || substr(p_name, 4 + (p_partkey % (length(p_name) - 2)),
      |                length(p_name)) AS dirty_name
      |  FROM part
      |  WHERE p_partkey % 7 = 0 AND length(p_name) >= 4),
      |catalog AS (SELECT DISTINCT p_name FROM part),
      |cands AS (
      |  SELECT probe_id, dirty_name, p_name,
      |    levenshtein(dirty_name, p_name) AS dist
      |  FROM probes JOIN catalog
      |    ON substr(dirty_name, 1, 2) = substr(p_name, 1, 2)
      |  WHERE levenshtein(dirty_name, p_name) <= 2)
      |SELECT probe_id, dirty_name, p_name AS matched_name,
      |  CAST(dist AS BIGINT) AS dist
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY probe_id ORDER BY dist, p_name) AS rn
      |      FROM cands)
      |WHERE rn = 1
      |ORDER BY probe_id""".stripMargin
}
