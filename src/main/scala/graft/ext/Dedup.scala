package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X1/X2 — deduplication suite for the `documents` table
  * (SURVEY.md §2c; the LLM-data-pipeline north star).
  *
  * Scale design (100 TB):
  *  - exact dedup is one shuffle on the dedup key (window row_number,
  *    no pre-collect);
  *  - shingling + MinHash signatures are computed per-row with
  *    higher-order functions (`transform`/`aggregate`/`xxhash64`) —
  *    NO explode/groupBy shuffle for signature building;
  *  - LSH banding turns the quadratic all-pairs problem into an
  *    equi-join on (band, bandHash): only docs sharing a band bucket
  *    meet, then the exact Jaccard check runs on that tiny candidate
  *    set via `array_intersect` (again no explode);
  *  - the exact n-gram Jaccard variant (the all-pairs shingle
  *    equi-join) exists as the oracle-verifiable ground truth — at
  *    cluster scale you'd run the LSH path.
  */
object Dedup {

  /** Distinct character 8-gram shingles of `text` as an array column —
    * pure projection, codegen'd, no shuffle. */
  val shinglesExpr: String =
    "array_distinct(transform(sequence(1, greatest(length(text) - 7, 1)), i -> substring(text, i, 8)))"

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)

  // ---- X1: exact dedup --------------------------------------------------

  /** Exact dedup by full text, keeping the lowest doc_id. Input is the
    * documents table unioned with an id-shifted copy of itself so the
    * operator has real duplicates to eliminate (testdata texts are
    * unique). Deterministic alternative to `dropDuplicates`. */
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir).select(col("doc_id"), col("text"), col("lang"), col("source"))
    val doubled = d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000))
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    doubled
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), md5(col("text")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  val exactDedupSql: String =
    """WITH doubled AS (
      |  SELECT doc_id, text, lang, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, lang, source FROM documents
      |)
      |SELECT doc_id, lang, source, md5(text) AS text_md5 FROM (
      |  SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      |  FROM doubled) t
      |WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  // ---- X2a: exact n-gram Jaccard (ground truth) -------------------------

  val JaccardThreshold = 0.5

  /** All-pairs exact Jaccard over char-8-gram shingle sets via a
    * shingle equi-join. Quadratic worst case — the verification
    * baseline; [[minhashNearDup]] is the scale path. */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = docs(spark, sfDir)
      .select(col("doc_id"), explode(expr(shinglesExpr)).as("s"))
    val sizes = docs(spark, sfDir)
      .select(col("doc_id"), expr(s"size($shinglesExpr)").as("cnt"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("si"), col("i") === col("si.doc_id"))
      .join(sizes.as("sj"), col("j") === col("sj.doc_id"))
      .select(col("i"), col("j"), col("common"),
        (col("common").cast("double") /
          (col("si.cnt") + col("sj.cnt") - col("common")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy(col("i"), col("j"))
  }

  val ngramJaccardSql: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [substr(text, i, 8) FOR i IN range(1, greatest(length(text) - 7, 1) + 1)])) AS s
      |  FROM documents),
      |sizes AS (SELECT doc_id, count(*) AS cnt FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS common
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT i, j, common,
      |  CAST(common AS DOUBLE) / CAST(si.cnt + sj.cnt - common AS DOUBLE) AS jaccard
      |FROM pairs
      |JOIN sizes si ON si.doc_id = i
      |JOIN sizes sj ON sj.doc_id = j
      |WHERE CAST(common AS DOUBLE) / CAST(si.cnt + sj.cnt - common AS DOUBLE) >= 0.5
      |ORDER BY i, j""".stripMargin

  // ---- X2b: MinHash + LSH (the 100 TB path) -----------------------------

  val NumPerms = 32
  val Bands = 16 // r = 2 rows per band

  /** MinHash signature (32 perms, xxhash64 seeded by perm index) +
    * LSH banding (16 bands × 2) + exact Jaccard verification on the
    * candidate pairs only.
    *
    * Oracled with the SAME SQL as [[ngramJaccard]]: at the testdata's
    * similarity margins (planted near-dups ≥ 0.93, random pairs
    * ≤ ~0.3) the miss probability at b=16, r=2 is (1-0.93²)¹⁶ ≈ 1e-14,
    * so LSH-then-verify provably equals the exact result. */
  def minhashNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val base = docs(spark, sfDir)
      .select(col("doc_id"), expr(shinglesExpr).as("shingles"))
      .withColumn("sig", expr(
        s"transform(sequence(0, ${NumPerms - 1}), i -> array_min(transform(shingles, s -> xxhash64(i, s))))"))
    val banded = base.select(
      col("doc_id"), col("shingles"),
      explode(expr(s"transform(sequence(0, ${Bands - 1}), j -> named_struct(" +
        "'band', j, 'bh', xxhash64(j, slice(sig, j * 2 + 1, 2))))")).as("b"))
      .select(col("doc_id"), col("shingles"), col("b.band"), col("b.bh"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.shingles").as("sa"), col("b.shingles").as("sb"))
      .dropDuplicates("i", "j")
    cand
      .withColumn("common", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("common")).cast("double"))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("i"), col("j"), col("common"), col("jaccard"))
      .orderBy(col("i"), col("j"))
  }

  // ---- X2c: SimHash -----------------------------------------------------

  /** 64-bit SimHash over char-8-gram shingles; near-dup = hamming
    * distance ≤ 3. Candidate generation by 4×16-bit chunk banding —
    * pigeonhole guarantees any pair within hamming 3 shares at least
    * one exact 16-bit chunk, so the banding loses nothing at this
    * radius. Word tokens are useless on the testdata's ~30-word vocab
    * (every doc looks alike); shingles carry ordering. Not
    * SQL-oracle-expressible (engine-specific xxhash64) — registered
    * without oracle. */
  def simhashNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val sims = docs(spark, sfDir)
      .select(col("doc_id"), expr(shinglesExpr).as("toks"))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), cast(0 as bigint), (acc, i) ->
          |  acc + if(aggregate(toks, cast(0 as bigint), (c, t) ->
          |    c + if((shiftright(xxhash64(t), i) & 1) = 1, 1, -1)) > 0,
          |    shiftleft(cast(1 as bigint), i), cast(0 as bigint)))""".stripMargin))
    val chunked = sims.select(col("doc_id"), col("simhash"),
      explode(expr("transform(sequence(0, 3), c -> named_struct(" +
        "'chunk', c, 'ck', shiftright(simhash, c * 16) & 65535))")).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.chunk"), col("c.ck"))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .dropDuplicates("i", "j")
      .filter(col("hamming") <= 3)
      .orderBy(col("i"), col("j"))
  }
}
