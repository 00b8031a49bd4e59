package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** End-to-end corpus cleaning — the composite a training-data team
  * actually ships, wired from the engine's own operators in one plan:
  *
  *   1. language gate (tokenizer coverage: en/de/es/fr);
  *   2. length gate (100 ≤ n_chars ≤ 500);
  *   3. repetition gate (top unigram ≤ 20% of tokens — the
  *      [[TextStats.qualitySignals]] filter, applied);
  *   4. exact dedup among survivors (keep lowest doc_id per text);
  *   5. near-dedup among the remainder: candidate pairs from shared
  *      RARE shingles (df ≤ [[Dedup.MaxShingleDf]] stop-shingle
  *      pruning, same as [[Dedup.ngramJaccard]]), verified at full-set
  *      Jaccard ≥ [[Dedup.JaccardThreshold]]; the higher id of each
  *      verified pair is dropped.
  *
  * The output is the AUDIT view — every document with its fate and the
  * first stage that dropped it — because that is what a pipeline owner
  * debugs with (and it makes every stage's behavior driver-verifiable
  * at once; a kept-only view is a trivial filter on top).
  *
  * Deliberate semantics: gates are evaluated on ALL docs (a doc failing
  * the language gate reports 'lang' even if it is also too long);
  * near-dup drops the higher id of a pair even when the lower id was
  * itself near-dup-dropped (the standard one-pass keep-first rule —
  * transitive re-keeping needs the connected-components pass,
  * [[Dedup.dupClusters]], which exists separately).
  *
  * Scale: gates are narrow projections; the repetition gate is one
  * (doc_id, token) aggregate in INTEGER arithmetic (`top_n * 5 ≤
  * n_tokens`, no division); exact dedup is one window on text; the
  * near-dup stage inherits ngramJaccard's bounded-quadratic candidate
  * join. Everything shuffles on doc-level or token-level keys only.
  */
object CleanPipeline {

  def cleanPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    // repetition gate input: top unigram count vs token count
    val toks = d.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val topN = toks.select(col("doc_id"), explode(col("toks")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id")).agg(max(col("n")).as("top_n"))
    val flags = d
      .join(toks.select(col("doc_id"), size(col("toks")).cast("long").as("n_toks")), Seq("doc_id"))
      .join(topN, Seq("doc_id"))
      .select(col("doc_id"), col("text"),
        col("lang").isin("en", "de", "es", "fr").as("ok_lang"),
        (col("n_chars") >= 100 && col("n_chars") <= 500).as("ok_len"),
        (col("top_n") * 5 <= col("n_toks")).as("ok_rep"))
    val gated = flags.filter(col("ok_lang") && col("ok_len") && col("ok_rep"))
    // exact dedup among gate survivors
    val exact = gated.withColumn("rn",
      row_number().over(Window.partitionBy(col("text")).orderBy(col("doc_id"))))
    val exactKept = exact.filter(col("rn") === 1).select(col("doc_id"), col("text"))
    // near-dedup among exact survivors: rare-shingle candidates,
    // full-set jaccard verify, drop the higher id of each pair
    val sh = exactKept
      .select(col("doc_id"), explode(expr(Dedup.shinglesExpr)).as("s"))
    val rarePairs = sh.groupBy(col("s"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= Dedup.MaxShingleDf)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ids) - 2), a ->
          |  transform(sequence(a + 1, size(ids) - 1), b ->
          |    struct(ids[a] AS i, ids[b] AS j))))""".stripMargin)).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j")).distinct()
    val sets = exactKept.select(col("doc_id"), expr(Dedup.shinglesExpr).as("shingles"))
    val nearDropped = rarePairs
      .join(sets.as("si"), col("i") === col("si.doc_id"))
      .join(sets.as("sj"), col("j") === col("sj.doc_id"))
      .withColumn("common",
        size(array_intersect(col("si.shingles"), col("sj.shingles"))).cast("long"))
      .filter(col("common").cast("double") /
        (size(col("si.shingles")) + size(col("sj.shingles")) - col("common")).cast("double")
        >= Dedup.JaccardThreshold)
      .select(col("j").as("doc_id")).distinct()
      .withColumn("near_dropped", lit(true))
    // audit view: first failing stage per doc
    flags
      .join(exact.select(col("doc_id"), col("rn")), Seq("doc_id"), "left")
      .join(nearDropped, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(!col("ok_lang"), "lang")
          .when(!col("ok_len"), "length")
          .when(!col("ok_rep"), "repetition")
          .when(col("rn") > 1, "exact_dup")
          .when(col("near_dropped"), "near_dup")
          .otherwise("kept").as("reason"))
      .withColumn("kept", col("reason") === "kept")
      .orderBy(col("doc_id"))
  }

  val cleanPipelineSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, lang, n_chars FROM documents),
       |topn AS (
       |  SELECT doc_id, max(n) AS top_n FROM (
       |    SELECT doc_id, t, count(*) AS n
       |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM d) u
       |    GROUP BY doc_id, t) c
       |  GROUP BY doc_id),
       |flags AS (
       |  SELECT d.doc_id, d.text,
       |    d.lang IN ('en', 'de', 'es', 'fr') AS ok_lang,
       |    d.n_chars BETWEEN 100 AND 500 AS ok_len,
       |    topn.top_n * 5 <= len(string_split(d.text, ' ')) AS ok_rep
       |  FROM d JOIN topn USING (doc_id)),
       |gated AS (
       |  SELECT doc_id, text,
       |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
       |  FROM flags WHERE ok_lang AND ok_len AND ok_rep),
       |exact_kept AS (SELECT doc_id, text FROM gated WHERE rn = 1),
       |sets AS (
       |  SELECT doc_id, list_distinct(
       |    [substr(text, i, 8) FOR i IN range(1, greatest(length(text) - 7, 1) + 1)]) AS shingles
       |  FROM exact_kept),
       |sh AS (SELECT doc_id, unnest(shingles) AS s FROM sets),
       |grp AS (
       |  SELECT s, count(*) AS df FROM sh GROUP BY s
       |  HAVING count(*) >= 2 AND count(*) <= ${Dedup.MaxShingleDf}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
       |  FROM sh a JOIN grp USING (s) JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id),
       |near AS (
       |  SELECT DISTINCT cand.j AS doc_id
       |  FROM cand
       |  JOIN sets si ON cand.i = si.doc_id
       |  JOIN sets sj ON cand.j = sj.doc_id
       |  WHERE CAST(len(list_intersect(si.shingles, sj.shingles)) AS DOUBLE)
       |      / CAST(len(si.shingles) + len(sj.shingles)
       |             - len(list_intersect(si.shingles, sj.shingles)) AS DOUBLE)
       |    >= ${Dedup.JaccardThreshold})
       |SELECT f.doc_id,
       |  CASE WHEN NOT ok_lang THEN 'lang'
       |       WHEN NOT ok_len THEN 'length'
       |       WHEN NOT ok_rep THEN 'repetition'
       |       WHEN g.rn > 1 THEN 'exact_dup'
       |       WHEN near.doc_id IS NOT NULL THEN 'near_dup'
       |       ELSE 'kept' END AS reason,
       |  (CASE WHEN NOT ok_lang THEN 'lang'
       |       WHEN NOT ok_len THEN 'length'
       |       WHEN NOT ok_rep THEN 'repetition'
       |       WHEN g.rn > 1 THEN 'exact_dup'
       |       WHEN near.doc_id IS NOT NULL THEN 'near_dup'
       |       ELSE 'kept' END) = 'kept' AS kept
       |FROM flags f
       |LEFT JOIN gated g ON f.doc_id = g.doc_id
       |LEFT JOIN near ON f.doc_id = near.doc_id
       |ORDER BY f.doc_id""".stripMargin
}
