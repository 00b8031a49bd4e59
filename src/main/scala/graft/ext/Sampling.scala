package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sampling / split assignment — the dataset-mixing
  * primitive a training-data pipeline runs last: every document gets a
  * stable pseudo-random bucket in [0, 100) derived ONLY from its id,
  * so train/val/test membership is reproducible across runs, engines,
  * and cluster layouts (no `rand()`, no seed plumbing, no dependence
  * on partitioning).
  *
  * The bucket is an md5 hex-fold of the id (same integer-arithmetic
  * device as [[Dedup.simhashNearDup]]), identical in DuckDB — so the
  * split assignment itself is driver-hash-verified. A pure per-row
  * projection: at 100 TB this is a narrow scan with zero shuffle
  * (the final ORDER BY here is presentation for the oracle diff).
  *
  * The bucket/split expressions live HERE once, in both dialects —
  * [[deterministicSplit]] and [[splitMix]] (and their SQL mirrors)
  * share them, so a threshold or hash change cannot desynchronize the
  * assignment from the mix report or an engine from its oracle.
  */
object Sampling {

  val TrainPct = 80
  val ValPct = 10 // test = the remainder

  /** Stable [0,100) bucket from doc_id (engine side). */
  private def bucketCol: Column =
    expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)") % 100

  /** Bucket → split label (engine side). */
  private def splitCol: Column =
    when(col("bucket") < TrainPct, "train")
      .when(col("bucket") < TrainPct + ValPct, "val")
      .otherwise("test")

  /** Stable [0,100) bucket from doc_id (DuckDB side). */
  private val bucketSql: String =
    """list_reduce(
      |      [strpos('0123456789abcdef', x) - 1
      |       FOR x IN string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), '')],
      |      (a, b) -> a * 16 + b) % 100""".stripMargin

  /** Bucket → split label (DuckDB side). */
  private val splitSql: String =
    s"""CASE WHEN bucket < $TrainPct THEN 'train'
       |       WHEN bucket < ${TrainPct + ValPct} THEN 'val'
       |       ELSE 'test' END""".stripMargin

  /** Per-document split assignment over a 10% verification slice
    * (bucket < 10 keeps the oracled output row-bounded; membership for
    * every other bucket is the same expression). */
  def deterministicSplit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), bucketCol.as("bucket"))
      .withColumn("split", splitCol)
      .filter(col("bucket") < 10)
      .orderBy(col("doc_id"))

  /** Mirror: same md5 fold (list_reduce over hex digits), same split
    * thresholds. */
  val deterministicSplitSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, lang,
       |    $bucketSql AS bucket
       |  FROM documents)
       |SELECT doc_id, lang, bucket,
       |  $splitSql AS split
       |FROM b
       |WHERE bucket < 10
       |ORDER BY doc_id""".stripMargin

  /** Stratified mix report: documents per (lang, split) with the
    * within-language fraction — what a data-mixing job checks before
    * shipping a training set (split skew per stratum). One aggregate
    * over the full corpus, decimal-exact fraction. */
  def splitMix(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("lang"), bucketCol.as("bucket"))
      .withColumn("split", splitCol)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lang_total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
      .select(col("lang"), col("split"), col("n"),
        (col("n") * 10000L / col("lang_total")).as("frac_bp"))
      .orderBy(col("lang"), col("split"))

  /** Exact per-stratum quota sampling: the k lowest-hash documents of
    * every source — "give me exactly 10 docs per domain, reproducibly".
    * Hash order (not doc order) makes the quota a uniform sample that
    * is stable across runs and engines; ties cannot occur because the
    * tiebreak key is the unique doc_id. One window shuffle keyed on the
    * stratum — the same shape as any top-k-per-key at 100 TB (and
    * swappable for [[graft.plans.TopKPerKey]] when k is small). */
  def quotaSample(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 10
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        (expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)") % 1000000L).as("h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("source"), col("h"), col("rk").cast("long").as("rk"))
      .orderBy(col("source"), col("rk"))
  }

  val quotaSampleSql: String =
    """WITH h AS (
      |  SELECT doc_id, source,
      |    list_reduce(
      |      [strpos('0123456789abcdef', x) - 1
      |       FOR x IN string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), '')],
      |      (a, b) -> a * 16 + b) % 1000000 AS h
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, source, h,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS rk
      |  FROM h)
      |SELECT doc_id, source, h, rk
      |FROM r WHERE rk <= 10
      |ORDER BY source, rk""".stripMargin

  /** Temperature-scaled mixing weights: the sampling allocation that
    * upweights small sources (alpha = 0.5, i.e. weight ∝ √n — the
    * multilingual-training rebalancing rule). All arithmetic is
    * integer: isqrt via floor(sqrt(double)) (IEEE sqrt is correctly
    * rounded, so floor of it is engine-identical on exact long inputs),
    * allocations by integer floor division against the weight total.
    * One tiny aggregate (n_sources rows) after a per-source count —
    * corpus-scale cost is the count scan. */
  def mixWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val budget = 100000L
    val counts = Tables.documents(spark, sfDir)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .withColumn("w", expr("cast(floor(sqrt(cast(n as double))) as bigint)"))
    val tot = counts.agg(sum(col("w")).as("w_total"))
    counts.crossJoin(broadcast(tot))
      .select(col("source"), col("n"), col("w"),
        expr(s"($budget * w) div w_total").as("alloc"),
        (col("w") * 10000L / col("w_total")).as("share_bp"))
      .orderBy(col("source"))
  }

  val mixWeightsSql: String =
    """WITH c AS (
      |  SELECT source, count(*) AS n,
      |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(w) AS BIGINT) AS w_total FROM c)
      |SELECT source, n, w,
      |  (100000 * w) // w_total AS alloc,
      |  w * 10000 / w_total AS share_bp
      |FROM c, t
      |ORDER BY source""".stripMargin

  val splitMixSql: String =
    s"""WITH b AS (
       |  SELECT lang,
       |    $bucketSql AS bucket
       |  FROM documents),
       |s AS (
       |  SELECT lang,
       |    $splitSql AS split
       |  FROM b),
       |c AS (SELECT lang, split, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1, 2)
       |SELECT lang, split, n,
       |  n * 10000 / CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS frac_bp
       |FROM c
       |ORDER BY lang, split""".stripMargin

  /** Registered query `x9_curriculum`: source-interleaved curriculum
    * order for training — rank docs within each source (quality proxy:
    * longest first, doc_id tiebreak), then emit round-robin across
    * sources (all rank-1 docs, then all rank-2, …). No source can
    * dominate any prefix of the stream — the property curriculum /
    * data-mixing schedules care about — and the order is fully
    * deterministic. Two window passes over one shuffle each; the
    * 100 TB form writes `pos` as the sort key of a
    * [[graft.sink.Sinks.compact]] layout rather than sorting the
    * output. First 100 positions shown. */
  def curriculum(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byQuality = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val pruned = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rn", row_number().over(byQuality).cast("long"))
      // pos >= rn always (a doc's own source chain precedes it in the
      // interleave order), so pos <= 100 implies rn <= 100: prune with
      // the partitioned window FIRST and the interleave rank only ever
      // sees <= 100 × n_sources rows — constant-sized, not corpus-sized,
      // hence the bounded-frame rank device
      .filter(col("rn") <= 100)
    graft.Ranks.withBoundedRank(pruned, "pos",
        col("rn"), col("source"), col("doc_id"))
      .filter(col("pos") <= 100)
      .select(col("pos"), col("doc_id"), col("source"), col("rn"), col("n_chars"))
      .orderBy(col("pos"))
  }

  /** Registered query `x9_pack_shards`: token-budget shard packing —
    * the step that turns a cleaned corpus into fixed-size training
    * shards. Token count is the standard chars/4 proxy (integer,
    * deterministic); docs pack in doc_id order within each source and
    * a doc starts a new shard when its START offset crosses the
    * budget (start-offset rule: every shard except the last holds at
    * least `budget` cumulative tokens' worth of starts — simple,
    * deterministic, one window pass). Packing is inherently
    * sequential, so the window partitions by source — shards never
    * span sources (what a real mixing pipeline wants anyway) and the
    * cumsum distributes. */
  def packShards(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 4000L
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        // `div`, not `/`: Column./ on longs is DOUBLE division
        expr("n_chars div 4 + 1").as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("shard", expr(s"(cum - toks) div $budget"))
      .groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("sum_toks"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("shard"))
  }

  /** Registered query `x9_shard_export` — [[packShards]] taken from
    * plan to ARTIFACT: the shard assignment is materialized as an
    * actual partitioned layout (`.../source=S/shard=N/` — the
    * WebDataset-style training handoff directory), read BACK off the
    * landed files, and re-aggregated; the query shares [[packShards]]'
    * oracle, so a row lost, duplicated, or mis-partitioned by the
    * writer breaks the driver hash. Scale shape: the write is one
    * shuffle on (source, shard) via `partitionBy` (dynamic overwrite,
    * same sink contract as the streaming landing); the read-back scan
    * recovers partition columns from the directory layout — which is
    * the point: the artifact itself carries the assignment. */
  def shardExport(spark: SparkSession, sfDir: String): DataFrame = {
    val budget = 4000L
    val dir = graft.Scratch.dir(spark, "shards", sfDir).getAbsolutePath
    graft.Scratch.rm(new java.io.File(dir))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), expr("n_chars div 4 + 1").as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("shard", expr(s"(cum - toks) div $budget"))
      .select(col("doc_id"), col("source"), col("shard"), col("toks"))
      // NOTE (round-14 audit): a repartition(source, shard) before this
      // write was tried and reverted — the window above already
      // clusters each source into one task, so every (source, shard)
      // directory gets exactly one file either way (measured: 100 files
      // at sf0.1 both ways); the extra exchange bought nothing.
      .write.partitionBy("source", "shard").mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
      .groupBy(col("source"), col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("sum_toks"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("shard"))
  }

  val packShardsSql: String =
    """WITH t AS (
      |  SELECT doc_id, source, n_chars // 4 + 1 AS toks FROM documents),
      |c AS (
      |  SELECT doc_id, source, toks,
      |    sum(toks) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM t)
      |SELECT source, CAST((cum - toks) // 4000 AS BIGINT) AS shard,
      |  count(*) AS n_docs,
      |  CAST(sum(toks) AS BIGINT) AS sum_toks,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c
      |GROUP BY 1, 2
      |ORDER BY source, shard""".stripMargin

  val curriculumSql: String =
    """WITH r AS (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY n_chars DESC, doc_id) AS rn
      |  FROM documents),
      |p AS (
      |  SELECT *, row_number() OVER (ORDER BY rn, source, doc_id) AS pos
      |  FROM r)
      |SELECT pos, doc_id, source, rn, n_chars
      |FROM p
      |WHERE pos <= 100
      |ORDER BY pos""".stripMargin

  /** Epochs materialized by the oracled epoch-order query. */
  val Epochs = 2

  /** Deterministic per-epoch training order: every epoch sees every
    * document exactly once, in a pseudo-random order that is a pure
    * function of (epoch, doc_id) — reproducible across runs, machines,
    * and restarts, and each epoch's permutation is independent. This
    * is the "shuffle each epoch" step of a training data loader, made
    * a query: position = rank of md5(epoch:doc_id).
    *
    * Scale note: a global order per epoch is inherently a total sort —
    * exactly what materializing an epoch shuffle costs anywhere. Spark
    * plans it as repartitionByRange + in-partition sort on the hash;
    * the window's tie-break (hash, doc_id) makes it total. */
  def epochOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("epoch")).orderBy(col("ord_hash"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(expr(s"sequence(0, ${Epochs - 1})")).as("epoch"))
      .withColumn("ord_hash", md5(concat(col("epoch"), lit(":"), col("doc_id"))))
      .withColumn("position", row_number().over(w).cast("long"))
      .select(col("epoch").cast("long").as("epoch"), col("position"),
        col("doc_id"), col("ord_hash"))
      .orderBy(col("epoch"), col("position"))
  }

  val epochOrderSql: String =
    s"""WITH e AS (
       |  SELECT doc_id, unnest(range(0, $Epochs)) AS epoch FROM documents),
       |h AS (
       |  SELECT epoch, doc_id,
       |    md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS ord_hash
       |  FROM e)
       |SELECT CAST(epoch AS BIGINT) AS epoch,
       |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY ord_hash, doc_id) AS BIGINT)
       |    AS position,
       |  doc_id, ord_hash
       |FROM h
       |ORDER BY epoch, position""".stripMargin

  // ---- sequence-packing waste planner (round 5) -------------------------

  /** Padding-waste report per (source, target sequence length) — the
    * planning pass run before choosing a training sequence length:
    * for each candidate L, how many pad slots does one-doc-per-
    * sequence batching burn (`unpacked_slots − tokens`), and how many
    * sequences would dense packing need at minimum (`ceil(Σtokens/L)`,
    * the bin-packing lower bound)? The gap between `n_docs·⌈t/L⌉` and
    * that bound is the headroom that justifies running the
    * [[packShards]] packer at all. Whitespace token counts (exact,
    * not the chars/4 proxy — the planner wants real lengths), every
    * measure an integer; one explode (3 candidate lengths) and one
    * (source, L)-keyed map-side-combinable aggregation. */
  def paddingWaste(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        explode(expr("array(32L, 64L, 128L)")).as("seq_len"))
      .groupBy(col("source"), col("seq_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        sum(expr("ceil(toks / seq_len)") * col("seq_len")).cast("long").as("unpacked_slots"),
        sum((col("toks") > col("seq_len")).cast("long")).as("n_truncated"))
      .select(col("source"), col("seq_len"), col("n_docs"), col("total_tokens"),
        col("unpacked_slots"),
        ((col("unpacked_slots") - col("total_tokens")).cast("double") /
          col("unpacked_slots").cast("double")).as("waste_frac"),
        expr("cast(ceil(total_tokens / seq_len) as bigint)").as("packed_seqs_lb"),
        col("n_truncated"))
      .orderBy(col("source"), col("seq_len"))

  val paddingWasteSql: String =
    """WITH t AS (
      |  SELECT source, len(string_split(text, ' ')) AS toks,
      |    unnest([32, 64, 128]) AS seq_len
      |  FROM documents)
      |SELECT source, CAST(seq_len AS BIGINT) AS seq_len, count(*) AS n_docs,
      |  CAST(sum(toks) AS BIGINT) AS total_tokens,
      |  CAST(sum(CAST(ceil(CAST(toks AS DOUBLE) / seq_len) AS BIGINT) * seq_len) AS BIGINT)
      |    AS unpacked_slots,
      |  CAST(sum(CAST(ceil(CAST(toks AS DOUBLE) / seq_len) AS BIGINT) * seq_len) - sum(toks) AS DOUBLE)
      |    / CAST(sum(CAST(ceil(CAST(toks AS DOUBLE) / seq_len) AS BIGINT) * seq_len) AS DOUBLE)
      |    AS waste_frac,
      |  CAST(ceil(CAST(sum(toks) AS DOUBLE) / seq_len) AS BIGINT) AS packed_seqs_lb,
      |  CAST(sum(CASE WHEN toks > seq_len THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated
      |FROM t
      |GROUP BY source, seq_len
      |ORDER BY source, seq_len""".stripMargin

  // ---- decontaminated split manifest ------------------------------------

  val LeakThresholdBp = 8000L

  /** Decontaminated split manifest — the composition a real training
    * run needs before anything ships: assign every document its
    * deterministic hash split, then measure each HELD-OUT (val/test)
    * document's char-8-gram containment against the TRAIN split's
    * shingle set and quarantine documents at ≥ 80 % containment
    * (train leakage makes the held-out metric a lie — GPT-3 appendix C
    * / Gopher's decontamination step, here as one query over the real
    * split rather than a parity-based stand-in). Output: one row per
    * held-out doc with its split, shingle counts, integer containment
    * basis points, and the quarantine verdict.
    *
    * Scale: train shingles reduce to a DISTINCT set (one shuffle);
    * the held-out side left-joins it on the shingle — at corpus scale
    * the distinct set swaps for a bloom filter (exactness traded for
    * one broadcast, as [[graft.ext.TextStats.contamination]]'s
    * scaladoc details). */
  def decontaminatedSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .withColumn("bucket", bucketCol)
      .withColumn("split", splitCol)
    val sh = d.select(col("doc_id"), col("split"),
      graft.functions.Shingles.shingles(col("text"), 8).as("s"))
    val train = sh.filter(col("split") === "train")
      .select(col("s")).distinct().withColumn("hit", lit(1L))
    sh.filter(col("split") =!= "train")
      .join(train, Seq("s"), "left")
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("containment_bp", expr("n_hits * 10000 div n_shingles"))
      .withColumn("quarantined", col("containment_bp") >= LeakThresholdBp)
      .orderBy(col("doc_id"))
  }

  /** Mirror of [[decontaminatedSplit]]: same md5-fold buckets and
    * thresholds, same distinct-train shingle join, same integer
    * containment. */
  val decontaminatedSplitSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, text,
       |    $bucketSql AS bucket
       |  FROM documents),
       |sp AS (
       |  SELECT doc_id, text,
       |    $splitSql AS split
       |  FROM b),
       |sh AS (
       |  SELECT doc_id, split, unnest(list_distinct(
       |    [substr(text, i, 8) FOR i IN range(1, greatest(length(text) - 7, 1) + 1)])) AS s
       |  FROM sp),
       |train AS (SELECT DISTINCT s FROM sh WHERE split = 'train'),
       |scored AS (
       |  SELECT sh.doc_id, sh.split,
       |    CAST(count(*) AS BIGINT) AS n_shingles,
       |    CAST(SUM(CASE WHEN train.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
       |  FROM sh LEFT JOIN train ON sh.s = train.s
       |  WHERE sh.split <> 'train'
       |  GROUP BY 1, 2)
       |SELECT doc_id, split, n_shingles, n_hits,
       |  n_hits * 10000 // n_shingles AS containment_bp,
       |  n_hits * 10000 // n_shingles >= $LeakThresholdBp AS quarantined
       |FROM scored
       |ORDER BY doc_id""".stripMargin

  // ---- DSIR-style importance selection ----------------------------------

  val DsirTarget = "src0"
  val DsirBuckets = 4096
  val DsirScale = 1000000L
  val DsirTopN = 50

  /** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    * rank candidate documents by how much their hashed-token profile
    * resembles a TARGET domain — the published recipe for picking
    * pretraining data that matches a downstream distribution. Per
    * hashed token bucket h (md5-fold mod [[DsirBuckets]] — feature
    * hashing, collisions intended), the importance weight is the
    * integer ratio `target_count(h)·10⁶ div corpus_count(h)`; a doc's
    * score is its per-token mean weight (integer div again). Published
    * DSIR uses log-ratios of smoothed n-gram LMs and stochastic
    * gumbel resampling; the rational ratio + deterministic top-N keep
    * the same "looks like the target" ordering while staying
    * hash-verifiable in the oracle (no floats anywhere).
    *
    * Scale shape: the bucket-count table is bounded by
    * [[DsirBuckets]] rows regardless of corpus size (map-side partial
    * aggregation collapses each partition to ≤4096 rows before the
    * one tiny shuffle), so it BROADCASTS — the corpus-sized token
    * stream joins it with no shuffle and aggregates per doc (second
    * shuffle, on doc_id). Top-N is `orderBy().limit(n)` =
    * TakeOrderedAndProject, the distributed partial-top-N — NOT a
    * global window sort. The token scan runs twice (counts pass +
    * scoring pass); both are stateless projected scans, the standard
    * trade against caching a corpus-sized frame. */
  def dsirSelect(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("tk"))
      .filter(length(col("tk")) > 0)
      .withColumn("h",
        expr(s"cast(conv(substring(md5(tk), 1, 15), 16, 10) as bigint) % $DsirBuckets"))
    val weights = tok.groupBy(col("h")).agg(
        count(lit(1)).as("total_cnt"),
        count(when(col("source") === DsirTarget, 1)).as("target_cnt"))
      .select(col("h"), expr(s"target_cnt * $DsirScale div total_cnt").as("w"))
    val selected = tok.filter(col("source") =!= DsirTarget)
      .join(broadcast(weights), "h")
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("w")).as("raw_score"), count(lit(1)).as("n_tokens"))
      .withColumn("score", expr("raw_score div n_tokens"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(DsirTopN)
    // `selected` is the post-limit DsirTopN-row frame — rank via the
    // bounded-frame device, not a partition-less window
    graft.Ranks.withBoundedRank(selected, "rk", -col("score"), col("doc_id"))
      .select(col("rk"), col("doc_id"), col("source"), col("score"), col("n_tokens"))
      .orderBy(col("rk"))
  }

  /** Mirror of [[dsirSelect]]: same md5-fold feature hashing, same
    * integer ratio weights, same per-token-mean score and top-N. */
  val dsirSelectSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, source, tk,
       |    list_reduce(
       |      [strpos('0123456789abcdef', x) - 1
       |       FOR x IN string_split(substr(md5(tk), 1, 15), '')],
       |      (a, b) -> a * 16 + b) % $DsirBuckets AS h
       |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tk
       |        FROM documents)
       |  WHERE len(tk) > 0),
       |wt AS (
       |  SELECT h,
       |    (count(CASE WHEN source = '$DsirTarget' THEN 1 END) * $DsirScale)
       |      // count(*) AS w
       |  FROM tok GROUP BY h),
       |scored AS (
       |  SELECT doc_id, source,
       |    CAST(sum(w) AS BIGINT) AS raw_score,
       |    CAST(count(*) AS BIGINT) AS n_tokens
       |  FROM tok JOIN wt USING (h)
       |  WHERE source <> '$DsirTarget'
       |  GROUP BY 1, 2),
       |sel AS (
       |  SELECT doc_id, source, raw_score // n_tokens AS score, n_tokens
       |  FROM scored
       |  ORDER BY score DESC, doc_id
       |  LIMIT $DsirTopN)
       |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk,
       |  doc_id, source, CAST(score AS BIGINT) AS score, n_tokens
       |FROM sel
       |ORDER BY rk""".stripMargin

  // ---- X9: cluster-balanced coreset selection ---------------------------

  /** Coreset size per quantizer cell. */
  val CoresetPerCell = 8

  /** Cluster-balanced prototype selection (the data-pruning shape of
    * Sorscher et al., "Beyond neural scaling laws", arXiv:2206.14486):
    * partition the embedding space into cells, score every vector by
    * cosine against its CELL CENTROID (prototypicality), and keep the
    * [[CoresetPerCell]] most prototypical per cell — a diversity-
    * preserving subset whose size scales with cell count, not corpus
    * size. Reuses [[Dedup.semanticCells]]'s corpus-scaled sign-bit
    * quantizer (cell count grows with N, so per-cell work is bounded)
    * and stays integer-exact end to end: centroids are per-dim
    * floor(mean) in ×1e7-quantized space (the double division of two
    * BIGINTs + floor is bit-identical across engines), dot products
    * are 64-term integer sums (|term| ≤ 1e7·1e7 → the 64-dim sum is
    * < 2⁵³, exact), and the only IEEE arithmetic is the final
    * cosine division, computed from identical integers on both sides.
    *
    * Plan shape at 100 TB: one posexplode → (cell, dim)-keyed
    * map-side-combinable aggregate reduces the corpus to ≤ cells×64
    * centroid rows; the centroid frame re-assembles per cell (tiny)
    * and BROADCASTS back to the single corpus scan; the final
    * `row_number` window is CELL-partitioned — no global sort, no
    * driver state, two corpus-touching exchanges total. */
  def coresetSample(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Dedup.semanticCells(Tables.embeddings(spark, sfDir))
      .withColumn("iv",
        expr("transform(embedding, x -> cast(round(cast(x as double) * 10000000) as bigint))"))
      .withColumn("n2", graft.functions.VectorFunctions.vec_qdot(col("embedding"), col("embedding")))
      .select(col("vec_id"), col("iv"), col("n2"), col("cell"))
    val cent = e
      .select(col("cell"), posexplode(col("iv")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(col("col")).as("sum_q"), count(lit(1)).as("n"))
      .withColumn("cq", floor(col("sum_q").cast("double") / col("n")))
      .groupBy(col("cell"))
      .agg(max(col("n")).as("cell_size"),
        expr("transform(array_sort(collect_list(struct(pos, cq))), s -> s.cq)").as("cv"))
      .withColumn("n2c", expr("aggregate(cv, cast(0 as bigint), (acc, x) -> acc + x * x)"))
    val scored = e.join(broadcast(cent), "cell")
      .withColumn("dot",
        graft.functions.VectorFunctions.vec_ldot(col("iv"), col("cv"))) // codegen dot (round 14)
      .withColumn("proto_sim", col("dot").cast("double") /
        (sqrt(col("n2").cast("double")) * sqrt(col("n2c").cast("double"))))
    val w = Window.partitionBy(col("cell")).orderBy(col("proto_sim").desc, col("vec_id"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= CoresetPerCell)
      .select(col("cell"), col("rk"), col("vec_id"), col("cell_size"), col("proto_sim"))
      .orderBy(col("cell"), col("rk"))
  }

  /** Mirror of [[coresetSample]]: same corpus-scaled cells
    * ([[Dedup.semanticCellsSqlParams]]), same floor-mean centroids,
    * same integer dots, same cell-partitioned rank. */
  val coresetSampleSql: String =
    s"""WITH q0 AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS iv
       |  FROM embeddings),
       |${Dedup.semanticCellsSqlParams},
       |cells AS (
       |  SELECT vec_id, iv,
       |    list_sum(list_transform(iv, x -> x * x)) AS n2,
       |    ${Dedup.semanticCellSqlExpr("iv")} AS cell
       |  FROM q0, params),
       |cd AS (
       |  SELECT cell, unnest([{'dim': CAST(i - 1 AS BIGINT), 'q': iv[i]}
       |    FOR i IN range(1, len(iv) + 1)], recursive := true)
       |  FROM cells),
       |cent0 AS (
       |  SELECT cell, dim,
       |    CAST(floor(CAST(sum(q) AS DOUBLE) / count(*)) AS BIGINT) AS cq,
       |    count(*) AS n
       |  FROM cd GROUP BY cell, dim),
       |cent AS (
       |  SELECT cell, CAST(max(n) AS BIGINT) AS cell_size,
       |    list(cq ORDER BY dim) AS cv
       |  FROM cent0 GROUP BY cell),
       |scored AS (
       |  SELECT c.vec_id, c.cell, ct.cell_size,
       |    CAST(list_sum(list_transform(list_zip(c.iv, ct.cv), p -> p[1] * p[2])) AS DOUBLE) /
       |      (sqrt(CAST(c.n2 AS DOUBLE)) *
       |       sqrt(CAST(list_sum(list_transform(ct.cv, x -> x * x)) AS DOUBLE))) AS proto_sim
       |  FROM cells c JOIN cent ct USING (cell)),
       |ranked AS (
       |  SELECT cell, vec_id, cell_size, proto_sim,
       |    row_number() OVER (PARTITION BY cell ORDER BY proto_sim DESC, vec_id) AS rk
       |  FROM scored)
       |SELECT cell, CAST(rk AS BIGINT) AS rk, vec_id, cell_size, proto_sim
       |FROM ranked WHERE rk <= $CoresetPerCell
       |ORDER BY cell, rk""".stripMargin

  /** Registered query `x9_dedup_mix`: temperature-scaled mixing weights
    * computed over POST-DEDUP per-source counts — the composition a
    * production pipeline actually runs: [[graft.ext.Dedup.dedupRetention]]
    * says what survives near-dup removal per source, and THOSE counts
    * (not the raw ones, which overweight the most-duplicated crawls)
    * feed the √n allocation rule of [[mixWeights]]. The retention frame
    * is a per-source handful of rows but its lineage is the whole LSH
    * pair pipeline, and both the weight projection and the 1-row total
    * consume it — a LAZY `localCheckpoint` (the PageRank device)
    * materializes that pipeline once instead of twice. Downstream is a
    * source-cardinality crossJoin against the broadcast 1-row total:
    * constant-size work at any corpus scale. */
  def dedupAdjustedMix(spark: SparkSession, sfDir: String): DataFrame = {
    val budget = 100000L
    val kept = Dedup.dedupRetention(spark, sfDir)
      .select(col("source"), col("n_docs"), col("n_kept"))
      .localCheckpoint(false)
    val w = kept.withColumn("w",
      expr("cast(floor(sqrt(cast(n_kept as double))) as bigint)"))
    val tot = w.agg(sum(col("w")).as("w_total"))
    w.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_kept"), col("w"),
        expr(s"($budget * w) div w_total").as("alloc"),
        (col("w") * 10000L / col("w_total")).as("share_bp"))
      .orderBy(col("source"))
  }

  /** Oracle: [[graft.ext.Dedup.dedupRetentionSql]] verbatim as a nested
    * CTE (DuckDB allows WITH inside a CTE body), re-tailed with the
    * same integer √-weight allocation as [[mixWeightsSql]]. */
  val dedupAdjustedMixSql: String =
    s"""WITH r AS (
       |${Dedup.dedupRetentionSql}
       |),
       |w AS (SELECT source, n_docs, n_kept,
       |        CAST(floor(sqrt(CAST(n_kept AS DOUBLE))) AS BIGINT) AS w
       |      FROM r),
       |t AS (SELECT CAST(sum(w) AS BIGINT) AS w_total FROM w)
       |SELECT source, n_docs, n_kept, w,
       |  (100000 * w) // w_total AS alloc,
       |  w * 10000 / w_total AS share_bp
       |FROM w, t
       |ORDER BY source""".stripMargin

  /** Sample size for [[weightedSample]]. */
  val WeightedSampleK = 50

  /** Registered query `x9_weighted_sample`: deterministic
    * size-weighted selection — the Efraimidis–Spirtas priority-sampling
    * shape (every item gets key = u^(1/w); the k best keys win) with
    * the random u replaced by the corpus' stable md5 hex-fold and the
    * floating-point key replaced by the INTEGER priority h div n_chars,
    * so longer documents systematically win more slots and the whole
    * selection is reproducible across runs, engines, and partition
    * layouts (same device as [[bucket]]; no rand(), no seed plumbing).
    * Used when a mix plan says "take k docs from this source, biased
    * by length" and the take must be auditable. Physically a narrow
    * projection + distributed top-k (TakeOrderedAndProject): per
    * partition keep k, merge k·P rows on one reducer — no global sort,
    * no full shuffle, the same plan at any corpus size. */
  def weightedSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)")
          .as("h"))
      // greatest(n_chars, 1): a zero-length doc would make the priority
      // NULL in Spark (div by 0) but an ERROR in DuckDB's `//` — and
      // Spark's nulls-first ascending sort would hand such rows
      // permanent sample slots. Clamping keeps both engines total,
      // identical, and deterministic on degenerate rows.
      .withColumn("priority", expr("h div greatest(n_chars, 1L)"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(WeightedSampleK)

  /** Registered query `x9_mixture` — the DATA-MIXING schedule every
    * multi-source training run starts from: per-source sampling
    * weights temperature-smoothed at α = 1/2 (the multilingual-
    * sampling convention — UNDER-sample the head, OVER-sample the
    * tail, here via integer sqrt so both engines derive identical
    * weights: IEEE sqrt is correctly rounded and our counts are far
    * below the 2^52 exactness bound, so floor(sqrt(n)) is
    * deterministic). Output per source: corpus share and smoothed
    * sampling share in integer basis points, the per-10k-documents
    * epoch quota, and the boost factor the smoothing applies to the
    * source (boost_bp > 10000 ⟺ tail source oversampled). One scan,
    * one aggregate, one broadcast of the 1-row totals — scan-bound at
    * any corpus size, like every mixture-planning query. */
  def mixtureWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("w", expr("cast(floor(sqrt(cast(n_docs as double))) as bigint)"))
    val tot = counts.agg(sum(col("n_docs")).as("tot_docs"), sum(col("w")).as("tot_w"))
    counts.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        expr("n_docs * 10000L div tot_docs").as("natural_bp"),
        expr("w * 10000L div tot_w").as("weight_bp"),
        expr("w * 10000L div tot_w").as("quota_per_10k"),
        expr("(w * 10000L div tot_w) * 10000L div greatest(n_docs * 10000L div tot_docs, 1L)")
          .as("boost_bp"))
      .orderBy(col("source"))
  }

  val mixtureWeightsSql: String =
    """WITH c AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot_docs,
      |             CAST(sum(w) AS BIGINT) AS tot_w FROM c)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  n_docs * 10000 // tot_docs AS natural_bp,
      |  w * 10000 // tot_w AS weight_bp,
      |  w * 10000 // tot_w AS quota_per_10k,
      |  (w * 10000 // tot_w) * 10000
      |    // greatest(n_docs * 10000 // tot_docs, 1) AS boost_bp
      |FROM c, t
      |ORDER BY source""".stripMargin

  val weightedSampleSql: String =
    s"""WITH keyed AS (
       |  SELECT doc_id, source, n_chars,
       |    CAST(list_reduce(
       |      [strpos('0123456789abcdef', x) - 1
       |       FOR x IN string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), '')],
       |      (a, b) -> a * 16 + b) AS BIGINT) AS h
       |  FROM documents)
       |SELECT doc_id, source, n_chars,
       |  CAST(h // greatest(n_chars, 1) AS BIGINT) AS priority
       |FROM keyed
       |ORDER BY priority, doc_id
       |LIMIT $WeightedSampleK""".stripMargin
}
