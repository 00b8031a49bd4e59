package graft.streaming

import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the incremental form of the
  * batch SimHash dedup ([[graft.ext.Dedup.simhashNearDup]]): documents
  * arrive as a stream, and each is checked against the recent corpus
  * without ever joining the stream with itself.
  *
  * Same algorithm, re-shaped for unbounded input:
  *  - per-document 60-bit SimHash, computed by [[simhash60]] — a typed
  *    function bit-identical to the batch pipeline (spec-pinned);
  *  - 4×15-bit pigeonhole banding: hamming ≤ 3 ⟹ the pair collides in
  *    at least one chunk, so state is keyed by (chunk, chunk-value)
  *    and a document only meets the members of its 4 buckets — the
  *    stream never meets the whole history;
  *  - `flatMapGroupsWithState` holds each bucket's recent
  *    (simhash, doc_id, event-time) members and prunes them against
  *    the watermark — state is bounded by the watermark window × bucket
  *    fan-in, the property that keeps this runnable forever.
  *
  * Emitted hits may repeat (a pair can collide in up to 4 chunks);
  * exact-once pair output would add one downstream
  * `dropDuplicatesWithinWatermark` on a carried event-time column.
  */
object DocStream {

  val SimHashBits = 60
  val SimHashChunks = 4
  val SimHashMaxHamming = 3

  case class DocRow(doc_id: Long, ts: Timestamp, text: String)
  // carries the WATERMARKED event-time column through to the stateful
  // operator — EventTimeTimeout requires it to survive the projections.
  // (Public: the encoder's generated deserializer constructs these.)
  case class BucketRow(chunk: Int, ck: Int, doc_id: Long,
      ts: Timestamp, simhash: Long) {
    def tsMicros: Long = ts.getTime * 1000L
  }
  case class DupHit(i: Long, j: Long, hamming: Int, chunk: Int)
  case class BucketState(members: List[(Long, Long, Long)]) // (simhash, doc_id, tsMicros)

  /** 60-bit SimHash of a text — typed mirror of the batch expression
    * pipeline (distinct char-8-grams → md5 hex prefix as 60-bit int →
    * per-bit majority). Kept bit-identical: same shingle starts
    * (1 ≤ i ≤ max(len−7, 1), tail shingles clipped like `substring`),
    * same first-15-hex-chars fold, same strict-majority bit rule.
    * Lengths and offsets are Unicode CODE POINTS — Spark's `length`/
    * `substring` count code points, so a UTF-16 walk (String.length)
    * would shift every shingle start after a non-BMP character (emoji,
    * rare CJK) and silently break the bit-identity this doc claims. */
  def simhash60(text: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val counts = new Array[Int](SimHashBits)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val cpLen = text.codePointCount(0, text.length)
    val nStarts = math.max(cpLen - 7, 1)
    var start = 0 // UTF-16 offset of the k-th code point
    var k = 0
    while (k < nStarts) {
      val end = text.offsetByCodePoints(start, math.min(k + 8, cpLen) - k)
      val s = text.substring(start, end)
      if (seen.add(s)) {
        val hex = md.digest(s.getBytes("UTF-8")).take(8)
          .map("%02x".format(_)).mkString.substring(0, 15)
        val h = java.lang.Long.parseLong(hex, 16)
        var b = 0
        while (b < SimHashBits) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      k += 1
      if (k < nStarts) start = text.offsetByCodePoints(start, 1)
    }
    (0 until SimHashBits).foldLeft(0L) { (acc, b) =>
      if (counts(b) > 0) acc | (1L << b) else acc
    }
  }

  /** docs: streaming frame with (doc_id, ts, text). Returns the
    * detected near-dup pair stream (append mode). */
  def nearDupStream(docs: DataFrame, watermarkDelay: String = "10 minutes"): Dataset[DupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = udf(simhash60 _)
    val buckets = docs
      .withWatermark("ts", watermarkDelay)
      .withColumn("simhash", sh(col("text")))
      .select(col("doc_id"), col("ts"), col("simhash"),
        explode(expr(s"transform(sequence(0, ${SimHashChunks - 1}), c -> named_struct(" +
          "'chunk', cast(c as int), 'ck', cast(shiftright(simhash, c * 15) & 32767 as int)))"))
          .as("c"))
      .select(col("c.chunk"), col("c.ck"), col("doc_id"), col("ts"), col("simhash"))
      .as[BucketRow]
    buckets
      .groupByKey(r => (r.chunk, r.ck))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        detectGroup(watermarkDelay))
  }

  /** Per-bucket detection: new members meet current state (and each
    * other, in (ts, doc_id) order for determinism); state is pruned to
    * the watermark and times out with it. `timeoutPad` is the stream's
    * configured watermark delay — the extra grace the bucket stays
    * alive past its newest member. */
  private[graft] def detectGroup(timeoutPad: String)(key: (Int, Int), rows: Iterator[BucketRow],
      state: GroupState[BucketState]): Iterator[DupHit] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val watermark = state.getCurrentWatermarkMs() * 1000L // micros
    var members = state.getOption.map(_.members).getOrElse(Nil)
      .filter(_._3 >= watermark)
    val hits = scala.collection.mutable.ListBuffer.empty[DupHit]
    rows.toSeq.sortBy(r => (r.tsMicros, r.doc_id)).foreach { r =>
      members.foreach { case (sh, id, _) =>
        if (id != r.doc_id) {
          val ham = java.lang.Long.bitCount(sh ^ r.simhash)
          if (ham <= SimHashMaxHamming)
            hits += DupHit(math.min(id, r.doc_id), math.max(id, r.doc_id), ham, key._1)
        }
      }
      members = (r.simhash, r.doc_id, r.tsMicros) :: members
    }
    state.update(BucketState(members))
    // keep state alive only while the watermark can still match it.
    // flatMapGroupsWithState does NOT drop late input rows, so a
    // bucket fed only by a row arriving > watermarkDelay+pad late
    // would compute newest+pad EARLIER than the current watermark —
    // and setTimeoutTimestamp throws on a timestamp ≤ watermark,
    // killing the whole query. Clamp the base to just past the
    // watermark so the state instead expires at the next trigger.
    val newest = members.map(_._3).foldLeft(Long.MinValue)(math.max)
    if (newest > Long.MinValue)
      state.setTimeoutTimestamp(
        math.max(newest / 1000L, state.getCurrentWatermarkMs() + 1), timeoutPad)
    hits.iterator
  }

  /** Registered query `x6_stream_dedup` (round 7) — the X1 exact-dedup
    * operator at the STREAM door, driver-oracled: documents arrive via
    * a file-source `readStream`, `dropDuplicates` on the content hash
    * keeps each key's first arrival (state is hash-partitioned by the
    * dedup key; the production unbounded form swaps in
    * `dropDuplicatesWithinWatermark`, spec-pinned in StreamingSpec),
    * survivors land through the replay-safe sink, and the read-back
    * joins batch-side copy counts. The oracle is the batch per-hash
    * aggregate — a lost key, a duplicate admitted, or a replay landing
    * twice all break the hash match. */
  def streamedDedup(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    // multi-batch: the dedup key state built by earlier micro-batches
    // suppresses re-arrivals in later ones — cross-batch state carry
    // under the driver gate (the output is order-insensitive, so any
    // arrival order yields the same survivor hash set)
    val src = StreamSource.chronological(spark, sfDir, "documents", "doc_id")
    val schema = spark.read.parquet(src).schema
    val base = StreamMemo.landed(spark, "stream-dedup", sfDir, src) { base =>
      val landDir = new java.io.File(base, "landed").getAbsolutePath
      val checkpoint = new java.io.File(base, "checkpoint").getAbsolutePath
      val survivors = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .select(md5(col("text")).as("text_md5"))
        .dropDuplicates("text_md5")
      val query = survivors.writeStream
        .foreachBatch(EventStream.landBatch(landDir) _)
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try query.awaitTermination()
      finally if (query.isActive) query.stop()
    }
    val landDir = new java.io.File(base, "landed").getAbsolutePath
    val copies = graft.Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(count(lit(1)).as("n_copies"))
    spark.read.parquet(landDir).drop("batch_id")
      .join(copies, Seq("text_md5"))
      .orderBy(col("text_md5"))
  }

  /** Registered query `x6_stream_hll` (round 8) — the MERGEABLE-SKETCH
    * property under the driver hash gate: per-source HyperLogLog
    * distinct-shingle estimates accumulate across the chronological
    * multi-batch document stream in UPDATE mode (the custom
    * [[graft.functions.HllAgg]] buffer rides the state store; each
    * micro-batch re-emits the sources whose registers changed), land
    * batch-stamped, and the read-back keeps each source's LAST update.
    * HLL merge is register-max — commutative and associative — so the
    * stream-merged estimate must equal the batch estimate BIT-FOR-BIT
    * (`x4_hll_distinct`'s oracle: same hash fold, same integer
    * harmonic sum). The exact count rides the relational tail (exact
    * streaming distinct is unsupported by design — unbounded state —
    * which is the reason the sketch exists). A register lost at a
    * batch boundary, a non-merged buffer, or double-counted state all
    * move the estimate and break the hash. */
  def streamedHll(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val src = StreamSource.chronological(spark, sfDir, "documents", "doc_id")
    val schema = spark.read.parquet(src).schema
    val base = StreamMemo.landed(spark, "stream-hll", sfDir, src) { base =>
      val landDir = new java.io.File(base, "landed").getAbsolutePath
      val checkpoint = new java.io.File(base, "checkpoint").getAbsolutePath
      val est = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .select(col("source"),
          graft.functions.Shingles.shingles(col("text"), 8).as("tk"))
        .withColumn("h", expr("cast(conv(substring(md5(tk), 1, 15), 16, 10) as bigint)"))
        .groupBy(col("source"))
        .agg(graft.functions.HllAgg.hll_estimate(col("h")).as("hll_est"))
      val query = est.writeStream
        .outputMode("update")
        .foreachBatch(EventStream.landBatch(landDir) _)
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try query.awaitTermination()
      finally if (query.isActive) query.stop()
    }
    val landDir = new java.io.File(base, "landed").getAbsolutePath
    // each source's newest update is its full-corpus estimate
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("batch_id").desc)
    val latest = spark.read.parquet(landDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("source"), col("hll_est"))
    val exact = graft.Tables.documents(spark, sfDir)
      .select(col("source"),
        graft.functions.Shingles.shingles(col("text"), 8).as("tk"))
      .groupBy(col("source"))
      .agg(countDistinct(col("tk")).as("n_exact"))
    exact.join(latest, Seq("source"))
      .withColumn("err_bp",
        expr("floor(abs(hll_est - cast(n_exact as double)) * 10000.0 / cast(n_exact as double))"))
      .select(col("source"), col("n_exact"), col("hll_est"), col("err_bp"))
      .orderBy(col("source"))
  }

  /** Mirror: the batch per-hash copy counts — the streamed survivor
    * set must be exactly the distinct hash set. */
  val streamedDedupSql: String =
    """SELECT md5(text) AS text_md5, count(*) AS n_copies
      |FROM documents
      |GROUP BY 1
      |ORDER BY text_md5""".stripMargin
}
