package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X4 — overlapping document chunking: the context-window prep step of
  * RAG / training pipelines (split every document into fixed-width
  * character chunks at a fixed stride, keeping `ChunkWidth −
  * ChunkStride` chars of overlap so no span is cut without context).
  *
  * Shape: one `explode(sequence(...))` over chunk starts — a narrow
  * per-row fan-out (no shuffle at all until the output sort), each
  * chunk sliced with a codegen'd `substring`. At 100 TB this is the
  * ideal embarrassingly-parallel map stage: output partitioning
  * follows input partitioning, and downstream per-chunk embedding /
  * indexing starts from co-located chunks of the same document.
  *
  * Reference scope: the reference app has no chunker; this is part of
  * the §2c LLM-pipeline surface (SURVEY.md §2c, text analysis family).
  */
object Chunks {

  /** Chunk width in characters. */
  val ChunkWidth = 80
  /** Start-to-start stride; overlap = ChunkWidth − ChunkStride = 20. */
  val ChunkStride = 60

  def chunkDocs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .withColumn("start",
        explode(sequence(lit(1), greatest(length(col("text")), lit(1)), lit(ChunkStride))))
      .withColumn("chunk", expr(s"substring(text, start, $ChunkWidth)"))
      .select(col("doc_id"),
        expr(s"cast((start - 1) div $ChunkStride as bigint)").as("chunk_id"),
        col("start").cast("long").as("start"),
        col("chunk"),
        length(col("chunk")).cast("long").as("chunk_len"),
        size(split(col("chunk"), " ")).cast("long").as("n_words"))
      .orderBy(col("doc_id"), col("chunk_id"))

  val chunkDocsSql: String =
    s"""WITH starts AS (
       |  SELECT doc_id, text,
       |    unnest([CAST(i AS BIGINT) FOR i IN
       |      range(1, greatest(length(text), 1) + 1, $ChunkStride)]) AS start
       |  FROM documents)
       |SELECT doc_id,
       |  (start - 1) // $ChunkStride AS chunk_id,
       |  start,
       |  substr(text, CAST(start AS INTEGER), $ChunkWidth) AS chunk,
       |  CAST(length(substr(text, CAST(start AS INTEGER), $ChunkWidth)) AS BIGINT) AS chunk_len,
       |  CAST(len(string_split(substr(text, CAST(start AS INTEGER), $ChunkWidth), ' ')) AS BIGINT) AS n_words
       |FROM starts
       |ORDER BY doc_id, chunk_id""".stripMargin
}
