package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions.vec_qdot

/** X3 — vector similarity search over `embeddings.embedding`
  * (array<float>, dim 64).
  *
  * Exactness trick for the oracle: embeddings are quantized to
  * integers (`round(x * 1e7)` — float→double is exact, the product and
  * round are IEEE-deterministic), so dot products and squared norms
  * are INTEGER arithmetic — order-independent and bit-identical across
  * engines. The final `sim = dot / (sqrt(na²)·sqrt(nb²))` is one
  * division and two sqrts on identical doubles ⇒ identical doubles.
  *
  * Scale design:
  *  - query side is tiny → `broadcast` cross join; corpus side never
  *    shuffles for the brute-force scan;
  *  - top-k per query via window `row_number` (shuffle on query id,
  *    k·Q rows out);
  *  - [[annCosineTopK]] is the 100 TB path: sign-random-projection LSH
  *    buckets (8 deterministic hyperplanes from xxhash64 ±1 weights)
  *    prune the corpus to same-bucket candidates before exact
  *    re-ranking — the classic IVF/LSH recall-for-throughput trade.
  */
object Similarity {

  /** Quantized integer embedding + squared norm columns. The norm uses
    * [[graft.functions.QuantizedDot]] — one codegen'd loop; `iv` is
    * kept only where downstream HOFs (LSH planes) need the integer
    * array. */
  private def quantized(df: DataFrame): DataFrame =
    df.withColumn("iv",
        expr("transform(embedding, x -> cast(round(cast(x as double) * 10000000) as bigint))"))
      .withColumn("n2", vec_qdot(col("embedding"), col("embedding")))

  val NumQueries = 8
  val TopK = 5

  /** Brute-force exact cosine top-k: first 8 vectors as queries vs the
    * full corpus. */
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("n2", vec_qdot(col("embedding"), col("embedding")))
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"), col("n2").as("q_n2"))
    val pairs = e.select(col("vec_id"), col("embedding"), col("n2"))
      .crossJoin(broadcast(queries))
      .withColumn("dot", vec_qdot(col("q_embedding"), col("embedding")))
      .withColumn("sim", col("dot").cast("double") /
        (sqrt(col("q_n2").cast("double")) * sqrt(col("n2").cast("double"))))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    pairs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("vec_id"), col("sim"))
      .orderBy(col("q_id"), col("rk"))
  }

  val cosineTopKSql: String =
    s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS iv
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, iv,
       |    list_sum(list_transform(iv, x -> x * x)) AS n2
       |  FROM q),
       |pairs AS (
       |  SELECT qs.vec_id AS q_id, c.vec_id,
       |    CAST(list_sum(list_transform(list_zip(qs.iv, c.iv), p -> p[1] * p[2])) AS DOUBLE) /
       |      (sqrt(CAST(qs.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS sim
       |  FROM n qs, n c
       |  WHERE qs.vec_id < $NumQueries),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rk
       |  FROM pairs)
       |SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id, sim
       |FROM ranked WHERE rk <= $TopK
       |ORDER BY q_id, rk""".stripMargin

  val IvfCells = 16
  val IvfProbes = 4

  /** IVF (inverted-file) ANN: k-means centroids partition the corpus
    * into cells; each query probes its `IvfProbes` nearest cells and
    * exact-re-ranks only those members — the quantizer-based
    * alternative to hash-based LSH (the other variant the brief asks
    * for). Centroids come from spark.ml KMeans with a fixed seed;
    * assignment + probing are pure DataFrame ops (the model's
    * centroids are collected — centroid count is a constant, not
    * data-sized). Rows-only (clustering is engine-specific); recall
    * vs [[cosineTopK]] is unit-tested. */
  def ivfCosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("n2", vec_qdot(col("embedding"), col("embedding")))
      .withColumn("fv", array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(IvfCells).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("fv").fit(e.select(col("fv")))
    // corpus assignment via the model's own quantizer (native, fast)
    val assigned = model.setPredictionCol("cell").transform(e)
      .select(col("vec_id"), col("embedding"), col("n2"), col("cell"))
    // query probing is driver-side: NumQueries rows × IvfCells centroid
    // distances is metadata-sized work, not a distributed expression
    val cents = model.clusterCenters.map(_.toArray)
    val qRows = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id"), col("embedding"), col("n2")).collect()
    val probes = qRows.flatMap { r =>
      val qv = r.getSeq[Float](1).toArray.map(_.toDouble)
      cents.zipWithIndex
        .map { case (c, i) =>
          val d2 = qv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          (d2, i)
        }
        .sortBy(_._1).take(IvfProbes)
        .map { case (_, cell) => (r.getLong(0), cell) }
    }.toSeq
    val queries = probes.toDF("q_id", "cell")
      .join(e.select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"),
        col("n2").as("q_n2")), "q_id")
    val cands = assigned.join(broadcast(queries), "cell")
      .withColumn("dot", vec_qdot(col("q_embedding"), col("embedding")))
      .withColumn("sim", col("dot").cast("double") /
        (sqrt(col("q_n2").cast("double")) * sqrt(col("n2").cast("double"))))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    cands
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("vec_id"), col("sim"))
      .orderBy(col("q_id"), col("rk"))
  }

  val Tables_ = 4 // LSH tables
  val BitsPerTable = 4

  /** ANN via multi-table sign-random-projection LSH: each of 4 tables
    * hashes a vector to 4 sign bits of dot products with deterministic
    * ±1 hyperplanes (weights from xxhash64(table·4+plane, dim)).
    * Candidates = vectors sharing a bucket with the query in ANY table
    * (classic OR-amplification), then exact re-rank of candidates.
    * Engine-specific hashing → no SQL oracle; recall vs [[cosineTopK]]
    * is checked in the test suite. */
  def annCosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val planes = Tables_ * BitsPerTable
    val bucketed = quantized(Tables.embeddings(spark, sfDir))
      .withColumn("bits", expr(
        s"""transform(sequence(0, ${planes - 1}), p ->
           |  if(aggregate(sequence(0, size(iv) - 1), cast(0 as bigint), (s, d) ->
           |    s + iv[d] * (cast((xxhash64(p, d) & 2) as bigint) - 1)) > 0, 1, 0))""".stripMargin))
      .withColumn("t", explode(expr(
        s"""transform(sequence(0, ${Tables_ - 1}), t -> named_struct('tbl', t,
           |  'bucket', aggregate(sequence(0, ${BitsPerTable - 1}), 0,
           |     (acc, b) -> acc * 2 + bits[t * $BitsPerTable + b])))""".stripMargin)))
      .select(col("vec_id"), col("embedding"), col("n2"), col("t.tbl"), col("t.bucket"))
    val queries = bucketed.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"), col("n2").as("q_n2"),
        col("tbl").as("q_tbl"), col("bucket").as("q_bucket"))
    val cands = bucketed
      .join(broadcast(queries),
        col("tbl") === col("q_tbl") && col("bucket") === col("q_bucket"))
      .select(col("q_id"), col("vec_id"), col("q_embedding"), col("q_n2"),
        col("embedding"), col("n2"))
      .dropDuplicates("q_id", "vec_id")
      .withColumn("dot", vec_qdot(col("q_embedding"), col("embedding")))
      .withColumn("sim", col("dot").cast("double") /
        (sqrt(col("q_n2").cast("double")) * sqrt(col("n2").cast("double"))))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    cands
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("vec_id"), col("sim"))
      .orderBy(col("q_id"), col("rk"))
  }
}
