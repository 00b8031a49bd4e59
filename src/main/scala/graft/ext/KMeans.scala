package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X3 — integer-exact Lloyd k-means over the embeddings table.
  *
  * Three fixed Lloyd iterations, k = 8, seeded with the first k
  * vectors (deterministic — no sampled init). Everything the oracle
  * hashes is engine-agnostic:
  *   - vectors are the repo-standard quantized ints (round(x·10⁷));
  *   - assignment distance is the INTEGER squared L2 (zip_with +
  *     BIGINT fold, ≤ 64·(1.2·10⁷)² ≈ 9·10¹⁵ — inside Long);
  *   - argmin ties break on cluster id (`min_by` over a unique
  *     (dist, j) key — no nondeterministic tie);
  *   - centroid update is floor(sum/count): the sum stays < 2⁵³, so
  *     the one double division is exactly representable and floor()
  *     truncates toward −∞ identically in Spark and DuckDB;
  *   - per-cluster inertia is reported in millionths
  *     (`sum(dist div 10⁶)` — per-row truncation of a POSITIVE value,
  *     so `div` and `//` agree, and the sum cannot overflow Long at
  *     any realistic corpus size).
  *
  * Scale shape: each iteration is one broadcast of the ≤k-row centroid
  * frame to a fresh corpus scan (never a corpus shuffle for the
  * assignment), one map-side-combinable (j, dim) aggregate whose
  * post-shuffle cardinality is ≤ k·64 rows, and one k-row reassembly.
  * The centroid chain is strictly linear (iteration i consumes
  * centroids i−1 exactly once), so the plan grows linearly and needs
  * no lineage checkpoint. This is exactly how spark.ml's own KMeans
  * iterates — re-expressed declaratively so the DuckDB oracle can
  * replay it CTE by CTE.
  */
object KMeans {
  val K = 8
  val Iters = 3

  private val QuantExpr =
    "transform(embedding, x -> cast(round(cast(x as double) * 10000000) as bigint))"
  // round 14 (guide: expressions & codegen): the squared-L2 was
  // `aggregate(zip_with(iv, cv, (a,b) -> (a-b)*(a-b)), 0L, …)` —
  // interpreted lambdas plus a zipped-array allocation per (point ×
  // centroid) row, the hot loop of every iteration. vec_l2q is the
  // same integer arithmetic in one codegen'd primitive loop
  // (graft.functions.QuantizedL2) — bit-identical results.
  private def distCol: org.apache.spark.sql.Column =
    graft.functions.VectorFunctions.vec_l2q(col("iv"), col("cv"))

  def kmeansLloyd(spark: SparkSession, sfDir: String): DataFrame = {
    // lazy local checkpoint (the PageRank edge-frame device): pts feeds
    // every iteration's assignment plus the final one — 4 subtrees that
    // would each re-run the interpreted quantization transform
    val pts = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr(QuantExpr).as("iv"))
      .localCheckpoint(eager = false)
    var cent = pts.filter(col("vec_id") < K)
      .select(col("vec_id").as("j"), col("iv").as("cv"))

    for (_ <- 1 to Iters) {
      val assigned = pts.crossJoin(broadcast(cent))
        .withColumn("dist", distCol)
        .groupBy(col("vec_id"))
        .agg(expr("min_by(struct(j, iv), struct(dist, j))").as("m"))
        .select(col("m.j").as("j"), col("m.iv").as("iv"))
      cent = assigned
        .select(col("j"), posexplode(col("iv")))
        .withColumnRenamed("pos", "d").withColumnRenamed("col", "v")
        .groupBy(col("j"), col("d"))
        .agg(floor(sum(col("v")).cast("double") / count(lit(1))).as("cvd"))
        .groupBy(col("j"))
        .agg(expr("transform(array_sort(collect_list(struct(d, cvd))), s -> s.cvd)").as("cv"))
    }

    pts.crossJoin(broadcast(cent))
      .withColumn("dist", distCol)
      .groupBy(col("vec_id"))
      .agg(expr("min_by(struct(j, dist), struct(dist, j))").as("m"))
      .select(col("vec_id"), col("m.j").as("j"), col("m.dist").as("dist"))
      .groupBy(col("j"))
      .agg(
        count(lit(1)).as("n_members"),
        expr("sum(dist div 1000000)").as("inertia_m"),
        min(col("vec_id")).as("first_member"))
      .orderBy(col("j"))
  }

  val kmeansLloydSql: String = {
    val dist =
      "CAST(list_sum(list_transform(list_zip(p.iv, c.cv), z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
    def iter(i: Int): String =
      s"""s$i AS (
         |  SELECT p.vec_id, p.iv, c.j, $dist AS dist
         |  FROM pts p CROSS JOIN cent${i - 1} c),
         |a$i AS (
         |  SELECT vec_id, iv, j FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rk
         |    FROM s$i) t
         |  WHERE rk = 1),
         |cd$i AS (
         |  SELECT j, unnest([{'d': CAST(x - 1 AS BIGINT), 'v': iv[x]}
         |    FOR x IN range(1, len(iv) + 1)], recursive := true)
         |  FROM a$i),
         |cent$i AS (
         |  SELECT j, list(cvd ORDER BY d) AS cv
         |  FROM (SELECT j, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS cvd
         |        FROM cd$i GROUP BY 1, 2) g
         |  GROUP BY j)""".stripMargin
    val fin = Iters + 1
    s"""WITH pts AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS iv
       |  FROM embeddings),
       |cent0 AS (SELECT vec_id AS j, iv AS cv FROM pts WHERE vec_id < $K),
       |${(1 to Iters).map(iter).mkString(",\n")},
       |s$fin AS (
       |  SELECT p.vec_id, c.j, $dist AS dist
       |  FROM pts p CROSS JOIN cent$Iters c),
       |a$fin AS (
       |  SELECT vec_id, j, dist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rk
       |    FROM s$fin) t
       |  WHERE rk = 1)
       |SELECT j, count(*) AS n_members,
       |  CAST(sum(dist // 1000000) AS BIGINT) AS inertia_m,
       |  min(vec_id) AS first_member
       |FROM a$fin GROUP BY j ORDER BY j""".stripMargin
  }
}
