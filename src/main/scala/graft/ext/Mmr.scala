package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X3 — Maximal Marginal Relevance (MMR) diversified top-k: select
  * [[SelectK]] results for a probe from a [[PoolK]]-candidate cosine
  * pool, trading relevance against redundancy
  * (`mmr = λ·rel − (1−λ)·max_{s∈S} sim(c, s)`, λ = 0.7, Carbonell &
  * Goldstein '98). For a training-data engine this is diverse exemplar
  * selection — the greedy counterpart to the coreset/dedup family.
  *
  * Scale shape: the corpus-sized work is exactly the [[Similarity]]
  * top-k candidate pass (broadcast 1-row probe, distributed
  * TakeOrderedAndProject). The greedy refinement is inherently
  * sequential but operates ONLY on the [[PoolK]]-row candidate frame —
  * a deliberately driver-bounded constant, the standard MMR regime.
  * The candidate frame is lazily local-checkpointed: each of the 5
  * unrolled selection steps references it (and the pairwise sim matrix
  * derived from it) several times, and without the checkpoint every
  * re-reference would replay the corpus top-k scan.
  *
  * Determinism: sims are the repo-standard quantized-int dots divided
  * once as IEEE doubles (identical in any IEEE-754 engine — same
  * trick as [[Similarity.cosineTopK]]); the MMR combination is written
  * `(0.7·rel) − (0.3·maxsim)` with identical association in both
  * engines; ties break on vec_id. The oracle unrolls the same 5 greedy
  * steps as CTEs (step 1 falls out of the same template via an empty
  * selected-set seed).
  */
object Mmr {
  val PoolK = 12
  val SelectK = 5

  def mmrSelect(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 10000000) as bigint))").as("iv"))
      .withColumn("n2", graft.functions.VectorFunctions.vec_ldot(col("iv"), col("iv"))) // codegen self-dot (round 14)
    val probe = e.filter(col("vec_id") === 0)
      .select(col("iv").as("q_iv"), col("n2").as("q_n2"))
    val cand = e.filter(col("vec_id") > 0)
      .crossJoin(broadcast(probe))
      .withColumn("dot", graft.functions.VectorFunctions.vec_ldot(col("iv"), col("q_iv"))) // codegen dot (round 14)
      .withColumn("rel", col("dot").cast("double") /
        (sqrt(col("q_n2").cast("double")) * sqrt(col("n2").cast("double"))))
      .orderBy(col("rel").desc, col("vec_id")).limit(PoolK)
      .select(col("vec_id"), col("iv"), col("n2"), col("rel"))
      .localCheckpoint(eager = false)

    val simMatrix = cand.select(col("vec_id").as("a"), col("iv").as("a_iv"), col("n2").as("a_n2"))
      .crossJoin(cand.select(col("vec_id").as("b"), col("iv").as("b_iv"), col("n2").as("b_n2")))
      .filter(col("a") =!= col("b"))
      .withColumn("dot", graft.functions.VectorFunctions.vec_ldot(col("a_iv"), col("b_iv"))) // codegen dot (round 14)
      .select(col("a"), col("b"), (col("dot").cast("double") /
        (sqrt(col("a_n2").cast("double")) * sqrt(col("b_n2").cast("double")))).as("sim"))

    var selected = cand.filter(lit(false)).select(col("vec_id"))
    val steps = (1 to SelectK).map { s =>
      val remaining = cand.join(selected, Seq("vec_id"), "left_anti")
      val selSims = simMatrix.join(
        selected.select(col("vec_id").as("b_sel")), col("b") === col("b_sel"))
      val pick = remaining
        .join(selSims, remaining("vec_id") === selSims("a"), "left_outer")
        .groupBy(remaining("vec_id"), col("rel"))
        .agg(coalesce(max(col("sim")), lit(0.0)).as("maxsim"))
        .withColumn("mmr", (lit(0.7) * col("rel")) - (lit(0.3) * col("maxsim")))
        .orderBy(col("mmr").desc, col("vec_id")).limit(1)
        .select(lit(s.toLong).as("step"), col("vec_id"), col("rel"),
          col("maxsim"), col("mmr"))
        .localCheckpoint(eager = false)
      selected = selected.unionByName(pick.select(col("vec_id")))
      pick
    }
    steps.reduce(_ unionByName _).orderBy(col("step"))
  }

  val mmrSelectSql: String = {
    val steps = (1 to SelectK).map { s =>
      s"""sc$s AS (
         |  SELECT c.vec_id, c.rel, coalesce(max(m.sim), 0.0) AS maxsim
         |  FROM cand c
         |  LEFT JOIN (SELECT s.a, s.sim FROM simm s JOIN selset$s t ON s.b = t.vec_id) m
         |    ON m.a = c.vec_id
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM selset$s)
         |  GROUP BY c.vec_id, c.rel),
         |sel$s AS (
         |  SELECT CAST($s AS BIGINT) AS step, vec_id, rel, maxsim,
         |    (0.7 * rel) - (0.3 * maxsim) AS mmr
         |  FROM sc$s ORDER BY mmr DESC, vec_id LIMIT 1),
         |selset${s + 1} AS (
         |  SELECT vec_id FROM selset$s UNION ALL SELECT vec_id FROM sel$s)""".stripMargin
    }.mkString(",\n")
    s"""WITH q0 AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS iv
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, iv, CAST(list_sum(list_transform(iv, x -> x * x)) AS BIGINT) AS n2
       |  FROM q0),
       |probe AS (SELECT iv AS q_iv, n2 AS q_n2 FROM n WHERE vec_id = 0),
       |cand AS (
       |  SELECT c.vec_id, c.iv, c.n2,
       |    CAST(list_sum(list_transform(list_zip(c.iv, p.q_iv), z -> z[1] * z[2])) AS DOUBLE) /
       |      (sqrt(CAST(p.q_n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS rel
       |  FROM n c CROSS JOIN probe p
       |  WHERE c.vec_id > 0
       |  ORDER BY rel DESC, c.vec_id LIMIT $PoolK),
       |simm AS (
       |  SELECT a.vec_id AS a, b.vec_id AS b,
       |    CAST(list_sum(list_transform(list_zip(a.iv, b.iv), z -> z[1] * z[2])) AS DOUBLE) /
       |      (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS sim
       |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
       |selset1 AS (SELECT vec_id FROM cand WHERE false),
       |$steps
       |SELECT step, vec_id, rel, maxsim, mmr
       |FROM (${(1 to SelectK).map(s => s"SELECT * FROM sel$s").mkString(" UNION ALL ")})
       |ORDER BY step""".stripMargin
  }
}
