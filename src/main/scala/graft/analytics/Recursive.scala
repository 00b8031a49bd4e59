package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Recursive CTE (Spark 4's `WITH RECURSIVE`) — hierarchical rollup.
  *
  * The part keyspace is treated as an implicit binary tree
  * (`parent(k) = k div 2`, roots 1..7 = the top three levels): a
  * bill-of-materials stand-in built from key arithmetic only, so the
  * recursion is real (depth ≈ log₂ of the part count, deeper at every
  * larger SF) while staying bit-deterministic and exactly mirrorable.
  * Each recursion step is one equi-join (`child div 2 = node`) — the
  * iterative-join execution Spark plans for recursion is the same
  * shape dupClusters hand-rolls, but expressed declaratively. The
  * `child > node` guard matters: testdata keys start at 0 and
  * `0 div 2 = 0` would self-loop straight into the recursion limit;
  * tree edges are strictly increasing, so the guard is free.
  *
  * The rollup answers the BOM question: for every top-level assembly
  * (root), how many descendant parts exist and what do they cost in
  * total. Decimal sums for engine parity.
  */
object Recursive {

  private def text(table: String): String =
    s"""WITH RECURSIVE reach(root, node) AS (
       |  SELECT p_partkey, p_partkey FROM $table WHERE p_partkey BETWEEN 1 AND 7
       |  UNION ALL
       |  SELECT r.root, c.p_partkey
       |  FROM reach r JOIN $table c ON c.p_partkey div 2 = r.node
       |    AND c.p_partkey > r.node
       |)
       |SELECT root, count(*) AS n_parts,
       |  CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       |  max(p.p_partkey) AS max_key
       |FROM reach JOIN $table p ON p.p_partkey = reach.node
       |GROUP BY root
       |ORDER BY root""".stripMargin

  /** Registered query `x7_recursive_cte`. */
  def bomRollup(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.part(spark, sfDir).createOrReplaceTempView("graft_part_rec")
    spark.sql(text("graft_part_rec"))
  }

  /** DuckDB mirror: integer division spelled `//`. */
  val bomRollupSql: String = text("part").replace("div 2", "// 2")
}
