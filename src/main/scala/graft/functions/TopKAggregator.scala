package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed bounded-heap top-k aggregator (`Aggregator[IN, BUF, OUT]`).
  *
  * The window `row_number` formulation of per-group top-k shuffles
  * EVERY row of a group to one task and sorts it; this aggregator
  * keeps only k (value, id) pairs per group in the buffer, so
  * map-side partial aggregation reduces each input partition to ≤ k
  * rows per group before the shuffle — the right shape at 100 TB when
  * groups are huge and k is tiny. Deterministic: ordered by
  * (value desc, id asc), ties broken by id.
  *
  * Oracled via the same SQL as the window form — both produce the
  * identical ranked set.
  */
object TopKAggregator {

  type Pair = (Double, Long) // (value desc, id asc)

  private def insert(buf: List[Pair], v: Pair, k: Int): List[Pair] = {
    // descending by value, ascending by id; list length ≤ k (k tiny)
    val (before, after) = buf.span(p => p._1 > v._1 || (p._1 == v._1 && p._2 < v._2))
    (before ::: v :: after).take(k)
  }

  class TopK(k: Int) extends Aggregator[Pair, List[Pair], Seq[Pair]] {
    override def zero: List[Pair] = Nil
    override def reduce(b: List[Pair], a: Pair): List[Pair] = insert(b, a, k)
    override def merge(b1: List[Pair], b2: List[Pair]): List[Pair] =
      b2.foldLeft(b1)((b, v) => insert(b, v, k))
    override def finish(r: List[Pair]): Seq[Pair] = r
    override def bufferEncoder: Encoder[List[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Pair]]()
    override def outputEncoder: Encoder[Seq[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pair]]()
  }

  /** Per-segment top-3 orders — same result set as
    * StarQueries.topOrdersPerSegment, computed via the typed
    * aggregator (groupByKey + partial aggregation). */
  def topOrdersPerSegment(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"), col("o_orderkey"))
      .as[(String, Double, Long)]
    val agg = new TopK(3)
      .toColumn.name("topk")
    val ranked = joined
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg)
      .flatMap { case (seg, items) =>
        items.zipWithIndex.map { case ((price, okey), i) =>
          (seg, (i + 1).toLong, okey, price)
        }
      }
      .toDF("c_mktsegment", "rk", "o_orderkey", "o_totalprice")
    ranked.orderBy(col("c_mktsegment"), col("rk"))
  }
}
