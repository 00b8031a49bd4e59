package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.LongType

/** X7 as a CUSTOM WHOLE OPERATOR — per-key top-k with bounded heaps
  * (logical node + planner strategy + physical exec, the
  * SURVEY §2c "custom operator" rung of the preference ladder).
  *
  * Why a custom plan instead of the window formulation
  * (`row_number().over(partitionBy(key).orderBy(ord)) <= k`,
  * [[graft.analytics.StarQueries.topOrdersPerSegment]]): the window
  * version must SORT every shuffle partition — O(n log n) comparisons
  * and a full materialized sort buffer per partition — to keep only k
  * rows per key. This operator keeps a k-bounded binary heap per key
  * instead: O(n log k) comparisons, memory bounded by k·(#keys in the
  * partition) rows, no sort buffer, no spill pressure from rows that
  * can never rank.
  *
  * The strategy plans it as a two-phase exec, mirroring partial
  * aggregation: a map-side pass prunes each input partition to its
  * local top-k per key BEFORE the exchange (shuffle volume drops from
  * n rows to ≤ k·keys·partitions), then the required
  * ClusteredDistribution co-locates keys and the final pass merges
  * heaps and stamps 1-based ranks. At 100 TB this is the same shape
  * as a hash aggregate: one shuffle of pre-pruned rows, no global
  * sort anywhere.
  *
  * Same-rank determinism: callers must make `order` a total order per
  * key (include a tie-break column, as the window form does).
  */
case class TopKPerKeyNode(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rk is born here, not referenced from the child
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Two-phase physical operator for [[TopKPerKeyNode]].
  * `partial = true`: prune a partition to its local per-key top-k,
  * emit rows unchanged (runs before the exchange, like a partial
  * aggregate). `partial = false`: requires ClusteredDistribution on
  * the keys, merges, emits rows + 1-based rank. */
case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))

  // the numbers an operator must surface to be debuggable in the SQL
  // UI at scale: how hard the partial phase pruned (input vs output)
  // and the key cardinality the heaps held
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numInputRows" -> SQLMetrics.createMetric(sparkContext, "number of input rows"),
    "numKeys" -> SQLMetrics.createMetric(sparkContext, "number of distinct keys"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keys
    val orderLocal = order
    val isPartial = partial
    val childOutput = child.output
    val outAttrs = output
    val rankAttrLocal = rankAttr
    val outRows = longMetric("numOutputRows")
    val inRows = longMetric("numInputRows")
    val keyCount = longMetric("numKeys")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val cmp = GenerateOrdering.generate(orderLocal, childOutput)
      // max-heap under cmp: head = the currently-worst kept row, so
      // a better row evicts it in O(log k)
      val heapOrd = new Ordering[InternalRow] {
        def compare(a: InternalRow, b: InternalRow): Int = cmp.compare(a, b)
      }
      val heaps = mutable.HashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        inRows += 1
        val key = keyProj(row) // reused buffer: copy only on first sighting
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](heapOrd)
            heaps.put(key.copy(), h)
            keyCount += 1
            h
        }
        if (heap.size < kLocal) {
          heap.enqueue(row.copy())
        } else if (cmp.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      if (isPartial) {
        heaps.valuesIterator.flatMap(_.iterator).map { r => outRows += 1; r }
      } else {
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        val proj = UnsafeProjection.create(outAttrs, childOutput :+ rankAttrLocal)
        heaps.valuesIterator.flatMap { h =>
          // dequeueAll drains worst-first; reversed = rank order
          val ranked: Seq[InternalRow] = h.dequeueAll
          ranked.reverseIterator.zipWithIndex.map { case (r, i) =>
            rankRow.update(0, (i + 1).toLong)
            outRows += 1
            proj(joined(r, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] as partial-then-final [[TopKPerKeyExec]];
  * EnsureRequirements inserts the key exchange between the two. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, rankAttr, child) =>
      val local = TopKPerKeyExec(k, keys, order, rankAttr, partial = true, planLater(child))
      TopKPerKeyExec(k, keys, order, rankAttr, partial = false, local) :: Nil
    case _ => Nil
  }
}

/** Public API: `TopKPerKey(df, 3, Seq("seg"), Seq("price" -> true, "id" -> false))`
  * keeps each key's top 3 rows under (price DESC, id ASC) and appends
  * a 1-based `rk` BIGINT rank column. Registers [[TopKStrategy]] on
  * the dataframe's session idempotently (also injectable at
  * session-build time via [[graft.functions.GraftExtensions]]). */
object TopKPerKey {
  def apply(df: DataFrame, k: Int, keys: Seq[String],
      order: Seq[(String, Boolean)], rankName: String = "rk"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(keys.nonEmpty,
      "keys must be non-empty (for global top-k use orderBy(...).limit(k), " +
        "which plans as TakeOrderedAndProject)")
    val plan = df.queryExecution.analyzed
    require(!plan.output.exists(_.name == rankName),
      s"rank column '$rankName' already exists in the input — pick another rankName")
    def attr(n: String): Attribute = plan.output.filter(_.name == n) match {
      case Seq(a) => a
      case Seq() => throw new IllegalArgumentException(
        s"no column '$n' in [${plan.output.map(_.name).mkString(", ")}]")
      case _ => throw new IllegalArgumentException(
        s"ambiguous column '$n' (post-join duplicate?) — disambiguate before TopKPerKey")
    }
    val sortOrders = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    GraftSqlShim.addStrategy(df.sparkSession, TopKStrategy)
    // float/double keys: the exec groups on raw UnsafeRow bytes and the
    // exchange hashes the key expressions — normalize ±0.0 and NaN bit
    // patterns up front, exactly as Catalyst's NormalizeFloatingNumbers
    // does for Window/Aggregate keys (it doesn't know this node).
    // No-op for non-floating key types.
    val normalizedKeys = keys.map(n => GraftSqlShim.normalizeFloats(attr(n)))
    GraftSqlShim.ofRows(df.sparkSession,
      TopKPerKeyNode(k, normalizedKeys, sortOrders, rankAttr, plan))
  }

  /** Driver query `x7_topk_plan`: the same contract (and oracle) as
    * [[graft.analytics.StarQueries.topOrdersPerSegment]], computed by
    * the custom operator instead of a window sort. Columns are
    * pre-pruned before the node so the parquet scans stay narrow
    * (the optimizer does not prune through an unknown logical node). */
  def topOrdersPerSegmentPlan(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val o = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val c = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
    TopKPerKey(joined, 3, Seq("c_mktsegment"),
        Seq(("o_totalprice", true), ("o_orderkey", false)))
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_mktsegment"), col("rk"))
  }
}
