package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into the `private[sql]` surface that a custom whole-operator
  * extension needs (the same trick every out-of-tree Spark operator
  * library uses): build a DataFrame from a hand-constructed
  * LogicalPlan, and attach an extra planner strategy to a live
  * session. Kept to exactly these two calls — everything else in
  * graft uses the public API. */
object GraftSqlShim {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-plan a batch frame as a STREAMING one (`isStreaming=true`) —
    * the V1 `Source.getBatch` contract (StreamExecution asserts it),
    * and `internalCreateDataFrame` is the `private[sql]` door every
    * out-of-tree streaming source (Delta's DeltaSource included)
    * walks through. The batch plan compiles to its RDD lazily; its
    * own internals (vectorized scans, codegen) are untouched. */
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd,
      df.schema, isStreaming = true)
  }

  /** `NormalizeFloatingNumbers.normalize` is `private[sql]`; custom
    * operators need it for their grouping keys (±0.0 / NaN bit
    * patterns) because the optimizer rule of the same name only
    * rewrites operators it knows about. */
  def normalizeFloats(e: Expression): Expression = NormalizeFloatingNumbers.normalize(e)

  /** Idempotently register a planner strategy on the session (the
    * `SparkSessionExtensions` route needs the extension class at
    * session-build time; driver mains build plain sessions, so the
    * operator API self-registers through here instead). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    val exp = classicSpark.experimental
    // exp is session-shared mutable state and check-then-act on it races
    // (two threads issuing their first TopKPerKey call can both pass the
    // contains() check) — make registration atomic per session by
    // serializing on the experimental object itself
    exp.synchronized {
      // check the planner's FULL strategy list, not just extraStrategies:
      // a session built with GraftExtensions already carries the strategy
      // via injectPlannerStrategy, and registering it again would make
      // every node match twice
      if (!classicSpark.sessionState.planner.strategies.contains(s)) {
        exp.extraStrategies = exp.extraStrategies :+ s
      }
    }
  }

  /** Idempotently register an optimizer rule on the session (same
    * self-registration story as [[addStrategy]], for rewrite rules).
    * A GraftExtensions-built session carries the rule inside its
    * optimizer where this check can't see it — that double
    * application is safe for rewrite rules whose output no longer
    * matches their own pattern (BinnedRangeJoinRule's rewritten join
    * has an equi-key, which its eligibility check rejects). */
  def addOptimization(spark: SparkSession, r: Rule[LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraOptimizations.contains(r)) {
        exp.extraOptimizations = exp.extraOptimizations :+ r
      }
    }
  }
}
