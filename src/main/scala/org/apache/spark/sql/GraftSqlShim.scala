package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
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

  /** Idempotently register a planner strategy on the session (the
    * `SparkSessionExtensions` route needs the extension class at
    * session-build time; driver mains build plain sessions, so the
    * operator API self-registers through here instead). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s)) {
      exp.extraStrategies = exp.extraStrategies :+ s
    }
  }
}
