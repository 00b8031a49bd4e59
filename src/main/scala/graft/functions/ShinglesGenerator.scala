package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingles(text, n)` — a custom Catalyst [[Generator]] emitting one
  * row per DISTINCT character n-gram of `text`.
  *
  * Why a Generator and not `explode(array_distinct(transform(...)))`
  * (the expression the dedup suite composes — Dedup.shinglesExpr):
  * the array form materializes the COMPLETE shingle array per row
  * twice (once from `transform`, once from `array_distinct`) before
  * the explode streams it out. For a 100 KB document that is ~100k
  * UTF8String slices of transient garbage per row, held concurrently.
  * The generator emits lazily — one iterator, one live row at a time,
  * with only the dedup hash-set (bounded by the distinct count, which
  * the array form also pays) retained across emissions. Same output,
  * flat memory: the difference between a working 100 TB shuffle stage
  * and an executor OOM on the long-document tail.
  *
  * Semantics match Dedup.shinglesExpr exactly: code-point n-grams
  * (UTF8String.substringSQL), texts shorter than n emit the whole
  * text once, null emits nothing, first-occurrence order.
  *
  * Codegen: generators run inside `GenerateExec`, which evaluates the
  * generator itself row-at-a-time ([[CodegenFallback]] is the normal
  * state for out-of-tree generators — GenerateExec supports codegen
  * only for the built-in explode family); the expensive part (the
  * per-shingle loop) is this compiled Scala, not an interpreted
  * lambda tree.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles requires (string, n >= 1), got ${child.dataType.simpleString}, n=$n")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String]
      val len = s.numChars()
      val total = math.max(len - n + 1, 1)
      val seen = new java.util.HashSet[UTF8String]()
      new Iterator[InternalRow] {
        private var i = 1 // substringSQL is 1-based
        private var nextRow: InternalRow = _
        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && i <= total) {
            val sh = s.substringSQL(i, n)
            i += 1
            if (seen.add(sh)) nextRow = InternalRow(sh)
          }
        }
        advance()
        override def hasNext: Boolean = nextRow != null
        override def next(): InternalRow = {
          val r = nextRow; advance(); r
        }
      }
    }
  }

  override def prettyName: String = "shingles"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Shingles {
  /** Column API: `df.select(col("doc_id"), shingles(col("text"), 8))`
    * — Dataset.select plans a `Generate` node around it. */
  def shingles(text: Column, n: Int): Column = Bridge.column(Shingles(Bridge.expression(text), n))

  /** SQL registration: `SELECT shingles(text, 8) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles",
      exprs => Shingles(exprs.head, exprs(1).eval().asInstanceOf[Int]),
      "built-in")
}
