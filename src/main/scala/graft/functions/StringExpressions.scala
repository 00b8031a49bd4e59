package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper the generated code calls — codegen can only emit
  * calls to stable JVM entry points. */
object NfcHelper {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan and almost all
    // real text is already NFC — skip the allocation+copy for it
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(str)` — Unicode NFC normalization as a native,
  * codegen'd Catalyst expression (Spark has no normalization builtin;
  * the alternative, a Scala UDF, would box every row and block
  * WholeStageCodegen).
  *
  * Canonical composition is the entry gate of every text pipeline
  * that hashes, dedups, or joins on string equality: "é" as one code
  * point and "e"+U+0301 are distinct byte strings that must compare
  * equal after this map. Null → null. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // NullType: an untyped NULL literal behaves like the builtins
    // (null in → null out) instead of failing analysis
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = NfcHelper.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcHelper.nfc($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static helper for [[RollingHash]] — one tight primitive loop. */
object RollingHashHelper {
  val Base = 31L
  val Mod = 1000000007L

  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    // iterate CODE POINTS, not UTF-16 units: the HOF formulation this
    // replaces (ascii ∘ per-character substring) and the DuckDB oracle
    // both see one step per code point — charAt would split non-BMP
    // characters into two surrogate steps and diverge from the oracle
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** `rolling_hash(str)` — polynomial rolling hash
  * (Σ cᵢ·31^(n−i) mod 1e9+7) as a codegen'd expression.
  *
  * The HOF formulation (`aggregate(transform(sequence(1, length(text)),
  * i -> ascii(substring(text, i, 1))), …)`) materializes a per-char
  * array and walks TWO interpreted lambda closures per character —
  * the corpus-length interpreted-lambda trap this suite bans from hot
  * paths. This expression is one primitive loop inside
  * WholeStageCodegen, no intermediate array. Character semantics:
  * Unicode CODE POINTS (`codePointAt`), identical to the HOF's
  * `ascii(substring(…))` and the DuckDB mirror on every input incl.
  * non-BMP, pinned by an equivalence spec on the real corpus.
  * Null → null; empty string → 0 (same as the HOF's guarded branch).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    RollingHashHelper.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashHelper.hash($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object StringFunctions {
  def nfc_normalize(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
  def rolling_hash(c: Column): Column = Bridge.column(RollingHash(Bridge.expression(c)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
  }
}
