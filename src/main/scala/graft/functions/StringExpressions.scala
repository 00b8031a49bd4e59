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

object StringFunctions {
  def nfc_normalize(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
}
