package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: register the graft custom
  * expressions with any session via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - double-precision dot product of two float arrays"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_qdot"),
      info("vec_qdot", "vec_qdot(a, b) - integer dot product of 1e7-quantized float arrays"),
      (exprs: Seq[Expression]) => QuantizedDot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_sq8dot"),
      info("vec_sq8dot", "vec_sq8dot(a, b) - integer dot product of int8-clamped quantized float arrays"),
      (exprs: Seq[Expression]) => Sq8Dot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_l2q"),
      info("vec_l2q", "vec_l2q(a, b) - integer squared L2 distance of pre-quantized bigint arrays"),
      (exprs: Seq[Expression]) => QuantizedL2(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_ldot"),
      info("vec_ldot", "vec_ldot(a, b) - integer dot product of pre-quantized bigint arrays"),
      (exprs: Seq[Expression]) => LongDot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(str) - Unicode NFC canonical composition"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - polynomial rolling hash (base 31, mod 1e9+7)"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("shingles"),
      info("shingles", "shingles(text, n) - generator of distinct character n-grams"),
      (exprs: Seq[Expression]) =>
        Shingles(exprs.head, exprs(1).eval().asInstanceOf[Int])))
    // whole-operator extension: per-key bounded-heap top-k
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // SQL UPDATE on graft-lake tables (copy-on-write through the
    // format's commit protocol; see sources/LakeDml.scala)
    ext.injectPlannerStrategy(_ => graft.sources.LakeDmlStrategy)
    // optimizer extension: constant-window range theta-join → binned equi-join
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
    // optimizer extension: Σ-maintainable aggregates over registered
    // lake tables answer from their materialized view (delta-log
    // freshness; change-feed compensation when stale)
    ext.injectOptimizerRule(_ => graft.plans.MatViewRewrite)
    // post-pushdown (pre-CBO) extension: TopN × filter boundary
    // pruning over built lake scans — Catalyst never offers pushTopN
    // with residual conjuncts, so the composition runs as a rule
    ext.injectPreCBORule(_ => graft.plans.TopNFilterPrune)
  }
}
