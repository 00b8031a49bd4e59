package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** HyperLogLog cardinality sketch as a custom
  * `TypedImperativeAggregate[Array[Byte]]` — the classic mergeable
  * 100 TB distinct-count structure (Flajolet et al. 2007), built here
  * to be ORACLE-EXACT, which stock HLLs are not:
  *
  *  - input is the corpus's standard 60-bit md5-fold hash (computed in
  *    the query, identically in DuckDB), not an engine-private hash;
  *  - the register rank is trailing-zeros(+1) of the sentinel-capped
  *    upper 48 bits — like leading-zeros, geometric on uniform bits,
  *    but mirrorable in SQL with pure integer CASE arithmetic;
  *  - the harmonic sum Σ 2^(−r) is computed as the INTEGER
  *    Σ 2^(rmax−r) (one BIGINT, no float accumulation order to
  *    diverge), and the final estimate is a single expression over
  *    that integer, m, 2^rmax, and the alpha constant spelled from
  *    identical literals in both engines — bit-identical doubles.
  *
  * No small-range/large-range corrections (they need `ln`, banned by
  * the oracle-parity rules); the raw estimate's ~6.5 % error at
  * p = 8 is what the spec pins. Buffer: 256 bytes; merge:
  * element-wise max — the property that makes the sketch shippable
  * as a map-side partial aggregate.
  */
case class HllAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  import HllAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hll_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a bigint hash column")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // floorMod: the corpus md5-fold hash is non-negative (identical
      // result), but a caller wiring a SIGNED hash (xxhash64) must not
      // index the register array negatively
      val bucket = java.lang.Math.floorMod(h, M.toLong).toInt
      val w = (h >>> P) | Sentinel
      val rho = (java.lang.Long.numberOfTrailingZeros(w) + 1).toByte
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    var rmax = 0
    var i = 0
    while (i < M) { if (buf(i) > rmax) rmax = buf(i); i += 1 }
    var num = 0L // Σ 2^(rmax − r): exact, order-independent
    i = 0
    while (i < M) { num += 1L << (rmax - buf(i)); i += 1 }
    Alpha * M.toDouble * M.toDouble * (1L << rmax).toDouble / num.toDouble
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HllAgg {
  val P = 8
  val M: Int = 1 << P // 256 registers — sized so the testdata's
  // per-source shingle cardinalities (~3.7k) sit WELL above the
  // small-range regime (n ≳ 10·m): the standard small-range rescue is
  // linear counting, which needs `ln` — banned by the oracle-parity
  // rules — so the operating point must not need it. At p = 8 the raw
  // estimate's typical error is 1.04/√m ≈ 6.5 %.
  val Sentinel: Long = 1L << 48 // caps rho at 49 on the 48-bit slice
  /** Same literal expression as the SQL mirror — identical doubles. */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / 256.0)

  /** Column API: hll_estimate(hashCol) → double. The column must be
    * the 60-bit md5-fold hash so the DuckDB mirror sees identical
    * register updates. */
  def hll_estimate(c: Column): Column =
    Bridge.column(HllAgg(Bridge.expression(c)).toAggregateExpression())
}
