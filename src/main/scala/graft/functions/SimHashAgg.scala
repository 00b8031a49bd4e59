package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash bit-majority as ONE custom sketch aggregate
  * (`TypedImperativeAggregate[Array[Int]]`): input rows are the
  * 60-bit shingle hashes (already md5-folded to a long), the buffer is
  * the 60 per-bit vote counters, output is the folded simhash long.
  *
  * The composed form ([[graft.ext.Dedup.simhashFrame]]'s original
  * shape) uses 60 separate `sum(when(bit,1,-1))` aggregates — correct
  * and codegen'd, but it pays 60 aggregate-function dispatches per
  * input row and carries a 60-column aggregation buffer through the
  * shuffle. This sketch updates all 60 counters in one primitive loop
  * per row and ships one 240-byte buffer per group — the same
  * one-buffer treatment [[MinHashAgg]] gives the 32-perm signature.
  * Bit rule is identical (strict majority: counter > 0 ⇒ bit set), so
  * the result is bit-for-bit the composed version's and the DuckDB
  * mirror needs no change.
  *
  * Map-side partial aggregation works as usual: counter buffers merge
  * by element-wise addition.
  */
case class SimHashAgg(
    child: Expression,
    bits: Int = 60,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a bigint column")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
        b += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < bits) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var acc = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0) acc |= 1L << b
      b += 1
    }
    acc
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Column API: simhash_agg(hashCol) → bigint simhash. */
  def simhash_agg(c: Column, bits: Int = 60): Column =
    Bridge.column(SimHashAgg(Bridge.expression(c), bits)
      .toAggregateExpression())
}
