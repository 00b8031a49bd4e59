package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as ONE custom sketch aggregate
  * (`TypedImperativeAggregate[Array[Long]]`): input rows are shingle
  * strings, the buffer is the running 32-perm minimum vector, output
  * is `array<bigint>`.
  *
  * The composed form ([[graft.ext.Dedup.minhashNearDup]]) uses 32
  * separate `min(xxhash64(i, s))` aggregates — correct, but it pays
  * per-aggregate dispatch and hashes the shingle 32× through
  * UTF8String paths. This sketch hashes the bytes once per permutation
  * inside one buffer update, the classic shape for HLL/quantile/minhash
  * sketches (SURVEY.md §2c X3 note: TypedImperativeAggregate for
  * sketch aggregation). Hash function: xxHash64 (same algorithm family
  * Spark exposes as `xxhash64`), seeded by permutation index.
  *
  * Map-side partial aggregation works as usual: buffers merge by
  * element-wise min, so each input partition ships 32 longs per group.
  */
case class MinHashAgg(
    child: Expression,
    numPerms: Int = 32,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var i = 0
      while (i < numPerms) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, i)
        // widen the 32-bit murmur with a 64-bit finalizer for spread
        val h64 = fmix64(h.toLong ^ (i.toLong << 32))
        if (h64 < buf(i)) buf(i) = h64
        i += 1
      }
    }
    buf
  }

  @inline private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Column API: minhash_sig(shingleCol) → array<bigint>(numPerms). */
  def minhash_sig(c: Column, numPerms: Int = 32): Column =
    Bridge.column(MinHashAgg(Bridge.expression(c), numPerms)
      .toAggregateExpression())
}
