package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction,
  ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DataTypes, IntegerType, LongType,
  ShortType, StringType, StructType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** The `bucket(numBuckets, col)` V2 function behind the lake's
  * storage-partitioned joins ([[LakeCatalog]] exposes it through
  * `FunctionCatalog`, the same wiring Iceberg uses): when a scan
  * reports `KeyGroupedPartitioning(bucket(n, key))`, Catalyst resolves
  * the transform against THIS function — two scans are co-partitioned
  * exactly when their bound functions share `canonicalName` and bucket
  * count, which is what lets `EnsureRequirements` drop both exchanges.
  *
  * The id is `pmod(murmur3(col, seed 42), n)` — bit-identical to
  * `HashPartitioning.partitionIdExpression`, i.e. to the partition
  * index `df.repartition(n, col)` assigns — so the write side
  * ([[graft.lake.Lake.compactBucketed]]) needs no custom partitioner
  * and the stats pass can re-derive every file's bucket with
  * `pmod(hash(col), n)`. A NULL key hashes to the bare seed (42), the
  * same value Spark's `hash()` yields, keeping all three sites (write
  * partitioning, stats verification, this function) in agreement. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): pmod(murmur3(col, 42), numBuckets) — " +
      "HashPartitioning's partition index; the lake's SPJ transform"

  /** Catalyst binds with the transform's argument shape: a synthetic
    * `numBuckets` INT field followed by the partition column. */
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, col), got ${inputType.catalogString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument is the INT bucket count, got " +
        inputType.fields(0).dataType.catalogString)
    inputType.fields(1).dataType match {
      case dt @ (LongType | IntegerType | ShortType | StringType) =>
        new GraftBucketBound(dt)
      case dt => throw new UnsupportedOperationException(
        s"graft bucket: unsupported key type ${dt.catalogString} " +
          "(long/int/short/string keys bucket)")
    }
  }
}

private[sources] final class GraftBucketBound(keyType: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(DataTypes.IntegerType, keyType)
  override def resultType(): DataType = DataTypes.IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket(${keyType.catalogString})"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val h =
      if (input.isNullAt(1)) 42 // Murmur3Hash(null) = the untouched seed
      else keyType match {
        case LongType => Murmur3_x86_32.hashLong(input.getLong(1), 42)
        case IntegerType => Murmur3_x86_32.hashInt(input.getInt(1), 42)
        case ShortType => Murmur3_x86_32.hashInt(input.getShort(1).toInt, 42)
        case StringType =>
          val s = input.getUTF8String(1)
          Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes(), 42)
        case _ => throw new IllegalStateException(s"unbindable $keyType")
      }
    ((h % n) + n) % n
  }
}
