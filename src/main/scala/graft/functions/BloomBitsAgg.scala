package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom-filter bitset aggregate: ORs pre-computed bit positions
  * (an `array<bigint>` column, one element per hash function) into a
  * fixed `numBits`-wide bitset held as `Array[Long]` words.
  *
  * The hashing deliberately stays OUTSIDE the aggregate: callers
  * compute positions with codegen'd built-ins
  * (`pmod(xxhash64(key, seed_i), numBits)` — see
  * [[graft.ops.BloomSemi.bitPositions]]), so build and probe sides
  * share one expression definition and the aggregate reduces to pure
  * bit-setting. Buffer is constant-size (`numBits/64` words —
  * 8 KB at 2^16 bits), map-side combined, merged by word-wise OR:
  * the canonical build shape for a broadcast semi-join prefilter at
  * 100 TB (shuffle one bitset per partition, never the keys).
  */
case class BloomBitsAgg(
    child: Expression, numBits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0,
    s"graft_bloom_bits numBits must be a positive multiple of 64, got $numBits")

  private val words = numBits / 64

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_bits requires an array<bigint> of bit positions, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val idx = arr.getLong(i)
          if (idx >= 0 && idx < numBits)
            buf((idx >> 6).toInt) |= 1L << (idx & 63)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bloom_bits"

  override def withNewMutableAggBufferOffset(o: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BloomBitsAgg =
    copy(child = cs.head)
}

object BloomBitsAgg {
  /** Column API: OR the given bit-position arrays into one
    * `numBits`-wide bitset (as `array<bigint>` words). */
  def bloomBits(positions: Column, numBits: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      BloomBitsAgg(org.apache.spark.sql.GraftBridge.expr(positions), numBits)
        .toAggregateExpression())
}
