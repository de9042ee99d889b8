package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise MIN over fixed-width `array<long>` rows — the minhash
  * signature aggregate, as a `TypedImperativeAggregate` with a
  * primitive `Array[Long]` buffer (SURVEY §7.3 (9): the sketch-style
  * aggregate where imperative buffers beat expression trees).
  *
  * vs K separate `min(hs[i])` aggregate columns: one buffer per group
  * instead of K SpecificInternalRow slots, one array read per input
  * row instead of K `element_at` probes, and a fixed 8K-byte shuffle
  * payload. Used by d06_minhash_agg as the array-consuming reference
  * form; [[MinHashPairAgg]] is the hot-path variant d03 uses.
  */
case class MinHashSigAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires an array<bigint> input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(k, arr.numElements())
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_minhash_sig"

  override def withNewMutableAggBufferOffset(o: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinHashSigAgg =
    copy(child = cs.head)
}

object MinHashSigAgg {
  /** Column API: element-wise min signature of an array<long> column. */
  def minhashSig(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      MinHashSigAgg(org.apache.spark.sql.GraftBridge.expr(c), k)
        .toAggregateExpression())
}
