package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature aggregate fed by the TWO base hashes directly:
  * lane_i = (a_i·h1 + b_i·h2) mod p is computed inside `update` as
  * plain long arithmetic and min-folded into a primitive buffer.
  *
  * vs [[MinHashSigAgg]] over a pre-built `zip_with` array: the K-lane
  * expansion never materializes per input row — no `zip_with` (an
  * interpreted higher-order function, off the codegen path), no
  * per-row `GenericArrayData` allocation, no K `pmod` expression
  * evaluations. The products stay below 2^53 (a,b < 2^20, h < 2^32),
  * so `%` never wraps and matches the oracle's modular formula
  * exactly. This is the hot-path form used by d03's LSH signature
  * stage; d06 keeps the array-consuming aggregate as the reference.
  */
case class MinHashPairAgg(
    h1: Expression, h2: Expression,
    a: Seq[Long], b: Seq[Long], p: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val k = a.length
  private val aArr = a.toArray
  private val bArr = b.toArray

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v1 = h1.eval(input)
    val v2 = h2.eval(input)
    if (v1 != null && v2 != null) {
      val x1 = v1.asInstanceOf[Long]
      val x2 = v2.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val lane = (aArr(i) * x1 + bArr(i) * x2) % p
        if (lane < buf(i)) buf(i) = lane
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
  override def children: Seq[Expression] = Seq(h1, h2)
  override def prettyName: String = "graft_minhash_pair_sig"

  override def withNewMutableAggBufferOffset(o: Int): MinHashPairAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashPairAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinHashPairAgg =
    copy(h1 = cs(0), h2 = cs(1))
}

object MinHashPairAgg {
  /** Column API: K-lane minhash signature from two base-hash columns. */
  def minhashPairSig(h1: Column, h2: Column,
                     a: Seq[Long], b: Seq[Long], p: Long): Column =
    org.apache.spark.sql.GraftBridge.column(
      MinHashPairAgg(
        org.apache.spark.sql.GraftBridge.expr(h1),
        org.apache.spark.sql.GraftBridge.expr(h2), a, b, p)
        .toAggregateExpression())
}
