package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded posting-list aggregate: `(n, docs)` per group where `n` is
  * the exact group count and `docs` holds the member ids ONLY while
  * the group stays within `cap` (collection stops at cap+1 — one
  * sentinel slot proves overflow). The inverted-index primitive for
  * df-capped candidate generation (d02): a plain
  * `collect_list(doc_id)` materializes the full posting list BEFORE
  * the df filter can drop it — a stop-word shingle at 100 TB collects
  * millions of ids into one aggregation buffer. This buffer is ≤
  * (cap+1) longs forever; groups beyond the cap cost 8 bytes of
  * truncated list plus the count. Same bounded-sketch family as
  * [[TopKMinAgg]]/[[MinHashSigAgg]].
  *
  * Buffer element order is partitioning-dependent (like
  * collect_list); consumers sort the array before use.
  */
case class CappedDocsAgg(
    child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedDocsAgg.Buf] {
  import CappedDocsAgg.Buf

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_capped_docs requires a bigint doc id, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Buf = new Buf(0L, new Array[Long](cap + 1), 0)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      if (buf.len <= cap) { buf.docs(buf.len) = v.asInstanceOf[Long]; buf.len += 1 }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b1.n += b2.n
    var i = 0
    while (i < b2.len && b1.len <= cap) { b1.docs(b1.len) = b2.docs(i); b1.len += 1; i += 1 }
    b1
  }

  override def eval(buf: Buf): Any =
    new GenericInternalRow(Array[Any](buf.n,
      new GenericArrayData(java.util.Arrays.copyOf(buf.docs, buf.len))))

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + buf.len * 8)
    bb.putLong(buf.n).putInt(buf.len)
    var i = 0
    while (i < buf.len) { bb.putLong(buf.docs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong; val len = bb.getInt
    val docs = new Array[Long](cap + 1)
    var i = 0
    while (i < len) { docs(i) = bb.getLong; i += 1 }
    new Buf(n, docs, len)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("docs", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_capped_docs"

  override def withNewMutableAggBufferOffset(o: Int): CappedDocsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedDocsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CappedDocsAgg =
    copy(child = cs.head)
}

object CappedDocsAgg {
  /** Mutable aggregation state: exact count + first ≤ cap+1 ids. */
  final class Buf(var n: Long, val docs: Array[Long], var len: Int)

  /** Column API: struct(n, docs) with docs truncated past `cap`. */
  def cappedDocs(c: Column, cap: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      CappedDocsAgg(org.apache.spark.sql.GraftBridge.expr(c), cap)
        .toAggregateExpression())
}
