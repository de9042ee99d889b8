package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The k smallest DISTINCT longs per group, as a
  * `TypedImperativeAggregate` over a fixed k-slot sorted buffer —
  * the bounded-memory replacement for
  * `slice(array_sort(collect_set(h)), 1, k)` (t07's fingerprint):
  * collect_set materializes EVERY distinct value per group in the
  * aggregation buffer, O(doc length) for rolling-window hashes — a
  * memory bomb on 10 MB documents — while this buffer is k longs
  * forever, so the shuffle payload and heap cost are independent of
  * document size (the SURVEY §7.3 (9) sketch-aggregate shape, same
  * family as [[MinHashSigAgg]]).
  *
  * Semantics match the expression form exactly: duplicates ignored,
  * ascending order, groups with fewer than k distinct values yield a
  * short array. Values must be < Long.MaxValue (the empty-slot
  * sentinel) — true for every md5-derived hash here (< 2^60).
  */
case class TopKMinAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_min requires a bigint input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  /** Insert-sorted with dedup: skip if ≥ current k-th smallest or
    * already present; otherwise shift-insert at the binary-search
    * position (buf is always ascending, MaxValue-padded). Binary
    * search + arraycopy keeps the per-insert cost O(log k + move)
    * so the aggregate stays cheap at BOTH ends of the k range —
    * k=4 fingerprints (t07) and k=4096 bottom-k Jaccard sets (d03).
    */
  private def insert(buf: Array[Long], x: Long): Unit = {
    if (x >= buf(k - 1)) return
    val pos = java.util.Arrays.binarySearch(buf, 0, k, x)
    if (pos >= 0) return // distinct-only
    val i = -(pos + 1)
    System.arraycopy(buf, i, buf, i + 1, k - 1 - i)
    buf(i) = x
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k && b2(i) != Long.MaxValue) { insert(b1, b2(i)); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0
    while (n < k && buf(n) != Long.MaxValue) n += 1
    new GenericArrayData(buf.take(n))
  }

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
  override def prettyName: String = "graft_topk_min"

  override def withNewMutableAggBufferOffset(o: Int): TopKMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKMinAgg =
    copy(child = cs.head)
}

object TopKMinAgg {
  /** Column API: ascending array of the k smallest distinct values of
    * a long column. */
  def topKMin(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      TopKMinAgg(org.apache.spark.sql.GraftBridge.expr(c), k)
        .toAggregateExpression())
}
