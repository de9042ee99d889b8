package graft.functions

import org.apache.datasketches.frequencies.LongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** Frequent-items sketch (DataSketches LongsSketch, Misra-Gries-family
  * ReversePurge) — the fifth mergeable-sketch member, and the top-k
  * complement of [[CmsEstimate]]'s count-min (q60): a CMS answers
  * "how often does THIS key occur?" but cannot NAME the heavy
  * hitters — finding them still needs an exact second pass over all
  * keys. The frequent-items sketch carries the candidate set inside
  * its bounded map, so ONE pass over 100 TB yields the top items AND
  * their frequency bounds from maxMapSize counters per executor —
  * no exact per-key aggregation, no second scan.
  *
  * Error model (Misra-Gries): deterministic, no randomness — counts
  * are exact until the map saturates; each purge subtracts the
  * median counter, so every item's true count lies in
  * [lb, ub] = [est − maxError, est] with maxError ≤ n/maxMapSize
  * (`getMaximumError`). NO_FALSE_NEGATIVES returns every item whose
  * ub clears the threshold — a true heavy hitter can never be
  * missed. Merging sums counters and errors; the bound survives
  * rollup (q55 pattern). */
case class FreqSketchAgg(
    child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongsSketch] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"graft_freq_sketch maxMapSize must be a power of 2 >= 8: $maxMapSize")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_freq_sketch requires a bigint input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: LongsSketch, b2: LongsSketch): LongsSketch = b1.merge(b2)

  override def eval(buf: LongsSketch): Any = buf.toByteArray
  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_freq_sketch"

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = cs.head)
}

/** Rollup merge of STORED frequent-items sketches — counters and error
  * bounds sum, so fine-grained persisted sketches re-aggregate to any
  * coarser grouping (the q55/ThetaUnionAgg/KllMergeAgg pattern). */
case class FreqMergeAgg(
    child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongsSketch] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"graft_freq_merge maxMapSize must be a power of 2 >= 8: $maxMapSize")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_freq_merge requires a binary sketch column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(LongsSketch.getInstance(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(b1: LongsSketch, b2: LongsSketch): LongsSketch = b1.merge(b2)

  override def eval(buf: LongsSketch): Any = buf.toByteArray
  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_freq_merge"

  override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): FreqMergeAgg =
    copy(child = cs.head)
}

/** Per-item probe of a serialized frequent-items sketch:
  * struct(est, lb, ub) with the Misra-Gries guarantee
  * lb ≤ true count ≤ ub. Bounded probe volume (the sketch is read
  * post-aggregation, a handful of rows), so no byte-cache is needed —
  * the ThetaOps zero-copy-wrap pattern. */
case class FreqBounds(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = FreqOps.boundsType
  override def prettyName: String = "graft_freq_bounds"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_freq_bounds requires (binary sketch, bigint item), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(bytes: Any, item: Any): Any =
    FreqOps.bounds(bytes.asInstanceOf[Array[Byte]], item.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, i) => s"graft.functions.FreqOps.bounds($b, $i)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqBounds =
    copy(left = newLeft, right = newRight)
}

object FreqOps {
  val boundsType: StructType = StructType(Seq(
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false)))

  def bounds(bytes: Array[Byte], item: Long): InternalRow = {
    val sk = LongsSketch.getInstance(Memory.wrap(bytes))
    InternalRow(sk.getEstimate(item), sk.getLowerBound(item), sk.getUpperBound(item))
  }
}

object FreqSketchAgg {
  /** Column API: one frequent-items sketch (binary) per group. */
  def freqSketch(col: Column, maxMapSize: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      FreqSketchAgg(org.apache.spark.sql.GraftBridge.expr(col), maxMapSize)
        .toAggregateExpression())

  /** Column API: merge stored sketches (binary) into one. */
  def freqMerge(col: Column, maxMapSize: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      FreqMergeAgg(org.apache.spark.sql.GraftBridge.expr(col), maxMapSize)
        .toAggregateExpression())

  /** Column API: struct(est, lb, ub) for an item in a stored sketch. */
  def freqBounds(sketch: Column, item: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      FreqBounds(
        org.apache.spark.sql.GraftBridge.expr(sketch),
        org.apache.spark.sql.GraftBridge.expr(item)))
}
