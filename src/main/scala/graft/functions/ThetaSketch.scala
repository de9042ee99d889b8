package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch distinct-set family (DataSketches theta, the jar Spark
  * itself ships for its HLL functions' sibling library).
  *
  * WHY next to q29/q55's HLL: an HLL sketch answers only |A| and
  * |A ∪ B| — union is its single closed operation. A THETA sketch is a
  * uniform hash SAMPLE of the distinct items, so it additionally
  * supports INTERSECTION and difference: |A ∩ B| without a pairwise
  * exact-distinct join over the raw data. That is the audience-overlap
  * / train-test-source-overlap primitive at 100 TB — build one
  * kilobyte-scale sketch per group in ONE pass (mergeable partial
  * aggregates, map-side combined like any aggregate buffer), persist
  * them, then answer any of the G·(G−1)/2 pairwise overlaps from the
  * stored sketches alone (q61), never rescanning the fact.
  *
  * Error model: a theta sketch with lgK nominal entries is EXACT below
  * ~2^lgK distinct items (every hash retained, theta = 1); above, it
  * keeps the 2^lgK smallest hashes and estimates with relative
  * standard error ≈ 1/sqrt(2^lgK) (Dasgupta et al., "A Framework for
  * Estimating Stream Expression Cardinalities", arXiv:1510.01455).
  * Intersection error is relative to the UNION size, not the
  * intersection — the caller's bound must scale accordingly (q61
  * uses 5%·|A ∪ B|, ≈ 3σ at lgK=12).
  */
case class ThetaSketchAgg(
    child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"graft_theta_sketch lgK out of range: $lgK")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_sketch requires bigint or string input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long => buf.update(l.longValue)
      case s: UTF8String => buf.update(s.getBytes)
      case other => throw new IllegalStateException(
        s"graft_theta_sketch: unexpected input ${other.getClass}")
    }
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult)
    b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_theta_sketch"

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = cs.head)
}

/** Rollup merge of STORED theta sketches (binary column → one merged
  * sketch) — the theta twin of `hll_union_agg`, so a warehouse can
  * keep fine-grained sketches and re-aggregate them to any coarser
  * grouping without touching the raw data (the q55 pattern). */
case class ThetaUnionAgg(
    child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"graft_theta_union lgK out of range: $lgK")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_union requires a binary sketch column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult)
    b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_theta_union"

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = cs.head)
}

/** Estimated cardinality of a serialized theta sketch. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_estimate requires a binary sketch, got ${other.simpleString}")
  }

  override def nullSafeEval(bytes: Any): Any =
    ThetaOps.estimate(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ThetaOps.estimate($b)")

  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** Estimated |A ∩ B| of two serialized theta sketches — the operation
  * HLL cannot express. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_intersect"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_theta_intersect requires (binary, binary), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ThetaOps.intersect($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}

/** Estimated |A \ B| of two serialized theta sketches — set DIFFERENCE,
  * the third closed operation of the theta algebra (union: ThetaUnionAgg;
  * intersection: ThetaIntersectEstimate). The churn/new-arrivals
  * primitive: "distinct in A not seen in B" from stored kilobyte
  * sketches, no raw-data anti-join. */
case class ThetaDiffEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_diff"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_theta_diff requires (binary, binary), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.diff(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ThetaOps.diff($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaDiffEstimate =
    copy(left = newLeft, right = newRight)
}

/** Static helpers shared by eval and generated code (the CmsEstimate
  * pattern — expressions stay inside whole-stage codegen). Wrapping a
  * compact sketch is a zero-copy view over the bytes; no caching
  * needed. */
object ThetaOps {
  def estimate(bytes: Array[Byte]): Double =
    Sketch.wrap(Memory.wrap(bytes)).getEstimate

  def intersect(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketch.wrap(Memory.wrap(a)))
    i.intersect(Sketch.wrap(Memory.wrap(b)))
    i.getResult.getEstimate
  }

  def diff(a: Array[Byte], b: Array[Byte]): Double = {
    val an = SetOperation.builder().buildANotB()
    an.setA(Sketch.wrap(Memory.wrap(a)))
    an.notB(Sketch.wrap(Memory.wrap(b)))
    an.getResult(false).getEstimate
  }
}

object ThetaSketchAgg {
  /** Column API: one theta sketch (binary) of the column's distinct
    * values per group. */
  def thetaSketch(col: Column, lgK: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      ThetaSketchAgg(org.apache.spark.sql.GraftBridge.expr(col), lgK)
        .toAggregateExpression())

  /** Column API: merge stored sketches (binary) into one. */
  def thetaUnion(col: Column, lgK: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      ThetaUnionAgg(org.apache.spark.sql.GraftBridge.expr(col), lgK)
        .toAggregateExpression())

  /** Column API: estimated cardinality of a stored sketch. */
  def thetaEstimate(col: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      ThetaEstimate(org.apache.spark.sql.GraftBridge.expr(col)))

  /** Column API: estimated intersection cardinality of two sketches. */
  def thetaIntersect(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      ThetaIntersectEstimate(
        org.apache.spark.sql.GraftBridge.expr(a),
        org.apache.spark.sql.GraftBridge.expr(b)))

  /** Column API: estimated |A \ B| of two sketches. */
  def thetaDiff(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      ThetaDiffEstimate(
        org.apache.spark.sql.GraftBridge.expr(a),
        org.apache.spark.sql.GraftBridge.expr(b)))
}
