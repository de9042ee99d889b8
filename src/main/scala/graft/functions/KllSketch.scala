package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile-sketch family (DataSketches KLL, the jar Spark itself
  * ships for its HLL functions) — the fourth and final member of the
  * engine's mergeable-sketch algebra: HLL answers DISTINCT (q29/q55),
  * count-min answers FREQUENCY (q60), theta answers SET OPS (q61/q64),
  * and KLL answers QUANTILES.
  *
  * WHY next to approx_percentile (q35): Spark's GK buffers are
  * mergeable only *inside* one aggregation — they cannot be persisted
  * and re-merged later, so every new percentile question rescans the
  * fact. A KLL sketch is a few-KB byte array with a full merge
  * operation: build one per fine bucket in ONE pass (map-side combined
  * like any aggregate buffer), persist them next to the aggregates,
  * then answer ANY quantile at ANY coarser grouping from the stored
  * sketches alone — the q55 warehouse pattern, for percentiles. At
  * 100 TB that replaces a per-group sort of every value with
  * `k`-bounded state per group, and daily latency/price dashboards
  * re-aggregate kilobytes instead of the fact.
  *
  * Error model (Karnin-Lang-Liberty, arXiv:1603.05346): rank error,
  * not value error — quantile(r) is the exact value at some rank in
  * r ± ε, with ε ≈ 1.65%% at k=200 (99%% confidence, the library's
  * `getNormalizedRankError`). Merging preserves the bound. The q65
  * gate asserts exactly this contract: the sketch value must land
  * between the exact quantiles at rank r ± 2ε.
  */
case class KllSketchAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"graft_kll_sketch k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kll_sketch requires a double input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_kll_sketch"

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = cs.head)
}

/** Rollup merge of STORED KLL sketches (binary column → one merged
  * sketch) — the quantile twin of `hll_union_agg`/[[ThetaUnionAgg]]:
  * fine-grained persisted sketches re-aggregate to any coarser
  * grouping without touching the raw data. */
case class KllMergeAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"graft_kll_merge k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kll_merge requires a binary sketch column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_kll_merge"

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = cs.head)
}

/** Quantile probe of a serialized KLL sketch at a normalized rank —
  * the read side (the [[CmsEstimate]] pattern: a codegen'd scalar
  * expression over stored sketch bytes). Empty sketch → NULL. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantile"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_quantile requires (binary sketch, double rank), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(bytes: Any, rank: Any): Any =
    KllOps.quantile(bytes.asInstanceOf[Array[Byte]], rank.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val q = ctx.freshName("kllQ")
    nullSafeCodeGen(ctx, ev, (b, r) => {
      s"""
         |Double $q = graft.functions.KllOps.quantile($b, $r);
         |if ($q == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $q.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** Static helpers shared by eval and generated code. Wrapping a
  * compact KLL image is a read-only view over the bytes — no copy,
  * no cache needed (the ThetaOps pattern). */
object KllOps {
  def quantile(bytes: Array[Byte], rank: Double): java.lang.Double = {
    require(rank >= 0.0 && rank <= 1.0,
      s"graft_kll_quantile: rank must be in [0,1], got $rank")
    val sk = KllDoublesSketch.wrap(Memory.wrap(bytes))
    if (sk.isEmpty) null
    else java.lang.Double.valueOf(
      sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE))
  }
}

object KllSketchAgg {
  /** Column API: one KLL quantile sketch (binary) of the column per
    * group. */
  def kllSketch(col: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      KllSketchAgg(org.apache.spark.sql.GraftBridge.expr(col), k)
        .toAggregateExpression())

  /** Column API: merge stored sketches (binary) into one. */
  def kllMerge(col: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      KllMergeAgg(org.apache.spark.sql.GraftBridge.expr(col), k)
        .toAggregateExpression())

  /** Column API: quantile of a stored sketch at a normalized rank. */
  def kllQuantile(sketch: Column, rank: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      KllQuantile(
        org.apache.spark.sql.GraftBridge.expr(sketch),
        org.apache.spark.sql.GraftBridge.expr(rank)))
}
