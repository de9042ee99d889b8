package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) key: bit-interleave two 16-bit cell coordinates
  * into one long, so that sorting by the key clusters rows that are
  * close in BOTH dimensions — the multi-dimensional data-layout
  * primitive behind Delta `OPTIMIZE ZORDER BY` / Hudi clustering.
  *
  * WHY a layout op belongs in the engine: at 100 TB a scan is won or
  * lost before execution, at the file-skipping level. Min/max file
  * statistics prune on ONE sort dimension only; a linear sort on
  * (a, b) leaves b's per-file ranges as wide as the whole domain, so
  * predicates on b skip nothing. Interleaving the bits gives every
  * contiguous key range a bounded rectangle in (a, b) space — both
  * dimensions' per-file min/max stay tight, and a 2-d predicate
  * prunes most files (q62 measures exactly this: per-bucket
  * rectangles and the fraction a probe predicate can skip).
  *
  * The expression is pure long bit-math (5 shift/mask rounds per
  * dimension — Morton's classic parallel-prefix spread), evaluated
  * via a static helper from both interpreted and generated code, so
  * it stays inside whole-stage codegen in the write path where it
  * would run per-row over the full table.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder requires (bigint, bigint) cell coordinates, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKey.interleave16(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrderKey.interleave16($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {

  /** Spread the low 16 bits of v into the even bit positions of a
    * 32-bit value (0b...abcd → 0b...0a0b0c0d). */
  def spread16(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** Morton interleave: x's bits land on even positions, y's on odd.
    * Inputs are masked to 16 bits; the result fits in 32 bits, so
    * callers can shift-right to form coarser z-space cells. Static so
    * generated code calls it directly. */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** Column API. */
  def zorder(x: Column, y: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      ZOrderKey(
        org.apache.spark.sql.GraftBridge.expr(x),
        org.apache.spark.sql.GraftBridge.expr(y)))
}
