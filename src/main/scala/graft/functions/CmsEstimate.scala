package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized count-min sketch for a long item's estimated
  * count — the READ side Spark's SQL surface is missing: the built-in
  * `count_min_sketch(col, eps, conf, seed)` aggregate produces the
  * sketch binary, but no built-in can query it, so the pair
  * (aggregate, this) completes the heavy-hitters loop (q60) the same
  * way `hll_sketch_agg`/`hll_sketch_estimate` pair up for HLL (q55).
  *
  * CMS point-query guarantees (Cormode & Muthukrishnan 2005): the
  * estimate NEVER underestimates (every row of the depth×width grid
  * counts the item plus colliding keys; the min over rows is ≥ the
  * true count), and overestimates by more than ε·N with probability
  * ≤ δ — so a gate query can hash-compare `est ≥ exact AND
  * est ≤ exact + ε·N` as a deterministic boolean while the raw
  * estimate stays approximate.
  *
  * Execution shape: deserializing ~100 KB of sketch per probed row
  * would swamp the probe, so [[CmsEstimate.estimate]] keeps a
  * per-thread one-entry cache (identity check, then byte-equality) —
  * the expected use probes ONE broadcast sketch for a handful of
  * candidate keys, giving one deserialization per task. Codegen calls
  * the same static helper, so the expression stays inside
  * whole-stage-generated code.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_estimate requires (binary sketch, bigint item), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(sketch: Any, item: Any): Any =
    CmsEstimate.estimate(sketch.asInstanceOf[Array[Byte]],
      item.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, it) =>
      s"${ev.value} = graft.functions.CmsEstimate.estimate($sk, $it);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  private final class Cache {
    var bytes: Array[Byte] = _
    var sketch: CountMinSketch = _
  }
  private val cache = ThreadLocal.withInitial[Cache](() => new Cache)

  /** Static entry shared by eval and generated code. One-slot
    * per-thread memo: a hit costs one byte-compare (each UnsafeRow
    * getBinary is a fresh copy, so reference identity never recurs),
    * still ~1000× cheaper than re-deserializing ~100 KB of sketch.
    * The cache stores its OWN copy of the key bytes: a non-copying
    * reader that reuses/mutates the caller's buffer can therefore
    * never make a stale sketch byte-compare as current. */
  def estimate(sketchBytes: Array[Byte], item: Long): Long = {
    val c = cache.get()
    if (!java.util.Arrays.equals(c.bytes, sketchBytes)) {
      c.sketch = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(sketchBytes))
      c.bytes = sketchBytes.clone()
    }
    c.sketch.estimateCount(java.lang.Long.valueOf(item))
  }
}
