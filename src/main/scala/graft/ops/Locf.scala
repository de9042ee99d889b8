package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCALABLE FORWARD-FILL / NEAREST-OBSERVATION lookup (LOCF and its
  * bidirectional generalization) over a LOW-CARDINALITY key — without
  * the per-key window funnel.
  *
  * The textbook form,
  * `last(value, ignoreNulls) OVER (PARTITION BY key ORDER BY ord)`,
  * is correct but partitions the shuffle by `key` alone: with K ≈ 5
  * event types over a 100 TB fact, each reducer sorts corpus/K rows —
  * a straggler the plan gate's single-partition check cannot see
  * (the exchange is hash(key), not SinglePartition, yet 20 TB still
  * funnels through one task). The q40 class, but fixable here because
  * a fill — unlike SCD2's arbitrary-width windows — needs only ONE
  * carried observation across each segment boundary.
  *
  * Mechanism — DETERMINISTIC ord-bucket segmentation:
  *  1. every row gets `gid = floor(ord / W)` — a pure function of the
  *    data (exact long arithmetic, no sampling), so unlike
  *    `repartitionByRange` + `spark_partition_id` (the [[Gaps]]
  *    discipline) there is no boundary nondeterminism to persist
  *    against and NO sampling pre-pass: re-executions of any branch
  *    reproduce identical segments;
  *  2. the within-segment windows partition by (key…, gid) — each
  *     reducer sorts at most one W-wide ord slice, bounded by a
  *     CONSTANT, not by corpus/K;
  *  3. one observation per direction is stitched across segment
  *     seams: a per-(key…, gid) boundary aggregate (map-side
  *     combined, output rows = populated segments, corpus/W-ish) and
  *     an ignoreNulls running window over THAT tiny table, ordered by
  *     gid, partitioned by key — K reducers again, but over boundary
  *     rows, W× smaller than the fact;
  *  4. the carry joins back on (key…, gid). The fact side already
  *     carries the window's hash(key…, gid) partitioning, so the join
  *     reuses it — the fill pays ONE fact exchange total, exactly what
  *     the naive window pays, with P-bounded sorts instead of K-bound.
  *
  * `W` is in ORD UNITS: with dense surrogate ids (the common case —
  * event ids, row numbers, epoch seconds at bounded rates) a segment
  * holds ≤ W rows and the default (2¹⁴) keeps reducer sorts small at
  * any corpus size. A pathologically skewed ord density (billions of
  * rows sharing one ord bucket) wants the sampled-range variant
  * instead — that is [[Gaps]]'s repartitionByRange + persist
  * discipline, deliberately not taken here because every ord column
  * in the registry is dense and the deterministic form needs no
  * persist and no sampling job.
  *
  * LocfSpec proves both entry points row-identical to the naive
  * global-window forms, including segments that are entirely null
  * (the carry hops over them) and leading/trailing null runs.
  */
object Locf {

  /** Fail-fast contract guards (Pack.exclusivePrefixSum discipline):
    * the checkable halves of the documented contract are enforced, not
    * just documented. A non-positive bucketWidth makes gidCol divide
    * by zero / flip segment order silently; a non-integral ord makes
    * the floor-division segmentation meaningless (a double ord would
    * CAST-truncate, silently merging distinct ords into one bucket).
    * Uniqueness of ord per key group is the one contract a guard
    * can't check without a full shuffle — it stays documentation. */
  private def requireContract(df: DataFrame, ord: String, w: Long): Unit = {
    require(w > 0, s"Locf: bucketWidth must be > 0, got $w")
    import org.apache.spark.sql.types._
    val dt = df.schema(ord).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"Locf: ord column '$ord' must be integral (byte/short/int/long), " +
        s"got $dt — floor-division bucketing is exact only on integers")
  }

  /** exact floor(ord / w) on longs (`div` truncates toward zero,
    * which is wrong for negative ords; subtracting the non-negative
    * pmod first leaves an exact multiple, where truncation IS floor —
    * and keeps the arithmetic integral, no double rounding). */
  private def gidCol(ord: String, w: Long): Column =
    expr(s"(CAST(`$ord` AS BIGINT) - pmod(CAST(`$ord` AS BIGINT), ${w}L)) div ${w}L")

  /** Adds `out` = LOCF of `value` within each `keys` group ordered by
    * `ord` (nearest non-null at or before the row). `ord` must be an
    * integral column, unique per key group. */
  def fill(df: DataFrame, keys: Seq[String], ord: String,
           value: String, out: String, bucketWidth: Long = 1L << 14): DataFrame = {
    requireContract(df, ord, bucketWidth)
    val keyCols: Seq[Column] = keys.map(col)
    val seg = df.withColumn("__gid", gidCol(ord, bucketWidth))
    val wIn = Window.partitionBy((keyCols :+ col("__gid")): _*)
      .orderBy(col(ord))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = seg
      .withColumn(out, last(col(value), ignoreNulls = true).over(wIn))
    // boundary table: one row per populated (key…, gid) segment — the
    // segment's latest non-null observation (max ignores nulls, so an
    // all-null segment carries null and the carry window skips it)
    val bounds = seg
      .groupBy((keyCols :+ col("__gid")): _*)
      .agg(max(when(col(value).isNotNull,
        struct(col(ord), col(value).as("v")))).getField("v").as("__b"))
    val wCarry = Window.partitionBy(keyCols: _*).orderBy(col("__gid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bounds
      .withColumn("__carry", last(col("__b"), ignoreNulls = true).over(wCarry))
      .select((keyCols :+ col("__gid")) :+ col("__carry"): _*)
    within
      .join(carry, keys :+ "__gid")
      .withColumn(out, coalesce(col(out), col("__carry")))
      .drop("__gid", "__carry")
  }

  /** BIDIRECTIONAL nearest-non-null lookup — the interpolation
    * primitive ([[graft.queries.Scalars.q85]]): adds four columns per
    * row, the nearest non-null `value` STRICTLY BEFORE (`pv`) and
    * STRICTLY AFTER (`nv`) the row in `ord` order within its `keys`
    * group, plus their positions (`pt`, `nt`). Same segmentation as
    * [[fill]], with a carry in EACH direction: the boundary aggregate
    * keeps each segment's earliest and latest non-null observation;
    * the carry-back window is spelled as a PRECEDING frame under the
    * reversed sort (over the tiny boundary table either spelling is
    * cheap, but the discipline stays uniform with the q85 lesson:
    * UnboundedFollowing frames re-scan per row). Both within-windows
    * share one (key…, gid) exchange — asc and desc sorts over the
    * same clustering, exactly the two-sort shape the naive form pays,
    * now with W-bounded partitions instead of corpus/K. */
  def neighbors(df: DataFrame, keys: Seq[String], ord: String,
                value: String, pv: String = "pv", pt: String = "pt",
                nv: String = "nv", nt: String = "nt",
                bucketWidth: Long = 1L << 14): DataFrame = {
    requireContract(df, ord, bucketWidth)
    val keyCols: Seq[Column] = keys.map(col)
    val seg = df.withColumn("__gid", gidCol(ord, bucketWidth))
    val wB = Window.partitionBy((keyCols :+ col("__gid")): _*)
      .orderBy(col(ord)).rowsBetween(Window.unboundedPreceding, -1)
    val wA = Window.partitionBy((keyCols :+ col("__gid")): _*)
      .orderBy(col(ord).desc).rowsBetween(Window.unboundedPreceding, -1)
    val obsOrd = when(col(value).isNotNull, col(ord))
    val within = seg
      .withColumn(pv, last(col(value), ignoreNulls = true).over(wB))
      .withColumn(pt, last(obsOrd, ignoreNulls = true).over(wB))
      .withColumn(nv, last(col(value), ignoreNulls = true).over(wA))
      .withColumn(nt, last(obsOrd, ignoreNulls = true).over(wA))
    val obs = when(col(value).isNotNull,
      struct(col(ord).as("t"), col(value).as("v")))
    val bounds = seg
      .groupBy((keyCols :+ col("__gid")): _*)
      .agg(max(obs).as("__lastObs"), min(obs).as("__firstObs"))
    val wCin = Window.partitionBy(keyCols: _*).orderBy(col("__gid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCbk = Window.partitionBy(keyCols: _*).orderBy(col("__gid").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bounds
      .withColumn("__cin", last(col("__lastObs"), ignoreNulls = true).over(wCin))
      .withColumn("__cbk", last(col("__firstObs"), ignoreNulls = true).over(wCbk))
      .select((keyCols :+ col("__gid")) ++ Seq(col("__cin"), col("__cbk")): _*)
    within
      .join(carry, keys :+ "__gid")
      .withColumn(pv, coalesce(col(pv), col("__cin.v")))
      .withColumn(pt, coalesce(col(pt), col("__cin.t")))
      .withColumn(nv, coalesce(col(nv), col("__cbk.v")))
      .withColumn(nt, coalesce(col(nt), col("__cbk.t")))
      .drop("__gid", "__cin", "__cbk")
  }
}
