package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed input row for [[DecimalStatsAgg]]: the value arrives ALREADY
  * cast to decimal by Catalyst (`cast(value as decimal(18,6))`) so the
  * JVM-side aggregation never re-implements double→decimal conversion
  * semantics — the one place typed code could silently drift from the
  * engine (and from a SQL oracle). */
case class DecValue(key: String, value: Option[BigDecimal])

/** Exact-decimal moment buffer: count, Σv, Σv². All sums are
  * arbitrary-precision at JVM level and land in the encoder's
  * DECIMAL(38,18) — exact for v of scale 6 (v² has scale 12), so the
  * aggregation is associative and order-independent: partial buffers
  * merge in any order to the identical result. */
case class DecStatsBuf(n: Long, sum: BigDecimal, sumsq: BigDecimal)

/** Finished moments: non-null count plus mean/variance built from the
  * exact sums in ONE deterministic double expression each. Both mean
  * and var_samp are Options — None (SQL NULL) for the empty /
  * singleton group — the portable spelling: SQL `avg` of zero rows is
  * NULL, and a NaN or ±inf here would diverge from any SQL oracle. */
case class DecStats(n_vals: Long, mean: Option[Double], var_samp: Option[Double])

/** `org.apache.spark.sql.expressions.Aggregator` — the TYPED
  * custom-aggregate rung of the ladder (next to the Catalyst-level
  * [[VecSumAgg]]/[[MinHashSigAgg]]): plain Scala case classes and
  * arithmetic, plugged into `KeyValueGroupedDataset.agg` through
  * case-class `Encoder`s, with Tungsten still managing the buffer as
  * an UnsafeRow between reduce/merge calls (SURVEY §2.5 A-family at
  * the Dataset API level).
  *
  * Numeric policy mirrors [[graft.queries.QueryDef.dsum]]: sums stay
  * exact decimals through every reduce/merge; doubles appear only in
  * `finish`, where mean = s/n and var = (ss − s²/n)/(n−1) are spelled
  * in the same operation order as the SQL oracle so both engines run
  * the identical IEEE sequence. At 10^15-row scale the Σv² of
  * scale-12 decimals approaches DECIMAL(38)'s integer headroom — the
  * documented mitigation is dropping value scale to 4 (v² scale 8),
  * not switching to doubles. */
object DecimalStatsAgg extends Aggregator[DecValue, DecStatsBuf, DecStats] {

  override def zero: DecStatsBuf = DecStatsBuf(0L, BigDecimal(0), BigDecimal(0))

  override def reduce(b: DecStatsBuf, a: DecValue): DecStatsBuf = a.value match {
    case Some(v) => DecStatsBuf(b.n + 1, b.sum + v, b.sumsq + v * v)
    case None    => b
  }

  override def merge(x: DecStatsBuf, y: DecStatsBuf): DecStatsBuf =
    DecStatsBuf(x.n + y.n, x.sum + y.sum, x.sumsq + y.sumsq)

  override def finish(b: DecStatsBuf): DecStats = {
    val n = b.n
    if (n == 0) DecStats(0L, None, None)
    else {
      val s = b.sum.toDouble
      val ss = b.sumsq.toDouble
      val mean = s / n
      val v = if (n > 1) Some((ss - s * s / n) / (n - 1)) else None
      DecStats(n, Some(mean), v)
    }
  }

  override def bufferEncoder: Encoder[DecStatsBuf] = Encoders.product[DecStatsBuf]
  override def outputEncoder: Encoder[DecStats] = Encoders.product[DecStats]
}
