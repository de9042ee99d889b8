package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Priority-ordered keyed deduplication (SURVEY.md §2.4 U3–U5).
  *
  * The reference relies on pandas row order for `drop_duplicates(keep=
  * 'first'/'last')` (scr/Transform.py:110,346; scr/Extract.py:297). Spark
  * has no stable row order, so the survivor MUST be picked by an explicit
  * priority ordering — `dropDuplicates` alone is nondeterministic. We
  * encode the priority as a window sort and keep row_number()==1.
  *
  * Scale: one hash shuffle on the key columns (same cost as any groupBy);
  * no global sort, no skew beyond key cardinality. At 100 TB, dedup keys
  * (player / game / doc-hash) are high-cardinality → even distribution.
  */
object Dedup {

  private val RN = "__graft_rn"

  /** Keep exactly one row per key, the first under `priority` order.
    * Pass desc(...) columns to express keep-last. Always append a
    * deterministic tiebreaker (e.g. a unique id) if priority may tie.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], priority: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(priority: _*)
    df.withColumn(RN, row_number().over(w)).filter(col(RN) === 1).drop(RN)
  }

  /** Union two sources then keep-first with source priority: rows from
    * `primary` beat rows from `secondary` on the same key — the
    * order-dependent concat+drop_duplicates idiom of
    * scr/Transform.py:104-110, made deterministic.
    * Columns present in only one source are null-padded (U1).
    */
  def unionKeepFirst(primary: DataFrame, secondary: DataFrame,
                     keys: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    val SRC = "__graft_src"
    val all = (primary.columns ++ secondary.columns).distinct
    def pad(df: DataFrame, rank: Int): DataFrame = {
      val padded = all.foldLeft(df)((d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null)))
      padded.select(all.map(col): _*).withColumn(SRC, lit(rank))
    }
    val unioned = pad(primary, 0).unionByName(pad(secondary, 1))
    keepFirst(unioned, keys, col(SRC) +: tiebreak).drop(SRC)
  }
}
