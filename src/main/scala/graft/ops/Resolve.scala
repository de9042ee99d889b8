package graft.ops

import org.apache.spark.sql.DataFrame

/** Logical-name column resolution (SURVEY.md §2.2 P2) — the reference's
  * `_get_column(df, level0, level1, single_name)` shim
  * (scr/Transform.py:25-66) that survives FBref header-format drift:
  * a logical column may surface as a flattened two-level name
  * ("Performance_Gls"), the bare leaf ("Gls"), or a renamed single
  * ("goals"). Resolution is case-insensitive and happens BEFORE the
  * plan is built — plain Scala over df.columns, zero Catalyst cost.
  */
object Resolve {

  /** Resolve a logical (level0, level1) pair or a single name against
    * the actual columns. Priority mirrors the reference:
    *  1. exact flattened "level0_level1"
    *  2. bare "level1" (header was single-level after all)
    *  3. `single` fallback name
    * Matching is case-insensitive; the returned name is the real
    * column (original case) usable in select/col.
    */
  def column(df: DataFrame, level0: String, level1: String, single: String): Option[String] = {
    val lower = df.columns.map(c => c.toLowerCase -> c).toMap
    lower.get(s"${level0}_$level1".toLowerCase)
      .orElse(lower.get(level1.toLowerCase))
      .orElse(lower.get(single.toLowerCase))
  }

  /** Resolve many logical columns at once; missing ones reported
    * together (the reference raises per-column, we batch). */
  def columns(df: DataFrame, specs: Seq[(String, String, String)]): Either[Seq[String], Seq[String]] = {
    val resolved = specs.map { case (l0, l1, s) => (s"${l0}_$l1", column(df, l0, l1, s)) }
    val missing = resolved.collect { case (logical, None) => logical }
    if (missing.nonEmpty) Left(missing) else Right(resolved.flatMap(_._2))
  }
}
