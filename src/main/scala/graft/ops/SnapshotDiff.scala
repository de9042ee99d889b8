package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style snapshot diff: classify every key of two versions of a
  * keyed table as inserted / updated / deleted. The audit primitive
  * behind incremental pipelines (reference scr/Extract.py:222-303
  * merges snapshots but never reports what changed) and the cheap
  * way to turn full re-extracts into deltas for downstream upserts
  * ([[Upsert]]).
  *
  * Plan shape: ONE full-outer shuffle join on the key — both sides
  * hash-partition by key, no broadcast (both snapshots scale with the
  * data). Non-key columns are compared as a single struct with
  * null-safe equality (`<=>`), which Catalyst evaluates field-wise
  * without materializing a comparison column per attribute — O(1)
  * expressions regardless of schema width.
  */
object SnapshotDiff {

  /** Changed keys between `old` and `neu` (identical schemas):
    * (key columns, `op` ∈ 'I' | 'U' | 'D'). Unchanged keys are not
    * returned. */
  def diff(old: DataFrame, neu: DataFrame, keys: Seq[String]): DataFrame = {
    val nonKey = old.columns.filterNot(keys.contains)
    require(neu.columns.sameElements(old.columns),
      s"snapshot schemas differ: ${old.columns.mkString(",")} vs ${neu.columns.mkString(",")}")
    val o = old.select(keys.map(col) :+ struct(nonKey.map(col): _*).as("_old"): _*)
    val n = neu.select(keys.map(col) :+ struct(nonKey.map(col): _*).as("_new"): _*)
    o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("_old").isNull, lit("I"))
          .when(col("_new").isNull, lit("D"))
          .when(!(col("_old") <=> col("_new")), lit("U")))
      .filter(col("op").isNotNull)
      .select(keys.map(col) :+ col("op"): _*)
  }

  /** [[diff]] with the PAYLOAD: same keyed I/U/D classification, plus
    * the NEW-side non-key columns (null for 'D', whose payload no
    * longer exists) — the full change-data-feed row an
    * [[Upsert.merge]] can apply: `merge(old, diffRows(old, neu,
    * keys), keys)` reproduces `neu` exactly (spec-pinned round-trip).
    * Identical plan shape to [[diff]]: ONE full-outer key join, the
    * non-key width compared as a single struct. */
  def diffRows(old: DataFrame, neu: DataFrame, keys: Seq[String]): DataFrame = {
    val nonKey = old.columns.filterNot(keys.contains)
    require(neu.columns.sameElements(old.columns),
      s"snapshot schemas differ: ${old.columns.mkString(",")} vs ${neu.columns.mkString(",")}")
    val o = old.select(keys.map(col) :+ struct(nonKey.map(col): _*).as("_old"): _*)
    val n = neu.select(keys.map(col) :+ struct(nonKey.map(col): _*).as("_new"): _*)
    o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("_old").isNull, lit("I"))
          .when(col("_new").isNull, lit("D"))
          .when(!(col("_old") <=> col("_new")), lit("U")))
      .filter(col("op").isNotNull)
      .select(keys.map(col) ++ Seq(col("op")) ++
        nonKey.map(c => col(s"_new.$c").as(c)): _*)
  }
}
