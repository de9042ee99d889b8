package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Keyed merge ("upsert") semantics of the reference's two sink modes
  * (SURVEY.md §2.1 S9/S10, §2.4 U7/U8), as set-based anti-join merges —
  * the distributed replacement for row-at-a-time `INSERT … ON CONFLICT`
  * (scr/Load.py:79-89 update-wins dims; 276-284 ignore-new facts) and the
  * incremental extract merge (scr/Extract.py:262-303).
  *
  * Both modes are one shuffle (the anti join hashes on the key) + a
  * union; both are idempotent (re-applying the same increment is a
  * no-op) — see UpsertSpec property tests. At scale the anti join is a
  * shuffled hash join on the PK — broadcast the increment side when small.
  */
object Upsert {

  /** New rows win: incoming replaces existing on key match
    * (`ON CONFLICT DO UPDATE`, scr/Load.py:79-89; scr/Extract.py:262-303).
    */
  def updateWins(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    incoming.unionByName(existing.join(incoming, keys, "left_anti"))

  /** Old rows win: incoming inserted only for absent keys
    * (`ON CONFLICT DO NOTHING`, scr/Load.py:276-284).
    */
  def ignoreNew(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(incoming.join(existing, keys, "left_anti"))

  /** Full three-clause MERGE: apply a keyed changeset carrying an
    * `op` column ('I' insert / 'U' update / 'D' delete) plus the
    * target's full schema (payload null-irrelevant for 'D') — the
    * `MERGE INTO … WHEN MATCHED UPDATE / WHEN MATCHED DELETE / WHEN
    * NOT MATCHED INSERT` statement, and the APPLY side of
    * [[SnapshotDiff]]'s change-data feed: applying
    * `diffRows(v1, v2)` to v1 reproduces v2 exactly (spec-pinned
    * round-trip, and the q79 gate).
    *
    * One shuffle shape: target LEFT ANTI changed-keys (hash on the
    * key) ∪ I/U payloads — same cost as [[updateWins]]; 'D' rows
    * simply contribute a key to the anti side and nothing to the
    * union. Idempotent for U/D re-application; re-applying an 'I' of
    * an existing key behaves as an update (last write wins), matching
    * Delta's `whenMatched`-less insert-dedup guidance. */
  def merge(existing: DataFrame, changes: DataFrame, keys: Seq[String]): DataFrame = {
    val opCol = "op"
    require(changes.columns.contains(opCol),
      s"merge: changes must carry an '$opCol' column (I/U/D)")
    val touched = changes.select(keys.map(col): _*).distinct()
    val upserts = changes.filter(col(opCol).isin("I", "U"))
      .select(existing.columns.map(col).toIndexedSeq: _*)
    existing.join(touched, keys, "left_anti").unionByName(upserts)
  }

  /** Bookkeeping counts the reference prints at load time
    * (scr/Load.py:291-302): (inserted, skipped, total).
    */
  def insertStats(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): (Long, Long, Long) = {
    val fresh = incoming.join(existing, keys, "left_anti").count()
    val total = existing.count() + fresh
    (fresh, incoming.count() - fresh, total)
  }
}
