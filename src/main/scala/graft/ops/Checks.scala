package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks over warehouse tables — the
  * constraint surface the reference delegates to PostgreSQL DDL
  * (scr/Load.py:67,97,128,160,195 `PRIMARY KEY`; scr/Load.py:244-248
  * composite PK + `FOREIGN KEY ... REFERENCES` on the fact), which a
  * lake-format warehouse must enforce as explicit validation queries:
  * parquet has no constraints, so the load pipeline RUNS the checks
  * and gates the swap ([[Pipeline.mergeSwap]]) on a clean report.
  *
  * Every check is one aggregate or one anti-join — linear, one
  * shuffle, no check reads a table twice. Each returns a one-row
  * `(check_name, violations)` frame so a report is a `unionAll` of
  * independent single-row aggregates (Spark runs the branches as
  * parallel stages; at 100 TB each check is its own scan unless the
  * caller caches the table — by design: checks over different tables
  * have no common subplan to share).
  */
object Checks {

  /** Rows where `key` is duplicated (PRIMARY-KEY uniqueness): number
    * of EXTRA rows beyond the first per key — 0 ⇔ unique. */
  def pkUnique(df: DataFrame, keys: Seq[String], name: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") - 1), lit(0)).cast("long").as("violations"))
      .select(lit(name).as("check_name"), col("violations"))

  /** NULLs in a NOT NULL column. */
  def notNull(df: DataFrame, c: String, name: String): DataFrame =
    df.agg(count(when(col(c).isNull, 1)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"))

  /** Child rows whose `fk` has no match in `parent.pk` (FOREIGN KEY):
    * anti-join count. NULL fks are orphans here by choice — a
    * nullable fk should be filtered by the caller first. The parent
    * key is aliased before the join so fk and pk may share a column
    * name (the common warehouse case) without an ambiguous-reference
    * analysis error. */
  def referential(child: DataFrame, fk: String,
      parent: DataFrame, pk: String, name: String): DataFrame =
    child.select(col(fk))
      .join(parent.select(col(pk).as("__graft_pk")),
        col(fk) === col("__graft_pk"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"))

  /** Values outside the accepted set (dbt `accepted_values`). */
  def acceptedValues(df: DataFrame, c: String, allowed: Seq[String],
      name: String): DataFrame =
    df.agg(count(when(!col(c).isin(allowed: _*) || col(c).isNull, 1))
        .as("violations"))
      .select(lit(name).as("check_name"), col("violations"))

  /** Rows failing an arbitrary boolean invariant (dbt `expression`).
    * NULL predicate counts as a violation (unknown ≠ proven valid). */
  def invariant(df: DataFrame, pred: Column, name: String): DataFrame =
    df.agg(count(when(!coalesce(pred, lit(false)), 1)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"))

  /** One report: all checks unioned, stable order. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty,
      "Checks.report: no checks given (a dynamically-assembled check " +
        "list filtered everything out?)")
    checks.reduce(_.unionAll(_)).orderBy(col("check_name"))
  }

  /** SINGLE-PASS observed metrics (`Dataset.observe`): attach named
    * aggregate metrics that are computed WHILE the frame's next action
    * runs — row counts, violation counts, null tallies piggyback on
    * the write/collect itself, zero extra scans. This is the 100 TB
    * form of [[report]]: the check queries above each re-scan their
    * input (fine for a gate, wrong inside a production load), whereas
    * an observation is free. Returns the instrumented frame plus a
    * callback that yields the metrics row AFTER an action has run. */
  def observed(df: DataFrame, name: String, metrics: Map[String, Column])
      : (DataFrame, () => Map[String, Any]) = {
    require(metrics.nonEmpty, "Checks.observed: no metrics given")
    // Spark's Observation handles the listener plumbing: the metrics
    // are reported on the EXECUTION THAT RUNS (a write wraps the plan
    // in its own QueryExecution, so reading the dataset's own
    // queryExecution would see never-executed defaults). `fetch`
    // blocks until an action on the instrumented frame completes.
    val obs = new org.apache.spark.sql.Observation(name)
    val cols = metrics.toSeq.sortBy(_._1)
    val instrumented = df.observe(obs,
      cols.head._2.as(cols.head._1),
      cols.tail.map { case (n, c) => c.as(n) }: _*)
    (instrumented, () => obs.get)
  }
}
