package graft.queries

/** All engine capabilities, in one list. SparkEntry derives the driver
  * maps from this; ScalaTest iterates it for smoke coverage. */
object Registry {
  def all: Seq[QueryDef] =
    Relational.defs ++ Scalars.defs ++ TextOps.defs ++ Curation.defs ++
      Similarity.defs ++ Multimodal.defs ++ Streaming.defs ++ StarGate.defs ++
      Graph.defs

  def queries = all.map(q => q.name -> q.build).toMap
  def oracles = all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap

  /** Shipping shapes — what the headline bench measures. */
  def production: Seq[QueryDef] = all.filterNot(_.oracleOnly)

  /** Complete-mode finite-replay oracle twins (see [[QueryDef]]):
    * correctness-gate machinery for the graduated Append forms.
    * Verify runs them (they ARE the gate); Bench measures them under
    * a separate artifact (SPARK_GRAFT_BENCH_TWINS). */
  def oracleTwins: Seq[QueryDef] = all.filter(_.oracleOnly)
}
