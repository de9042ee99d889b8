package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the step that
  * turns pairwise near-duplicate MATCHES into duplicate CLUSTERS
  * (A~B, B~C ⇒ {A,B,C} even when A and C never matched directly), so
  * a pipeline can keep one canonical document per cluster instead of
  * greedily dropping pair members.
  *
  * Algorithm: the alternating large-star / small-star method of
  * Kiveris et al., "Connected Components in MapReduce and Beyond"
  * (SoCC'14) — the published O(log²)-round formulation, chosen over
  * naive min-label propagation whose round count is the component
  * DIAMETER (a 10M-doc boilerplate chain at 100 TB would need
  * thousands of barriers; this needs tens):
  *
  *  - large-star: every node u links each strictly-larger neighbor of
  *    its symmetric neighborhood to min(Γ(u) ∪ {u});
  *  - small-star: with edges oriented larger→smaller, every node u
  *    links its smaller neighbors and itself to min(N(u) ∪ {u}).
  *
  * Both steps are one groupBy (the per-node neighborhood minimum —
  * partial-aggregated map-side, never a collect_list of neighbors, so
  * a 10M-degree hub costs one long of aggregation buffer) plus one
  * join back on the node id: a constant number of node-id shuffles
  * per round. At the fixpoint the edge set is a star forest — every
  * edge points directly at its component's minimum id, i.e. the edge
  * set IS the labeling.
  *
  * Each round `localCheckpoint`s the new edge set: iterative plans
  * otherwise stack O(rounds) of lineage and Catalyst re-optimizes the
  * whole history every round (on a cluster with a checkpoint dir
  * configured, `checkpoint()` is the durable equivalent).
  *
  * Convergence is detected by exact edge-set equality with the
  * previous round (count + one-sided `exceptAll`, both sides already
  * distinct) — one extra shuffle per round, the same asymptotic cost
  * as the round itself; a checksum compare would be cheaper but
  * admits silent wrong answers on collision.
  */
object ConnectedComponents {

  /** Small-star output orientation: u > v for every emitted edge. */
  private def smallStar(oriented: DataFrame): DataFrame = {
    val mins = oriented.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
    val withMin = oriented.join(mins, "u")
    withMin.select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Large-star over the symmetric closure of `edges`; output edges
    * (v, m) with v > m always. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
    sym.filter(col("v") > col("u"))
      .join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Component labels for every node of `edges` (cols `src`, `dst`,
    * any integral type; self-loops and duplicate edges tolerated).
    * Returns (`node`, `component`) where `component` is the smallest
    * node id in the node's component. */
  def labels(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    // every node of the input, BEFORE self-loops are dropped: a node
    // appearing only as (x, x) still belongs in the output, as its
    // own singleton component
    val allNodes = edges.select(col("src").cast("long").as("node"))
      .union(edges.select(col("dst").cast("long").as("node")))
      .distinct()
    val init = edges
      .select(greatest(col("src"), col("dst")).cast("long").as("u"),
        least(col("src"), col("dst")).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    var cur = init.localCheckpoint(true)
    var converged = cur.isEmpty
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      converged = next.count() == cur.count() && next.exceptAll(cur).isEmpty
      cur = next
      round += 1
    }
    require(converged, s"connected components did not converge in $maxRounds rounds")
    // star forest: non-roots appear on the u side pointing at their
    // root; roots appear only on the v side
    val follow = cur.select(col("u").as("node"), col("v").as("component"))
    val roots = cur.select(col("v").as("node")).distinct()
      .join(follow, Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    // nodes with no surviving edge (self-loop-only) label themselves
    allNodes.join(follow.union(roots), Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }
}
