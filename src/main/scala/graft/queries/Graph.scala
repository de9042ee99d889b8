package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond [[graft.ops.ConnectedComponents]]
  * (d07): Pregel-on-DataFrames, the shape GraphX/GraphFrames reduce to
  * on Spark — a persisted edge table plus a small per-node state table
  * that re-aggregates each superstep.
  */
object Graph {

  def defs: Seq[QueryDef] = Seq(q66)

  /** PAGERANK over the customer↔supplier purchase graph — supplier
    * importance from who-buys-from-whom (lineitem ⋈ orders gives
    * customer→supplier edges; symmetrized so rank circulates through
    * the bipartite graph instead of dead-ending at suppliers).
    *
    * FIXED-POINT INTEGER arithmetic (rank in millionths, damping
    * 0.85 as `(85 · x) div 100`, contributions `rank div degree`):
    * float PageRank is not hash-gateable — parallel double summation
    * is order-dependent and engines diverge in the last ulp — while
    * integer PageRank is bit-deterministic in ANY engine, the same
    * trick production MapReduce rankers use. The dangling-mass term
    * is deliberately dropped (every node here has out-edges by
    * construction: the graph is symmetrized).
    *
    * Plan shape at 100 TB (the Pregel cost model): the EDGE table —
    * the big side, |E| ≈ fact size — is built once, pre-partitioned
    * by src, and PERSISTED; each of the 3 supersteps shuffles (a) the
    * |V|-row rank table to the edge partitioning for the join (tiny)
    * and (b) map-side-combined per-partition contribution partials
    * (≤ |V| per partition, not |E|) for the groupBy(dst). The edges
    * themselves never re-shuffle across supersteps — per-iteration
    * shuffle volume is O(|V|), not O(|E|). Iteration count is a
    * constant (3), so the lineage stays bounded — no checkpoint
    * needed; a variable-round version would localCheckpoint per
    * superstep like ConnectedComponents does.
    *
    * Oracle: the same 3 supersteps as chained DuckDB CTEs — integer
    * ops make the twin exact, no within_bound needed. */
  val q66 = QueryDef(
    "q66_pagerank",
    (s, d) => {
      val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      // supplier ids offset into a shared node space (disjoint from
      // customer keys); DISTINCT pairs — multiplicity is q01-style
      // revenue weighting's job, not PageRank's
      // persist the distinct pair-set BEFORE symmetrizing: the union's
      // two branches (forward + reversed) and the degree count would
      // otherwise each rebuild the join+distinct from the base tables
      val cs = Shingles.sharedPersist(
        li.join(orders, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("src"), (col("l_suppkey") + 10000000L).as("dst"))
          .distinct())
      val edges0 = cs.union(cs.select(col("dst").as("src"), col("src").as("dst")))
      val deg = edges0.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      // the persisted superstep input: every edge with its src degree,
      // pre-partitioned by the join key so iterations reuse it as-is
      val edges = Shingles.sharedPersist(
        edges0.join(deg, Seq("src")).repartition(col("src")))
      // |V| rows, read from the CACHED edges — every superstep and the
      // final projection reference it; deriving it from the pre-cache
      // lineage would re-run the whole edge build per reference
      val nodes = Shingles.sharedPersist(
        edges.select(col("src").as("node")).distinct())
      var ranks: DataFrame = nodes.withColumn("r", lit(1000000L))
      for (_ <- 1 to 3) {
        val contrib = edges
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst"), expr("r div deg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("csum"))
        ranks = nodes
          .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            expr("150000L + (85L * coalesce(csum, 0L)) div 100L").as("r"))
      }
      ranks.filter(col("node") >= 10000000L)
        .select((col("node") - 10000000L).as("supplier"), col("r").as("rank_ppm"))
        .orderBy(col("rank_ppm").desc, col("supplier"))
        .limit(20)
    },
    Some("""
      WITH cs AS (
        SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 10000000 AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      edges AS (
        SELECT src, dst FROM cs UNION ALL SELECT dst AS src, src AS dst FROM cs),
      deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
      nodes AS (SELECT src AS node FROM deg),
      r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
      c1 AS (SELECT e.dst, CAST(SUM(r0.r // d.deg) AS BIGINT) AS csum
             FROM edges e JOIN deg d USING (src) JOIN r0 ON r0.node = e.src
             GROUP BY e.dst),
      r1 AS (SELECT n.node, 150000 + (85 * COALESCE(c1.csum, 0)) // 100 AS r
             FROM nodes n LEFT JOIN c1 ON c1.dst = n.node),
      c2 AS (SELECT e.dst, CAST(SUM(r1.r // d.deg) AS BIGINT) AS csum
             FROM edges e JOIN deg d USING (src) JOIN r1 ON r1.node = e.src
             GROUP BY e.dst),
      r2 AS (SELECT n.node, 150000 + (85 * COALESCE(c2.csum, 0)) // 100 AS r
             FROM nodes n LEFT JOIN c2 ON c2.dst = n.node),
      c3 AS (SELECT e.dst, CAST(SUM(r2.r // d.deg) AS BIGINT) AS csum
             FROM edges e JOIN deg d USING (src) JOIN r2 ON r2.node = e.src
             GROUP BY e.dst),
      r3 AS (SELECT n.node, 150000 + (85 * COALESCE(c3.csum, 0)) // 100 AS r
             FROM nodes n LEFT JOIN c3 ON c3.dst = n.node)
      SELECT node - 10000000 AS supplier, r AS rank_ppm
      FROM r3 WHERE node >= 10000000
      ORDER BY rank_ppm DESC, supplier
      LIMIT 20"""))
}
