package graft.queries

import graft.SparkSpec

/** Dev-only family probe: replays the Bench methodology (warmup pass,
  * then cold-cache timed passes in name order) for the graph family
  * only, so cache-sharing changes can be attributed without a full
  * 156-query bench run.
  *   sbt 'set Test/javaOptions ++= Seq("-DgraftGraphProbe=1")' \
  *       'testOnly graft.queries.GraphFamilyProbe'
  */
class GraphFamilyProbe extends SparkSpec {
  if (sys.props.contains("graftGraphProbe")) {
    test("q66 build-vs-superstep attribution") {
      val dir = sys.props.getOrElse("graftProbeDir", "/root/testdata/sf0.1")
      Registry.queries("q66_pagerank")(spark, dir).count() // warmup
      for (pass <- 1 to 2) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val (edges, nodes) = Graph.purchaseGraph(spark, dir)
        val e = edges.count(); val n = nodes.count()
        val t1 = System.nanoTime()
        Registry.queries("q66_pagerank")(spark, dir).count()
        val t2 = System.nanoTime()
        Registry.queries("q75_bfs_hops")(spark, dir).count()
        val t3 = System.nanoTime()
        info(f"pass$pass build(|E|=$e |V|=$n): ${(t1 - t0) / 1e9}%.2f s, " +
          f"q66 post-build: ${(t2 - t1) / 1e9}%.2f s, " +
          f"q75 post-build: ${(t3 - t2) / 1e9}%.2f s")
      }
    }

    test("graph family bench-pass timing") {
      val dir = sys.props.getOrElse("graftProbeDir", "/root/testdata/sf0.1")
      val names = Seq("q66_pagerank", "q75_bfs_hops", "q81_triangle_count")
      names.foreach(n => Registry.queries(n)(spark, dir).count())
      for (pass <- 1 to 2) {
        spark.catalog.clearCache()
        var total = 0.0
        for (n <- names) {
          val t0 = System.nanoTime()
          Registry.queries(n)(spark, dir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          total += dt
          info(f"pass$pass $n: $dt%.2f s")
        }
        info(f"pass$pass family total: $total%.2f s")
      }
    }
  }
}
