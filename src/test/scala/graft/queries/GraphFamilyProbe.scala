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
