package graft.queries
import graft.SparkSpec
class AttrProbe extends SparkSpec {
  if (sys.props.contains("graftAttr")) {
    test("attribute q66") {
      val dir = "/root/testdata/sf0.1"
      Registry.queries("q66_pagerank")(spark, dir).count()
      for (pass <- 1 to 2) {
        spark.catalog.clearCache()
        var t0 = System.nanoTime()
        val (edges, nodes) = Graph.purchaseGraph(spark, dir)
        edges.count(); nodes.count()
        info(f"pass$pass build: ${(System.nanoTime()-t0)/1e9}%.2f s")
        t0 = System.nanoTime()
        Registry.queries("q66_pagerank")(spark, dir).count()
        info(f"pass$pass q66 rides: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
  }
}
