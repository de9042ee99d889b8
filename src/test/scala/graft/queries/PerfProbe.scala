package graft.queries

import graft.SparkSpec

/** Dev-only micro-probe (not part of CI semantics): times a single
  * registry query at an arbitrary sf dir via
  *   sbt 'testOnly graft.queries.PerfProbe' -DgraftProbe=d03_minhash_lsh
  */
class PerfProbe extends SparkSpec {
  private val name = sys.props.getOrElse("graftProbe", "")
  if (name.nonEmpty) {
    test(s"probe $name") {
      val dir = sys.props.getOrElse("graftProbeDir", "/root/testdata/sf0.1")
      val fn = Registry.queries(name)
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        info(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      }
    }
  }
}
