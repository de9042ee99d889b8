package graft.queries

import graft.SparkSpec

/** Dev-only: dump formatted plans for headline queries
  * (-DgraftPlans=q01_topk_revenue,q18_region_dashboard). */
class PlanDump extends SparkSpec {
  private val names = sys.props.getOrElse("graftPlans", "")
  if (names.nonEmpty) {
    test("dump plans") {
      names.split(",").foreach { n =>
        val df = Registry.queries(n.trim)(spark, sfDir)
        info(s"==== ${n.trim} ====")
        df.queryExecution.executedPlan.toString.linesIterator.take(40)
          .foreach(l => info(l))
      }
    }
  }
}
