package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (brief ladder (c), the `Rule[LogicalPlan]` rung):
  * rewrites the ubiquitous per-key top-k idiom
  *
  * {{{ Project(out, Filter(rn <= k, Window(row_number over (P, O)))) }}}
  *
  * into the [[TopKPerKey]] logical operator whenever the rank column
  * is dropped by the enclosing Project — i.e. the query wants the top
  * rows, not the rank itself. The window formulation shuffles on P and
  * then SORTS every partition before filtering; [[TopKPerKeyExec]]
  * keeps a k-bounded heap per key instead (O(n log k), no sort, no
  * full materialization) — at 100 TB the difference between sorting a
  * partition and streaming it.
  *
  * Semantics: identical row set when O is a total order. When O has
  * ties at the k boundary, `row_number` itself returns an arbitrary
  * valid subset — the heap returns another equally valid one, the same
  * contract Spark's own global `TakeOrderedAndProject` has under ties.
  *
  * Guards (rewrite only fires when ALL hold):
  *  - the Window has a non-empty PARTITION BY (the global top-k shape
  *    `row_number() OVER (ORDER BY …)` is left to Spark, whose
  *    Limit/TakeOrderedAndProject path already handles it — and
  *    `ClusteredDistribution(Nil)` is illegal at planning time);
  *  - the Window computes exactly one expression: `row_number()`;
  *  - the Filter tests only that rank: `rn <= k`, `rn < k`, or
  *    `rn = 1` (commuted literal forms included), with k a foldable
  *    positive integer;
  *  - the Project drops the rank attribute (no other use above).
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule` + `injectPlannerStrategy`) — the
  * `spark.sql.extensions` deployment path — or per-session through
  * `spark.experimental.extraOptimizations`/`extraStrategies`.
  */
object RewriteRowNumberTopK extends Rule[LogicalPlan] {

  /** k from a supported rank predicate, if `cond` is one over `rn`. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = {
    def lit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case _ => None
    }
    cond match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) => lit(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case EqualTo(a: Attribute, l) if a.semanticEquals(rn) && lit(l).contains(1) => Some(1)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) => lit(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case EqualTo(l, a: Attribute) if a.semanticEquals(rn) && lit(l).contains(1) => Some(1)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
        Filter(cond,
          Window(Seq(al @ Alias(WindowExpression(RowNumber(), _), _)),
            partitionSpec, orderSpec, child, _)))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty &&
          limitOf(cond, al.toAttribute).exists(_ > 0) &&
          !projList.exists(_.references.contains(al.toAttribute)) &&
          projList.forall(e => e.references.subsetOf(child.outputSet)) =>
      val k = limitOf(cond, al.toAttribute).get
      // Spark's own InferWindowGroupLimit may already have inserted a
      // (sort-based) WindowGroupLimit below the Window for the same
      // rank predicate — the heap subsumes it, so unwrap it rather
      // than sorting each partition twice
      val source = child match {
        case wgl: WindowGroupLimit
            if wgl.partitionSpec == partitionSpec &&
              wgl.orderSpec == orderSpec && wgl.limit >= k => wgl.child
        case other => other
      }
      Project(projList, TopKPerKey(partitionSpec, orderSpec, k, source))
  }
}
