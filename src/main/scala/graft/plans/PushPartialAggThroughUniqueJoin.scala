package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Optimizer rule: EAGER AGGREGATION through a unique-keyed inner join
  * (Yan & Larson, VLDB'95) — push a partial aggregate below the join
  * when the dim side is provably unique on its equi-join keys:
  *
  * {{{ Aggregate(g, aggs(fact cols), Join(fact, dim, Inner, k))
  *     →  Aggregate(g, merge(aggs),
  *          Join(Aggregate(k ∪ (g∩fact), partials, fact), dim, Inner, k)) }}}
  *
  * This is exactly the rewrite `q01_topk_revenue` performs BY HAND
  * ("aggregate pushed below the join — Catalyst has no
  * aggregate-pushdown rule"): the join then carries one row per
  * (key, fact-group) instead of one row per fact row. At 100 TB the
  * difference is the shuffle: lineitem joins orders on 6B rows or on
  * 1.5B pre-aggregated ones.
  *
  * Soundness (why unique matters): with ≤1 dim row per key value, the
  * join multiplies each fact row by 0 or 1 — never duplicates. All
  * fact rows sharing a partial group share the join key, so the join
  * keeps or drops a partial group ATOMICALLY, and partial sums merge
  * to exactly the original totals. Null keys: under EqualTo both
  * plans drop them (no match); under EqualNullSafe the partial null
  * group joins the ≤1 null dim row once, contributing the same merged
  * totals the row-at-a-time matches did. Without uniqueness a dim key
  * matching d rows would multiply individual fact ROWS d times, which
  * a collapsed partial group cannot reproduce — the rule bails.
  *
  * Merge algebra: SUM → SUM of partials (re-cast when the decimal
  * widening differs), MIN/MAX → MIN/MAX of partials, COUNT →
  * coalesce(SUM of partial counts, 0). Pushed aggregates must
  * reference only fact columns, be non-DISTINCT and FILTER-free;
  * grouping expressions must be plain attributes (either side — dim
  * grouping columns are functions of the join key, so grouping the
  * partial by the key preserves them). Anything else ⇒ no rewrite.
  *
  * Guarded by `spark.graft.eagerAgg` (default false): profitability
  * depends on the fact's key-group reduction factor, which the rule
  * cannot see — the caller opts in per query/session (q84 is the
  * registry's opted-in demonstration; the flag also keeps the rule
  * from re-firing on its own output, whose join-left is the partial
  * Aggregate it just built — the structural guard for that is the
  * left-is-Aggregate bail).
  */
object PushPartialAggThroughUniqueJoin
    extends Rule[LogicalPlan] with PredicateHelper {

  val FLAG = "spark.graft.eagerAgg"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!SQLConf.get.getConfString(FLAG, "false").toBoolean) plan
    else force(plan)

  /** The rewrite itself, independent of the session flag — [[q84]]'s
    * registry demonstration applies it explicitly to a single plan so
    * the driver gate exercises the rewritten form without enabling
    * the rule session-wide (a leaked flag would make every other
    * query's plan order-dependent). */
  def force(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case agg @ Aggregate(_, _,
          join @ Join(left, _, Inner, Some(_), _), _)
          if !left.isInstanceOf[Aggregate] =>
        tryRewrite(agg, join).getOrElse(agg)
      // column pruning interleaves in the same fixed-point batch and
      // may have inserted a narrowing Project between the two — an
      // attribute-only Project carries no computation, so the rewrite
      // simply rebuilds without it (pruning re-narrows afterwards)
      case agg @ Aggregate(_, _,
          Project(projList, join @ Join(left, _, Inner, Some(_), _)), _)
          if projList.forall(_.isInstanceOf[Attribute]) &&
            !left.isInstanceOf[Aggregate] =>
        tryRewrite(agg, join).getOrElse(agg)
    }

  private def tryRewrite(agg: Aggregate, join: Join): Option[Aggregate] = {
    val left = join.left
    val right = join.right

    // 1. pure equi condition, (leftKey, rightKey) attribute pairs
    val conjuncts = splitConjunctivePredicates(join.condition.get)
    val pairs = conjuncts.map {
      case EqualTo(a: Attribute, b: Attribute) => side(join, a, b)
      case EqualNullSafe(a: Attribute, b: Attribute) => side(join, a, b)
      case _ => None
    }
    if (pairs.exists(_.isEmpty)) return None
    val (leftKeys, rightKeys) = pairs.flatten.unzip
    if (leftKeys.isEmpty) return None

    // 2. dim side unique on its equi keys
    if (!EliminateUniqueLeftJoin.uniqueOn(right, AttributeSet(rightKeys)))
      return None

    // 3. plain-attribute grouping
    val groupAttrs = agg.groupingExpressions.map {
      case a: Attribute => a
      case _ => return None
    }

    // 4. pushable aggregate calls: non-distinct, unfiltered,
    //    Sum/Min/Max/Count over fact columns only
    val calls = agg.aggregateExpressions
      .flatMap(_.collect { case ae: AggregateExpression => ae })
    if (calls.isEmpty) return None
    if (!calls.forall(ae =>
        !ae.isDistinct && ae.filter.isEmpty &&
          ae.references.subsetOf(left.outputSet) &&
          (ae.aggregateFunction match {
            case _: Sum | _: Min | _: Max | _: Count => true
            case _ => false
          }))) return None

    // partial aggregate over the fact: group by join keys + the
    // grouping attrs the fact contributes
    val partialKeys = (leftKeys ++ groupAttrs.filter(left.outputSet.contains))
      .foldLeft(Seq.empty[Attribute])((acc, a) =>
        if (acc.exists(_.exprId == a.exprId)) acc else acc :+ a)
    val distinctCalls = calls.foldLeft(Seq.empty[AggregateExpression])(
      (acc, ae) => if (acc.exists(_.semanticEquals(ae))) acc else acc :+ ae)
    val partials: Seq[(AggregateExpression, Alias)] = distinctCalls.map { ae =>
      val fn = ae.aggregateFunction match {
        case s: Sum => Sum(s.child)
        case m: Min => Min(m.child)
        case m: Max => Max(m.child)
        case c: Count => Count(c.children)
      }
      ae -> Alias(fn.toAggregateExpression(), "_partial")()
    }
    val partialAgg = Aggregate(partialKeys,
      partialKeys ++ partials.map(_._2), left)
    val newJoin = join.copy(left = partialAgg)

    // merge layer: replace each original call with its merge over the
    // partial column, preserving every output Alias (and exprId)
    val newResults = agg.aggregateExpressions.map { ne =>
      ne.transformUp {
        case ae: AggregateExpression =>
          val pa = partials.find(_._1.semanticEquals(ae)).get._2.toAttribute
          ae.aggregateFunction match {
            case _: Sum =>
              val merged = Sum(pa).toAggregateExpression()
              if (merged.dataType == ae.dataType) merged
              else Cast(merged, ae.dataType)
            case _: Min => Min(pa).toAggregateExpression()
            case _: Max => Max(pa).toAggregateExpression()
            case _: Count =>
              Coalesce(Seq(Sum(pa).toAggregateExpression(), Literal(0L)))
          }
      }.asInstanceOf[NamedExpression]
    }
    Some(Aggregate(agg.groupingExpressions, newResults, newJoin))
  }

  private def side(j: Join, a: Attribute, b: Attribute)
      : Option[(Attribute, Attribute)] =
    if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b))
      Some((a, b))
    else if (j.right.outputSet.contains(a) && j.left.outputSet.contains(b))
      Some((b, a))
    else None
}
