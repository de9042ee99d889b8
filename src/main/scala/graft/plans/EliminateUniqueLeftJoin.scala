package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: drop a LEFT OUTER join whose right side contributes
  * no columns above it and is provably unique on its equi-join keys.
  *
  * {{{ Project/Aggregate(refs ⊆ left, Join(left, right, LeftOuter, cond))
  *     →  Project/Aggregate(refs, left) }}}
  *
  * A left join against a right side with at most one row per key value
  * returns every left row exactly once (matched or null-extended), so
  * when nothing above reads the right side's columns the join is pure
  * cost. Trino and DuckDB ship this as "remove redundant left join";
  * Spark's optimizer has no equivalent (EliminateOuterJoin only
  * converts outer→inner under null-rejecting filters). The payoff is
  * the warehouse shape: a wide fact builder left-joins every dimension
  * once (game, captain, team…), then each dashboard query reads 2–3 of
  * them — without this rule every query pays for every dimension
  * subtree (at 100 TB: scans, shuffles and broadcast builds of dims
  * the query never looks at).
  *
  * Soundness: elimination requires BOTH
  *  1. the parent's references are disjoint from `right.output`, and
  *  2. the equi-key conjuncts alone bound right matches to ≤1 per left
  *     row — i.e. `right` is structurally UNIQUE on the key attrs.
  *     Non-equi extra conjuncts only reduce matches further, so they
  *     are ignored (a match may turn into a null-extension; invisible
  *     when no right column survives).
  *
  * Uniqueness is inferred structurally, walking the right subtree:
  *  - `Filter(rn = 1, Window(row_number() OVER (PARTITION BY p …)))`
  *    with p ⊆ keys — the keep-first dedup idiom (ops/Dedup), at most
  *    one row per p-group (the null group included, which is exactly
  *    the ≤1-match guarantee EqualNullSafe needs too);
  *  - a global `row_number()` (empty PARTITION BY) among the keys —
  *    sequential surrogate ids (ops/Ids);
  *  - [[TopKPerKey]] with k = 1 — the same idiom after
  *    [[RewriteRowNumberTopK]] has already rewritten it (rule order
  *    within the batch is not guaranteed, so both spellings match);
  *  - `Aggregate` whose grouping attributes all lie in the keys;
  *  - `Deduplicate` (dropDuplicates) whose dedup keys lie in the keys;
  *  - `Project` (keys remapped through aliases-of-attributes),
  *    `Filter` and column-adding `Window` pass through.
  * Anything else ⇒ not provably unique ⇒ the join stays. The walk
  * never looks through joins or unions: conservative by construction.
  *
  * Registered via [[graft.functions.GraftExtensions]] in the operator-
  * optimization batch, so it interleaves to fixed point with column
  * pruning: pruning narrows the Project above the join until condition
  * 1 holds, then this rule removes the join, then pruning collapses
  * further. (The dim builders now materialize ids via the checkpointed
  * two-phase scan, so THEIR subtrees reach consumers as opaque RDDs —
  * the rule's warehouse payoff is for dims arriving as lazy plans:
  * keep-first windows, dropDuplicates, groupBys, TopKPerKey —
  * EliminateUniqueLeftJoinSpec covers each shape.)
  */
object EliminateUniqueLeftJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p: Project if candidate(p.references, p.child) =>
      p.withNewChildren(Seq(p.child.asInstanceOf[Join].left))
    case a: Aggregate if candidate(a.references, a.child) =>
      a.withNewChildren(Seq(a.child.asInstanceOf[Join].left))
  }

  private def candidate(refs: AttributeSet, child: LogicalPlan): Boolean =
    child match {
      case j: Join =>
        j.joinType == LeftOuter && j.condition.isDefined &&
          refs.intersect(j.right.outputSet).isEmpty && {
            val keys = rightEquiKeys(j)
            keys.nonEmpty && uniqueOn(j.right, keys)
          }
      case _ => false
    }

  /** Right-side attributes equated to a left-side attribute by a
    * top-level conjunct (EqualTo / EqualNullSafe, either order). */
  private def rightEquiKeys(j: Join): AttributeSet = AttributeSet(
    splitConjunctivePredicates(j.condition.get).flatMap {
      case EqualTo(a: Attribute, b: Attribute) => pickRight(j, a, b)
      case EqualNullSafe(a: Attribute, b: Attribute) => pickRight(j, a, b)
      case _ => None
    })

  private def pickRight(j: Join, a: Attribute, b: Attribute): Option[Attribute] =
    if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b)) Some(b)
    else if (j.right.outputSet.contains(a) && j.left.outputSet.contains(b)) Some(a)
    else None

  /** Is `plan` guaranteed to hold at most one row per value of `keys`?
    * (shared with [[PushPartialAggThroughUniqueJoin]], which needs the
    * same structural-uniqueness proof for its dim side) */
  private[plans] def uniqueOn(plan: LogicalPlan, keys: AttributeSet): Boolean =
    plan match {
      case Project(list, child) =>
        // remap keys through the projection; only attribute passthroughs
        // and aliases OF attributes are trackable (an alias of f(x) says
        // nothing about uniqueness of x)
        val mapped = keys.toSeq.map { k =>
          list.collectFirst {
            case a: Attribute if a.exprId == k.exprId => a
            case al @ Alias(c: Attribute, _) if al.exprId == k.exprId => c
          }
        }
        mapped.forall(_.isDefined) && uniqueOn(child, AttributeSet(mapped.flatten))

      case Filter(cond, child) =>
        keepFirstDedup(cond, child, keys) || uniqueOn(child, keys)

      case Window(exprs, partitionSpec, _, child, _) =>
        val globalRowNumber = partitionSpec.isEmpty && exprs.exists {
          case al @ Alias(WindowExpression(RowNumber(), _), _) =>
            keys.contains(al.toAttribute)
          case _ => false
        }
        globalRowNumber ||
          (keys.subsetOf(child.outputSet) && uniqueOn(child, keys))

      case agg: Aggregate =>
        agg.groupingExpressions.nonEmpty && agg.groupingExpressions.forall {
          case a: Attribute => keys.contains(a)
          case _ => false
        }

      case d: Deduplicate => AttributeSet(d.keys).subsetOf(keys)

      // the keep-first idiom AFTER RewriteRowNumberTopK has already
      // rewritten it: k=1 per key-group ⇒ at most one row per key
      case t: TopKPerKey =>
        t.k == 1 && t.keys.nonEmpty && t.keys.forall {
          case a: Attribute => keys.contains(a)
          case _ => false
        }

      case _ => false
    }

  /** `Filter(…rn = 1…, Window(row_number PARTITION BY p))` with
    * p ⊆ keys — ops/Dedup.keepFirst's shape. */
  private def keepFirstDedup(cond: Expression, child: LogicalPlan,
                             keys: AttributeSet): Boolean =
    child match {
      case Window(exprs, partitionSpec, _, _, _) =>
        partitionSpec.nonEmpty &&
          partitionSpec.forall {
            case a: Attribute => keys.contains(a)
            case _ => false
          } &&
          exprs.exists {
            case al @ Alias(WindowExpression(RowNumber(), _), _) =>
              val rn = al.toAttribute
              splitConjunctivePredicates(cond).exists {
                case EqualTo(a: Attribute, Literal(1, _)) => a.semanticEquals(rn)
                case EqualTo(Literal(1, _), a: Attribute) => a.semanticEquals(rn)
                case LessThanOrEqual(a: Attribute, Literal(1, _)) => a.semanticEquals(rn)
                case _ => false
              }
            case _ => false
          }
      case _ => false
    }
}
