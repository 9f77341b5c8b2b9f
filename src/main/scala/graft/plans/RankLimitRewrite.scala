package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo,
  Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber,
  WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the tier-(c) `Rule[LogicalPlan]` extension point,
  * completing the Expression / Rule / Strategy / Extensions quartet): rewrite
  * the DECLARATIVE per-group top-k idiom
  *
  * {{{ Project(cols without rnk,
  *       Filter(rnk <= k,
  *         Window(rnk := row_number() over (partition by g order by o)))) }}}
  *
  * into the native [[TopKPerGroup]] operator, so users who write the
  * standard ranking-window composition get the map-side bounded-heap plan
  * (partial k-heaps → k-bounded shuffle → final merge) instead of a
  * full-data shuffle + per-group sort. Spark's own `InferWindowGroupLimit`
  * attacks the same pattern but must KEEP the Window (and its sort) to
  * produce the rank values; this rule fires only when the rank column is
  * PROJECTED AWAY, which is what licenses eliminating the Window node
  * entirely.
  *
  * Fires only when ALL of:
  *  - the Window computes exactly one expression, a `row_number()`;
  *  - the filter is `rnk <= k`, `rnk < k+1` or `rnk = 1` against an
  *    integer literal, k >= 1;
  *  - the partition spec is non-empty (a global top-k belongs to
  *    `TakeOrderedAndProject`, not this operator);
  *  - the enclosing Project neither references the rank attribute nor
  *    anything outside the Window's child (so the rewrite resolves).
  *
  * Tie semantics: identical to the window form's — `row_number` picks
  * arbitrarily among order-ties and so does the heap; under the library's
  * total-order determinism rule the two plans are row-identical (pinned in
  * TopKNativeSpec against real data).
  *
  * OFF by default behind `spark.graft.rewriteRankLimit`: the library's own
  * registry keeps the window composition (`o3_topk_per_group`) and the
  * explicit native form (`o4_topk_native`) as separately-measured entries,
  * and a silently-flipped plan would invalidate that comparison — opt in
  * per session/cluster.
  *
  * NON-TOTAL-ORDER CAVEAT (on the conf key, r14 advice #5): when the
  * window's ORDER BY is not a total order within a partition (no unique
  * tie-break key), `row_number` already picks arbitrarily among ties — but
  * the heap's arbitrary pick can DIFFER from the window's, so enabling the
  * rewrite may change WHICH tied rows a non-deterministic user query
  * returns (both answers are valid draws of the same nondeterminism).
  * Queries whose order ends in a unique key (the library's own determinism
  * rule for every registered query) are row-identical under either
  * setting; only enable globally if your workload follows that rule.
  */
object RankLimitToTopK extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rewriteRankLimit"

  private def limitFrom(cond: Expression, rank: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
          if a.semanticEquals(rank) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k))
          if a.semanticEquals(rank) => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1))
          if a.semanticEquals(rank) => Some(1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      case p @ Project(projList, Filter(cond,
          Window(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)),
            part, ord, wchild, _))) if part.nonEmpty && ord.nonEmpty =>
        val rank = al.toAttribute
        limitFrom(cond, rank) match {
          case Some(k) if k >= 1 &&
              !projList.exists(_.references.contains(rank)) &&
              projList.forall(_.references.subsetOf(wchild.outputSet)) =>
            // if Spark's InferWindowGroupLimit already ran, its pre-filter
            // node is subsumed by the heap operator — strip it. Only when
            // it is provably weaker-or-equal: same specs, rank function
            // row_number (a rank()-based limit keeps ties and would pass
            // MORE rows than the heap), and its limit l >= k (an l < k
            // node prunes rows the original plan would drop — stripping
            // it would let TopKPerGroup(k) return them). (r14 advice #2)
            val base = wchild match {
              case WindowGroupLimit(p2, o2, _: RowNumber, l, gchild)
                  if p2 == part && o2 == ord && l >= k => gchild
              case other => other
            }
            Project(projList, TopKPerGroup(part, ord, k, base))
          case _ => p
        }
    }
  }
}
