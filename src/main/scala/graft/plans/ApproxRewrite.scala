package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Opt-in optimizer rule: rewrite exact `count(DISTINCT x)` to
  * HyperLogLog++ (`approx_count_distinct`) when the session explicitly
  * asks for it (`spark.graft.approxCountDistinct=true`).
  *
  * Why a `Rule[LogicalPlan]` and not a helper function: the rewrite then
  * applies to EVERY query in the session — ad-hoc SQL, BI layers, views —
  * without touching query text, which is how interactive engines ship
  * "approximate mode" at warehouse scale. Exact distinct-count is the
  * single most shuffle-hungry aggregate (Spark expands it to a two-round
  * aggregation carrying every distinct value); HLL++ carries a fixed
  * ~1.5 KB sketch per group at rsd=0.01 and one aggregation round.
  *
  * Deliberately NOT applied when the Count has a FILTER clause or more
  * than one argument (count(DISTINCT a, b)) — HLL++ takes one child.
  * Result change is bounded by the configured relative standard
  * deviation (`spark.graft.approxCountDistinct.rsd`, default 0.01) and
  * only ever happens behind the explicit flag — default sessions are
  * bit-exact.
  *
  * Deployment: `GraftExtensions` injects it at session build; tests use
  * `spark.experimental.extraOptimizations` on a live session.
  */
object ApproxRewrite extends Rule[LogicalPlan] {

  val FlagKey = "spark.graft.approxCountDistinct"
  val RsdKey = "spark.graft.approxCountDistinct.rsd"

  private def enabled: Boolean =
    SQLConf.get.getConfString(FlagKey, "false").toBoolean
  private def rsd: Double =
    SQLConf.get.getConfString(RsdKey, "0.01").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(
              c: Count, _, true, filter, _)
              if c.children.size == 1 && filter.isEmpty =>
            ae.copy(
              aggregateFunction =
                HyperLogLogPlusPlus(c.children.head, rsd),
              isDistinct = false)
        }
    }
}
