package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous window top-k idiom
  *
  *   SELECT <cols> FROM (
  *     SELECT *, row_number() OVER (PARTITION BY k ORDER BY o) AS rn ...)
  *   WHERE rn <= n          -- rn then dropped by the projection
  *
  * into the bounded-heap [[TopKPerKey]] operator. The window formulation
  * shuffles EVERY row and fully sorts every key group to keep n of them;
  * the rewrite's physical plan reduces each map partition to <= n rows per
  * key before the exchange and never sorts a full group — at 100 TB the
  * difference between a full-fact-table sort and a bounded heap scan.
  *
  * Fires only when provably safe:
  *  - single row_number window expression; PARTITION BY may be EMPTY —
  *    that is the GLOBAL top-k, where the window formulation is a
  *    single-partition full sort and the bounded heap matters most.
  *    (Spark 4's EliminateWindowPartitions folds constant partition
  *    expressions to an empty spec, so a per-constant-group window —
  *    e.g. a whole-corpus bottom-k sample — lands here too.)
  *  - the filter is `rn <= lit` / `rn < lit` (and nothing else) on the
  *    window's own rank attribute;
  *  - a projection ABOVE the filter drops the rank column and references
  *    only the window child's output (rank never escapes, so not emitting
  *    it is invisible);
  *  - row-order among rank ties is arbitrary in BOTH formulations, so tie
  *    behavior is unchanged.
  *
  * Registered via [[TopKRewrite.install]] (experimental.extraOptimizations)
  * or `spark.sql.extensions=graft.plans.GraftExtensions`; the companion
  * [[TopKPerKeyStrategy]] must also be installed to plan the logical node.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(n)) if a.semanticEquals(rank) => Some(n)
    case LessThan(a: Attribute, IntegerLiteral(n)) if a.semanticEquals(rank) => Some(n - 1)
    case GreaterThanOrEqual(IntegerLiteral(n), a: Attribute) if a.semanticEquals(rank) => Some(n)
    case GreaterThan(IntegerLiteral(n), a: Attribute) if a.semanticEquals(rank) => Some(n - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, Filter(cond, w: Window))
        if w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(_, orderSpec, _)), _) if orderSpec.nonEmpty =>
          val rank = alias.toAttribute
          // Spark's own InferWindowGroupLimit may already have slotted a
          // WindowGroupLimit under the Window; TopKPerKey subsumes it
          // (bounded heap, no sort at all), so strip it.
          val source = w.child match {
            case wgl: WindowGroupLimit => wgl.child
            case other => other
          }
          limitOf(cond, rank) match {
            case Some(k) if k >= 1 &&
                projectList.forall(_.references.subsetOf(source.outputSet)) =>
              Project(projectList, TopKPerKey(k, w.partitionSpec, orderSpec, source))
            case _ => p
          }
        case _ => p
      }
  }
}

object TopKRewrite {
  /** Install rule + strategy once per session (idempotent). */
  def install(spark: SparkSession): Unit = {
    TopKPerKey.install(spark)
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(TopKRewriteRule)) {
      spark.experimental.extraOptimizations = cur :+ TopKRewriteRule
    }
  }
}
