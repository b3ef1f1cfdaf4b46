package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Minimal accessor for the `private[sql]` Column↔Expression bridge —
  * needed to expose custom Catalyst expressions (e.g. graft.functions.
  * NanProduct) as user-facing Columns on Spark 4's split API. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Every node of an EXECUTED physical plan, descending through the
    * wrappers that `TreeNode.collect` cannot see past — the AQE nodes
    * (`AdaptiveSparkPlanExec` / `QueryStageExec` are leaf nodes whose
    * real subtrees hang off non-child fields) and `ReusedExchangeExec`
    * (also a leaf; the reused exchange's actual subtree hangs off its
    * `child` field, and a walker that skips it would falsely pass a
    * plan-shape assertion when the offending exchange hides behind
    * exchange reuse). Call after an action so the adaptive root carries
    * its final plan — plan-shape specs use this to assert exchange
    * placement under AQE ON, the configuration production queries
    * actually run with. */
  def allExecutedNodes(p: SparkPlan): Seq[SparkPlan] = {
    val extra = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Seq.empty
    }
    p +: (p.children ++ extra).flatMap(allExecutedNodes)
  }
}
