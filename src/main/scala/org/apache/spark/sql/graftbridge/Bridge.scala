package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Minimal accessor for the `private[sql]` Column↔Expression bridge —
  * needed to expose custom Catalyst expressions (e.g. graft.functions.
  * NanProduct) as user-facing Columns on Spark 4's split API. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Every node of an EXECUTED physical plan, descending through the
    * AQE wrappers that `TreeNode.collect` cannot see past (both
    * `AdaptiveSparkPlanExec` and `QueryStageExec` are leaf nodes whose
    * real subtrees hang off non-child fields). Call after an action so
    * the adaptive root carries its final plan — plan-shape specs use
    * this to assert exchange placement under AQE ON, the configuration
    * production queries actually run with. */
  def allExecutedNodes(p: SparkPlan): Seq[SparkPlan] = {
    val extra = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => Seq.empty
    }
    p +: (p.children ++ extra).flatMap(allExecutedNodes)
  }
}
