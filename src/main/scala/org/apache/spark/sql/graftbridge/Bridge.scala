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

  /** Registered shuffle ids (the map-output tracker's live set). */
  def shuffleIds(sc: org.apache.spark.SparkContext): Set[Int] =
    org.apache.spark.SparkEnv.get.mapOutputTracker
      .asInstanceOf[org.apache.spark.MapOutputTrackerMaster]
      .shuffleStatuses.keySet.toSet

  /** Eagerly unregister + delete the given shuffles' map outputs and
    * files — the disk-reclaim lever for BLOCK-MATERIALIZED frames whose
    * plan lineage pins their build shuffles' `ShuffleDependency`s
    * forever (the GC-driven `ContextCleaner` can never fire on a
    * referenced dependency, so a pinned cache's feeder shuffles occupy
    * disk for the cache's whole lifetime). Safe in the lineage sense: a
    * later recompute (cache-block loss) hits `FetchFailed` and Spark
    * resubmits the parent map stages from the surviving lineage — the
    * cost is re-execution, never wrong data. Callers own the
    * concurrency contract (don't reclaim ids a concurrently-running
    * query still reads — snapshot-diff around your own materialization
    * to target only your shuffles). */
  def cleanupShuffles(sc: org.apache.spark.SparkContext,
      ids: Set[Int]): Unit =
    sc.cleaner.foreach(cl => ids.foreach(cl.doCleanupShuffle(_, blocking = true)))

  /** Eager localCheckpoint that RETURNS the materialized row count from
    * the materializing job itself. `Dataset.localCheckpoint(eager=true)`
    * followed by `.count()` costs TWO driver jobs — the count re-reads
    * the blocks the checkpoint just wrote — and at gate scale every job
    * is ~25-40 ms of pure scheduling. This mirrors
    * `classic.Dataset.checkpoint(eager=true, reliableCheckpoint=false,
    * storageLevel=None)` exactly: same executed-plan RDD, same
    * `RDD.localCheckpoint()` default storage level, same lineage
    * truncation (the count() job materializes the marked RDD and
    * `runJob` fires `doCheckpoint()` at job end, as the in-box eager
    * path does), same `LogicalRDD.fromDataset` wrapper — but the ONE
    * materializing job also returns the row count, so driver-OOM guards
    * keyed on the count (e.g. the minhash screen's size-conditional
    * broadcast) keep their exact semantics with one fewer job. */
  def localCheckpointWithCount(df: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, Long) = {
    val ds = df.asInstanceOf[
      org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val internalRdd = ds.queryExecution.executedPlan.execute().map(_.copy())
    internalRdd.localCheckpoint()
    val n = internalRdd.count()
    (org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(internalRdd, ds,
        isStreaming = false)), n)
  }

  /** Drop one cached RDD block out of the block manager — the
    * fault-injection hook for the reclaim specs (a cache-block loss is
    * the failure mode `cleanupShuffles`' lineage-safety claim is about,
    * so the spec must be able to CAUSE one rather than argue about it). */
  def removeCachedBlock(sc: org.apache.spark.SparkContext,
      rddId: Int, partition: Int): Unit =
    org.apache.spark.SparkEnv.get.blockManager.master
      .removeBlock(org.apache.spark.storage.RDDBlockId(rddId, partition))
}
