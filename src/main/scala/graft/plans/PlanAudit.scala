package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Pre-flight plan linting — the engine-wide invariants RegistrySpec
  * enforces over the registered queries, exposed as a library API so a
  * user can gate THEIR pipelines the same way before pointing them at
  * 100 TB: no accidental cartesian products, no all-rows-to-one-partition
  * collapses hiding in a window.
  *
  * Callers audit with AQE disabled (`spark.sql.adaptive.enabled=false`
  * around plan construction): AdaptiveSparkPlanExec hides its inner plan
  * from traversal until execution, which silently blinds any collect()-
  * based check — the vacuity trap RegistrySpec pins with a probe. The
  * helpers return findings rather than throwing, so callers choose
  * between hard gates (fail the job) and soft ones (log and continue).
  */
object PlanAudit {

  /** Physical cartesian products (CartesianProductExec). A crossJoin
    * whose small side broadcasts plans as BroadcastNestedLoopJoin and is
    * NOT flagged — the finding is specifically the both-sides-large
    * corpus×corpus shape that cannot survive scale. */
  def cartesianProducts(df: DataFrame): Seq[SparkPlan] =
    df.queryExecution.executedPlan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }

  /** Unpartitioned window operators — each forces ALL input rows into a
    * single partition (the window's required child distribution is all
    * tuples). Legitimate only over provably bounded frames (dimensions,
    * top-k results, calendar grains); anything fed by a fact table is a
    * scale defect. */
  def singlePartitionWindows(df: DataFrame): Seq[SparkPlan] =
    df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }

  /** One-call gate: throws IllegalStateException when the plan carries
    * either defect. `allowSinglePartitionWindows` is the caller's
    * documented exemption (bounded-frame windows), mirroring
    * RegistrySpec's in-line-justified exemption list. */
  def assertScaleSafe(df: DataFrame,
      allowSinglePartitionWindows: Boolean = false): Unit = {
    val cart = cartesianProducts(df)
    if (cart.nonEmpty) throw new IllegalStateException(
      s"plan contains ${cart.size} cartesian product(s):\n${cart.head}")
    if (!allowSinglePartitionWindows) {
      val w = singlePartitionWindows(df)
      if (w.nonEmpty) throw new IllegalStateException(
        s"plan contains ${w.size} unpartitioned window(s) " +
          s"(single-partition collapse):\n${w.head}")
    }
  }
}
