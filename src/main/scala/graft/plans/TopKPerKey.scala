package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k rows per key as a FIRST-CLASS physical operator — the full custom
  * tier (SURVEY §4.3 path (c)): logical node + planner strategy +
  * SparkPlan, registered through [[GraftExtensions]].
  *
  * The built-in way to get "top k per key" is a ranking window: shuffle on
  * the key, SORT every group completely, number rows, filter — the sort
  * dominates when groups are large and k is small. This operator keeps a
  * bounded k-heap per key instead: a PARTIAL pass over raw input partitions
  * (map-side, like a partial aggregate — at most k rows per key per
  * partition survive), then a hash shuffle on the key (Spark inserts it to
  * satisfy `requiredChildDistribution`), then a FINAL pass merging the
  * survivors. No group is ever fully sorted; per-task memory is
  * O(keys_in_task × k).
  *
  * Ordering is (value DESC, tie ASC) with an explicit integer tie-breaker,
  * so results are deterministic and cross-engine comparable (the oracle
  * mirrors it with row_number()).
  */
final case class TopKPerKeyNode(
    keys: Seq[Expression], value: Expression, tie: Expression, k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, value, tie, k, child) =>
      val partial = TopKPerKeyExec(keys, value, tie, k, partial = true,
        planLater(child))
      TopKPerKeyExec(keys, value, tie, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    keys: Seq[Expression], value: Expression, tie: Expression, k: Int,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExprs = Seq(value, tie)
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordProj = UnsafeProjection.create(ordExprs, childOutput)
      // per key: bounded worst-first heap of (value, tie, row) — the head
      // is the weakest survivor, evicted on a better arrival
      val heapOrd = Ordering.by[(Double, Long, UnsafeRow), (Double, Long)] {
        case (v, t, _) => (-v, t)
      } // min of this ordering = smallest value / largest tie = weakest
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[(Double, Long, UnsafeRow)]]
      it.foreach { row =>
        val ord = ordProj(row)
        val v = ord.getDouble(0)
        val t = ord.getLong(1)
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          scala.collection.mutable.PriorityQueue.empty(heapOrd))
        if (heap.size < limit) {
          heap.enqueue((v, t, row.asInstanceOf[UnsafeRow].copy()))
        } else {
          val (wv, wt, _) = heap.head
          if (v > wv || (v == wv && t < wt)) {
            heap.dequeue()
            heap.enqueue((v, t, row.asInstanceOf[UnsafeRow].copy()))
          }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3))
    }
  }
}

object TopKPerKey {
  /** Top-`k` rows of `df` per `keyCols` group, greatest `value` first with
    * `tie` (ascending long) breaking equal values deterministically.
    * `value`/`tie` are SQL expression strings over `df`'s columns. */
  def of(df: DataFrame, keyCols: Seq[String], value: String, tie: String,
      k: Int): DataFrame = {
    // make the strategy available on sessions not built with
    // GraftExtensions (same pattern as CosineNative.register)
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.contains(TopKPerKeyStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKPerKeyStrategy
    val analyzed = df.queryExecution.analyzed
    val resolve = analyzed.output.map(a => a.name -> a).toMap
    val keyExprs: Seq[Expression] = keyCols.map(resolve(_))
    import org.apache.spark.sql.graftbridge.Bridge
    // pin the exec's assumed ordering types (value: double, tie: long);
    // the analyzer re-runs over this plan and resolves the casts
    Bridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keyExprs,
        org.apache.spark.sql.catalyst.expressions.Cast(
          bindToPlan(Bridge.parseExpression(df.sparkSession, value), analyzed),
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.catalyst.expressions.Cast(
          bindToPlan(Bridge.parseExpression(df.sparkSession, tie), analyzed),
          org.apache.spark.sql.types.LongType),
        k, analyzed))
  }

  /** TOP2: top-3 lineitems per supplier by price — the custom-operator
    * twin of the window row_number() pattern. Tie-break is the exact
    * integer (orderkey*10 + linenumber), mirrored in the oracle, and the
    * input is pre-projected (a custom node is a pruning barrier). */
  val defs: Seq[graft.QueryDef] = Seq(
    graft.QueryDef("top2_topk_per_key",
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |         row_number() OVER (PARTITION BY l_suppkey
        |           ORDER BY l_extendedprice DESC, l_orderkey * 10 + l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3
        |ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey * 10 + l_linenumber
        |LIMIT 2000""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val li = graft.sources.Tables.lineitem(s, dir)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      of(li, Seq("l_suppkey"), "l_extendedprice",
        "l_orderkey * 10 + l_linenumber", k = 3)
        .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
          col("l_orderkey") * 10 + col("l_linenumber"))
        .limit(2000)
    }
  )

  /** Resolve UnresolvedAttributes inside a Column expression against the
    * child plan's output (the Column came from the same DataFrame, so
    * name-based resolution is well-defined). */
  private def bindToPlan(e: Expression, plan: LogicalPlan): Expression = {
    val byName = plan.output.map(a => a.name -> a).toMap
    e.transform {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        byName(u.name)
    }
  }
}
