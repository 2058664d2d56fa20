package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class JoinSpec extends SparkSpec {

  private lazy val orders = Tables.orders(spark, sf).cache()
  private lazy val li = Tables.lineitem(spark, sf).cache()
  private lazy val cust = Tables.customer(spark, sf).cache()

  test("dimension joins broadcast (no shuffle of the fact table for dims)") {
    val q = li.join(broadcast(cust.filter(col("c_mktsegment") === "BUILDING")),
      col("l_orderkey") === col("c_custkey")) // key choice irrelevant to plan shape
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }

  test("merge hint pins sort-merge for the fact-fact join") {
    val q = li.hint("merge").join(orders, col("l_orderkey") === col("o_orderkey"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"plan:\n$plan")
  }

  test("semi + anti partition orders by lineitem-match existence") {
    val hot = li.filter(col("l_quantity") >= 49)
    val semi = orders.join(hot, col("o_orderkey") === col("l_orderkey"), "left_semi").count()
    val anti = orders.join(hot, col("o_orderkey") === col("l_orderkey"), "left_anti").count()
    assert(semi + anti === orders.count())
    // semi never duplicates: distinct matched orderkeys == semi count
    val distinctMatched = hot.select("l_orderkey").distinct()
      .join(orders, col("l_orderkey") === col("o_orderkey")).count()
    assert(semi === distinctMatched)
  }

  test("left outer keeps every left row") {
    val joined = orders.join(li.filter(col("l_quantity") >= 49),
      col("o_orderkey") === col("l_orderkey"), "left")
    // every order appears at least once
    assert(joined.select("o_orderkey").distinct().count() === orders.count())
  }

  test("inner join row count equals sum of per-key products") {
    val n = li.join(orders, col("l_orderkey") === col("o_orderkey")).count()
    // orders has unique o_orderkey, so inner join count == lineitems with a
    // matching order
    val matched = li.join(orders.select("o_orderkey").distinct(),
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(n === matched)
  }
}
