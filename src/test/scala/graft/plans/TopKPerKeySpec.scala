package graft.plans

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {

  private def li = Tables.lineitem(spark, sf)
    .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")

  private val tieSql = "l_orderkey * 10 + l_linenumber"
  private val tie = col("l_orderkey") * 10 + col("l_linenumber")

  test("custom operator == window row_number() top-k per key") {
    val got = TopKPerKey.of(li, Seq("l_suppkey"), "l_extendedprice", tieSql, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, tie)
    val want = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("plan: partial and final TopKPerKeyExec with ONE hash shuffle, no sort") {
    val df = TopKPerKey.of(li, Seq("l_suppkey"), "l_extendedprice", tieSql, k = 3)
    val plan = df.queryExecution.executedPlan.toString
    // (TreeNode renders the exec as "TopKPerKey", stripping the Exec suffix)
    assert(plan.contains("TopKPerKey "), s"plan:\n$plan")
    // partial + final instances
    assert("TopKPerKey \\[".r.findAllIn(plan).length === 2, s"plan:\n$plan")
    assert(plan.contains("hashpartitioning(l_suppkey"), s"plan:\n$plan")
    // the whole point vs the window form: no per-group sort anywhere
    assert(!plan.contains("Sort "), s"plan:\n$plan")
    // cardinality bound: at most k rows per key survive
    val nKeys = li.select("l_suppkey").distinct().count()
    val out = df.count()
    assert(out <= nKeys * 3)
  }

  test("keys with fewer than k rows keep all their rows") {
    import spark.implicits._
    val tiny = Seq((1L, 1L, 1, 10.0), (1L, 2L, 1, 20.0), (2L, 3L, 1, 5.0))
      .toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    val got = TopKPerKey.of(tiny, Seq("l_suppkey"), "l_extendedprice", tieSql, k = 3)
      .collect()
    assert(got.length === 3)
  }
}
