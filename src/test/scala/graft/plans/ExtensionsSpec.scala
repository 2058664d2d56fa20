package graft.plans

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  private def bands(s: SparkSession, n: Int): DataFrame =
    Tables.supplier(s, sf).limit(n).select(
      col("s_suppkey").as("band_id"),
      (col("s_acctbal") * 10).as("lo"),
      (col("s_acctbal") * 10 + 3000).as("hi"))

  private def rangeJoinQuery(s: SparkSession): DataFrame = {
    val points = Tables.lineitem(s, sf).select("l_extendedprice")
    points.join(bands(s, 40),
      col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy("band_id").agg(count(lit(1)).as("n"))
  }

  test("BucketizeRangeJoin rewrites an inequality join into a bucketed equi-join") {
    val baseline = rangeJoinQuery(spark) // un-extended session
    val basePlan = baseline.queryExecution.executedPlan.toString
    assert(basePlan.contains("BroadcastNestedLoopJoin"), s"plan:\n$basePlan")
    val expect = baseline.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ BucketizeRangeJoin
      val rewritten = rangeJoinQuery(spark)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
      assert(plan.contains("__graft_b"), s"plan:\n$plan")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expect, "rewrite changed the result set")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rule is conservative: equi-joins and non-double conditions pass through untouched") {
    val li = Tables.lineitem(spark, sf)
    val orders = Tables.orders(spark, sf)
    val eq = li.join(orders, col("l_orderkey") === col("o_orderkey"))
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ BucketizeRangeJoin
      assert(!eq.queryExecution.optimizedPlan.toString.contains("__graft_b"))
      // long-typed inequality pair: not the double-interval pattern
      val longIneq = li.select(col("l_partkey"))
        .join(orders.select(col("o_orderkey").as("a"), (col("o_orderkey") + 5).as("b")),
          col("l_partkey") >= col("a") && col("l_partkey") < col("b"))
      assert(!longIneq.queryExecution.optimizedPlan.toString.contains("__graft_b"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("extensions wiring: GraftExtensions injects the native function library into SQL") {
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      // no register() call anywhere — resolution must come from injectFunction
      val r = s2.sql(
        """SELECT cosine_native(cast(array(1.0, 0.0) AS ARRAY<FLOAT>),
          |                     cast(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c""".stripMargin)
        .collect()
      assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
      val mh = s2.sql(
        "SELECT minhash_agg(xxhash64(x), 8) AS sig FROM VALUES ('a'), ('b') AS t(x)")
        .collect()
      assert(mh(0).getAs[scala.collection.Seq[Long]]("sig").length === 8)
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("extensions wiring: a session built with GraftExtensions applies the rule") {
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // (spark.sql.extensions is a STATIC conf — honored only at
      // SparkContext creation; on a live context the builder's
      // withExtensions hook is the supported injection point)
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      val plan = rangeJoinQuery(s2).queryExecution.executedPlan.toString
      assert(plan.contains("__graft_b"), s"plan:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}
