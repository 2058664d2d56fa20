package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bucketized range join equals the plain inequality join exactly") {
    val bands = Tables.supplier(spark, sf).select(
      col("s_suppkey").as("band_id"),
      (col("s_acctbal") * 10).as("lo"),
      (col("s_acctbal") * 10 + 3000).as("hi"))
    val points = Tables.lineitem(spark, sf).select("l_extendedprice")
    val bucketized = RangeJoin.rangeJoin(points, "l_extendedprice",
      bands, "lo", "hi", bucketWidth = 3000.0)
      .groupBy("band_id").agg(count(lit(1)).as("n"))
    val plain = points.join(bands,
      col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy("band_id").agg(count(lit(1)).as("n"))
    assert(bucketized.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(bucketized).count() === 0)
  }

  test("bucketized plan is a hash equi-join, not a nested loop") {
    val bands = Tables.supplier(spark, sf).select(
      col("s_suppkey").as("band_id"),
      (col("s_acctbal") * 10).as("lo"),
      (col("s_acctbal") * 10 + 3000).as("hi"))
    val points = Tables.lineitem(spark, sf).select("l_extendedprice")
    val plan = RangeJoin.rangeJoin(points, "l_extendedprice",
      bands, "lo", "hi", 3000.0).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), s"plan:\n$plan")
    // and the plain inequality form IS the nested loop we avoid
    val naive = points.join(bands,
      col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin"), s"plan:\n$naive")
  }

  test("boundary semantics: lo inclusive, hi exclusive; degenerate intervals match nothing") {
    import spark.implicits._
    val pts = Seq(10.0, 20.0, 19.999999).toDF("p")
    val iv = Seq((1L, 10.0, 20.0)).toDF("band_id", "lo", "hi")
    val got = RangeJoin.rangeJoin(pts, "p", iv, "lo", "hi", 5.0)
      .select("p").collect().map(_.getDouble(0)).sorted
    assert(got.toSeq === Seq(10.0, 19.999999))
    // empty and inverted intervals contribute no matches (and must not
    // fabricate descending bucket sequences)
    val bad = Seq((2L, 15.0, 15.0), (3L, 30.0, 1.0)).toDF("band_id", "lo", "hi")
    assert(RangeJoin.rangeJoin(pts, "p", bad, "lo", "hi", 5.0).count() === 0)
  }
}
