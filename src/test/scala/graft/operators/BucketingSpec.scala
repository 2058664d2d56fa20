package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Co-located joins: bucketBy both fact tables on the join key and the
  * sort-merge join needs NO shuffle exchange at query time — the 100 TB
  * pattern for repeated fact-fact joins (pay the partitioning once at
  * write, never per query). */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without shuffle exchanges") {
    val buckets = 8
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // dir persists — clear both so saveAsTable can recreate
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))

    // same answer as the unbucketed join
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() === expected)

    // and the plan moved nothing: both sides read pre-bucketed, so no
    // ShuffleExchange (Exchange hashpartitioning) appears
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"plan:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
  }

  test("salted join equals the plain join exactly (skew mitigation is semantics-free)") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("q"))
    val salted = Joins.saltedJoin(li, o, "l_orderkey", "o_orderkey", salts = 4)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("q"))
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
  }
}
