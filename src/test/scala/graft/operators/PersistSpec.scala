package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class PersistSpec extends SparkSpec {

  test("cache reuse: second pass reads InMemoryRelation and results are cache-invariant") {
    val li = Tables.lineitem(spark, sf).cache()
    try {
      // pass 1 materializes the cache
      val first = li.agg(count(lit(1)), sum("l_orderkey")).collect()
      // pass 2's plan must read the in-memory columnar copy, not parquet
      val pass2 = li.filter(col("l_quantity") >= 30)
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("ck"))
      // (the InMemoryRelation node renders its ORIGIN plan — including the
      // FileScan it was built from — so assert the scan NODE is the cache)
      val plan2 = pass2.queryExecution.executedPlan.toString
      assert(plan2.contains("InMemoryTableScan"), s"plan:\n$plan2")
      // and caching is result-invisible
      val uncached = Tables.lineitem(spark, sf).filter(col("l_quantity") >= 30)
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("ck"))
      assert(pass2.collect().toSeq === uncached.collect().toSeq)
      assert(first.nonEmpty)
    } finally li.unpersist()
  }
}
