package graft.operators

import graft.SparkSpec
import graft.sources.Tables

class SubquerySpec extends SparkSpec {

  test("correlated scalar subquery decorrelates to one aggregate + equi-join") {
    Seq("lineitem").foreach(t =>
      Tables.table(spark, sf, t).createOrReplaceTempView(t))
    val df = spark.sql(
      """SELECT count(*) AS n FROM lineitem l1
        |WHERE l_quantity < 0.2 * (SELECT avg(l_quantity) FROM lineitem l2
        |                          WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan.toString
    // Catalyst must rewrite the per-row subquery into a grouped aggregate
    // joined back on the correlation key — the only shape that scales
    assert(!optimized.contains("scalar-subquery"), s"plan:\n$optimized")
    assert(optimized.contains("Join"), s"plan:\n$optimized")
    assert(optimized.toLowerCase.contains("aggregate"), s"plan:\n$optimized")
    // semantics: matches a hand-decorrelated equivalent
    val manual = spark.sql(
      """SELECT count(*) AS n
        |FROM lineitem l1
        |JOIN (SELECT l_partkey AS pk, avg(l_quantity) AS aq
        |      FROM lineitem GROUP BY l_partkey) t ON l1.l_partkey = t.pk
        |WHERE l1.l_quantity < 0.2 * t.aq""".stripMargin)
    assert(df.collect().map(_.getLong(0)).head ===
      manual.collect().map(_.getLong(0)).head)
  }
}
