package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions.{col, round, sum}

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

  test("sql2: recursive-CTE rollup conserves revenue up the taxonomy") {
    val rows = graft.operators.SqlSurface.defs
      .find(_.name == "sql2_recursive_rollup").get.run(spark, sf)
      .collect().map(r => (r.getAs[Long]("depth"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_parts"), r.getAs[Long]("rev_ck")))
    assert(rows.nonEmpty)
    // the root level is exactly node 1 carrying the WHOLE corpus revenue
    val (d0, n0, _, rev0) = rows.head
    assert(d0 === 0L && n0 === 1L)
    val li = graft.sources.Tables.lineitem(spark, sf)
    val total = li.agg(sum(round(col("l_extendedprice") * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(rev0 === total, "root rollup must equal total corpus revenue")
    // every part's chain holds exactly one node per level up to its depth,
    // so the parts-per-level sequence is non-increasing from the root
    val parts = rows.map(_._3)
    assert(parts.zip(parts.tail).forall { case (a, b) => a >= b },
      s"n_parts must be non-increasing by depth: ${parts.toSeq}")
    // and the leaf level carries every revenue-bearing part at its own depth
    assert(parts.head === li.select("l_partkey").distinct().count())
  }
}
