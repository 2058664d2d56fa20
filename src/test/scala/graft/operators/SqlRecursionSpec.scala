package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** The engine's recursive-CTE capability (Spark 4 UnionLoop), pinned
  * against sql2's closed-form plan: the bench path computes the
  * halving-chain closure as one array expression (SqlSurface sql2 —
  * ~25 per-level iterative jobs replaced by one scan), and THIS spec
  * certifies the declarative `WITH RECURSIVE` walk produces the
  * identical rollup, so the SQL capability stays demonstrated while the
  * hot path plans flat. */
class SqlRecursionSpec extends SparkSpec {

  test("WITH RECURSIVE walk ≡ sql2's closed-form ancestor-chain rollup") {
    val closed = graft.SparkEntry.allDefs
      .find(_.name == "sql2_recursive_rollup").get
      .run(spark, sf).collect().map(_.toSeq).toSeq

    val sq = SqlSurface.recursionSession(spark)
    val view = s"lineitem_rcte_${java.util.UUID.randomUUID().toString.take(8)}"
    Tables.lineitem(sq, sf).createOrReplaceTempView(view)
    val recursive =
      try sq.sql(s"""WITH RECURSIVE rev AS (
        |  SELECT l_partkey AS node,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS ck
        |  FROM $view GROUP BY l_partkey),
        |walk(node, anc) AS (
        |  SELECT node, node + 1 FROM rev
        |  UNION ALL
        |  SELECT node, anc DIV 2 FROM walk WHERE anc > 1),
        |agg AS (
        |  SELECT w.anc AS anc, CAST(count(*) AS BIGINT) AS n_parts,
        |         CAST(sum(r.ck) AS BIGINT) AS rev_ck
        |  FROM walk w JOIN rev r ON w.node = r.node GROUP BY w.anc)
        |SELECT CAST(length(bin(anc)) - 1 AS BIGINT) AS depth,
        |       CAST(count(*) AS BIGINT) AS n_nodes,
        |       CAST(sum(n_parts) AS BIGINT) AS n_parts,
        |       CAST(sum(rev_ck) AS BIGINT) AS rev_ck,
        |       CAST(sum(((anc % 251) + 1) * (rev_ck % 1000003)) AS BIGINT) AS mix
        |FROM agg GROUP BY 1 ORDER BY depth""".stripMargin)
        .collect().map(_.toSeq).toSeq
      finally sq.catalog.dropTempView(view)

    assert(recursive === closed)
    assert(closed.nonEmpty, "fixture must produce taxonomy levels")
  }
}
