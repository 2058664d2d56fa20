package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the star schema — PageRank as the
  * flagship of the "fixed rounds of keyed joins" computation class (the
  * weighted sibling of d7's connected components; the reference has no
  * graphs at all, but a training-data pipeline ranks pages/domains by
  * link centrality before sampling).
  *
  * Graph: the supplier↔customer bipartite graph induced by lineitem ⋈
  * orders (who supplied whom), with edges in BOTH directions so rank
  * circulates (one-way bipartite rank collapses to the teleport constant
  * in one step). Node ids pack type+key into one BIGINT (2·key for
  * suppliers, 2·key+1 for customers) so the rank state is a single
  * (id, rank) table.
  *
  * FIXED-POINT arithmetic is what makes this ORACLED, not approximate:
  * ranks live in integer micro-units (1e6 = rank 1.0), each iteration is
  *   rank'(v) = 150000 + (85 · Σ_{u→v} (rank(u) div outdeg(u))) div 100
  * — integer division and integer sums only, so the result is exactly
  * reproducible in any engine regardless of float summation order (the
  * d14 trick applied to iteration). Floating-point PageRank could only
  * be tolerance-checked; integer PageRank hash-matches.
  *
  * Scale shape: the edge list (with out-degrees) is built ONCE, cached,
  * and partitioned by src; each of the PrIters rounds is one keyed join
  * (ranks are n rows, edges m rows — never materialized beyond m) plus
  * one groupBy(dst) with map-side partial sums. No driver-side state, no
  * adjacency matrix, no n² anything; 5 rounds = 5 shuffles of n rows.
  * The final top-100 is a TakeOrdered, not a global sort.
  */
object Graph {

  /** Iteration count + damping in micro-units (declared before `defs`:
    * the oracle SQL interpolates them at object-init time). */
  val PrIters = 5
  val PrUnit = 1000000L   // rank 1.0
  val PrTeleport = 150000L // (1 - 0.85) · PrUnit

  /** One PageRank sweep: contributions along edges, damped update.
    * `ew` = (src, dst, deg) cached edge list; `r` = (id, r) ranks. */
  private def sweep(ew: DataFrame, nodes: DataFrame, r: DataFrame): DataFrame = {
    val contrib = ew.join(r, ew("src") === r("id"))
      .groupBy(ew("dst").as("cid")).agg(sum(expr("r div deg")).as("s"))
    nodes.join(contrib, nodes("id") === contrib("cid"), "left")
      .select(nodes("id"),
        expr(s"CAST($PrTeleport + (85 * coalesce(s, 0)) div 100 AS BIGINT)").as("r"))
  }

  val defs: Seq[QueryDef] = Seq(

    // G1: 5-iteration fixed-point PageRank over supplier↔customer.
    // The oracle unrolls the same five integer sweeps as chained CTEs —
    // bit-for-bit the same arithmetic, independently executed.
    QueryDef("g1_pagerank", {
      val iters = (1 to PrIters).map { k =>
        s"""r$k AS (SELECT n.id,
           |        CAST($PrTeleport + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
           |        FROM nodes n LEFT JOIN (
           |          SELECT e.dst AS id, sum(r.r // d.deg) AS s
           |          FROM edges e JOIN r${k - 1} r ON e.src = r.id
           |                       JOIN outd d ON e.src = d.src
           |          GROUP BY e.dst) c ON n.id = c.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT src, dst FROM e0
        |          UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |outd AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |r0 AS (SELECT id, CAST($PrUnit AS BIGINT) AS r FROM nodes),
        |$iters
        |SELECT id AS node_id,
        |       CASE WHEN id % 2 = 0 THEN 'supplier' ELSE 'customer' END AS node_type,
        |       r AS pr
        |FROM r$PrIters ORDER BY pr DESC, node_id LIMIT 100""".stripMargin
    }) { (s, dir) =>
      val e0 = Tables.lineitem(s, dir).select(col("l_suppkey"), col("l_orderkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("src"), (col("o_custkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val outd = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      // static per-iteration state, built once: edge list decorated with
      // the source out-degree (so a sweep is ONE join), plus the node set
      val ew = edges.join(outd, "src").select("src", "dst", "deg").cache()
      val nodes = ew.select(col("src").as("id")).distinct().cache()
      var r = nodes.select(col("id"), lit(PrUnit).as("r"))
      for (_ <- 1 to PrIters) r = sweep(ew, nodes, r)
      r.select(col("id").as("node_id"),
          when(col("id") % 2 === 0, "supplier").otherwise("customer").as("node_type"),
          col("r").as("pr"))
        .orderBy(col("pr").desc, col("node_id")).limit(100)
    }
  )
}
