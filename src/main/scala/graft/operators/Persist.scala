package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persist surface (reference S2, stockify.cu:209-212): the reference
  * copies the table to the device ONCE and runs every query against the
  * resident copy. The Spark analogue is `.cache()` / `.persist()`: the
  * first action materializes the scan into the in-memory columnar cache
  * (InMemoryRelation), and every later query over the same frame reads
  * cached batches instead of re-scanning parquet.
  *
  * Scale note: caching is a TOOL, not a default — a 100 TB fact table
  * doesn't fit in cluster memory, so the production pattern is to cache
  * only hot, bounded frames (dimension tables, per-stage intermediates —
  * e.g. the shingle frame inside d3/d7). MEMORY_AND_DISK degrades
  * gracefully when a partition doesn't fit; PersistSpec proves the second
  * pass actually reads InMemoryRelation and returns identical results to
  * the uncached plan.
  */
object Persist {

  /** One aggregation pass over a (possibly cached) lineitem frame. */
  private def pass(tag: String, df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("n"), sum("l_orderkey").as("ck"))
      .select(lit(tag).as("pass"), col("n"), col("ck"))

  val defs: Seq[QueryDef] = Seq(
    // S2: load-once / query-many — two aggregation passes over ONE cached
    // frame; pass 2 reuses the in-memory columnar copy (the reference's
    // device-resident mirror). Oracle states both passes over the raw
    // table — caching must be result-invisible.
    QueryDef("s2_cache_reuse",
      """SELECT 'full' AS pass, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(l_orderkey) AS BIGINT) AS ck
        |FROM lineitem
        |UNION ALL
        |SELECT 'hiqty' AS pass, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(l_orderkey) AS BIGINT) AS ck
        |FROM lineitem WHERE l_quantity >= 30
        |ORDER BY pass""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir).cache()
      pass("full", li)
        .union(pass("hiqty", li.filter(col("l_quantity") >= 30)))
        .orderBy("pass")
    }
  )
}
