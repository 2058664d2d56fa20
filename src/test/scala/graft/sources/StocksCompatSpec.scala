package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S1 compatibility against the reference's ACTUAL dataset: stocks.csv
  * (5,613,300 data rows, NO header). The reference loader skips line 1 as a
  * presumed header (stockify.cu:37-38) and silently loses the first data
  * row; our loader must not. */
class StocksCompatSpec extends SparkSpec {

  private lazy val csvPath: String = Tables.ensureStocksCsv()

  test("loads all 5,613,300 rows — no header-skip data loss (stockify.cu:38)") {
    val df = Tables.stocksCsv(spark, csvPath).cache()
    assert(df.count() === 5613300L)
    // the row the reference drops is present
    val first = df.filter(col("date") === lit("2024-01-01").cast("date"))
    assert(first.count() > 0)
    // schema widened per SURVEY §1.2: DATE + 5 doubles, no nulls in data
    assert(df.schema.fields.map(_.dataType.typeName).toSeq ===
      Seq("date", "double", "double", "double", "double", "double"))
    assert(df.filter(col("close").isNull || col("date").isNull).count() === 0)
    // domain sanity from SURVEY §0: 18 distinct dates, close in [500, 670]
    assert(df.select("date").distinct().count() === 18)
    val r = df.agg(min("close"), max("close")).collect()(0)
    assert(r.getDouble(0) >= 500.0 - 1e-9 && r.getDouble(1) <= 670.0 + 1e-9)
    df.unpersist()
  }

  test("materialized stocks parquet: lossless vs the CSV, idempotent, atomic marker") {
    val dir = Tables.ensureStocksParquet(spark)
    assert(new java.io.File(dir, "_SUCCESS").exists())
    val pq = Tables.stocksParquet(spark)
    assert(pq.count() === 5613300L)
    // columnar twin is row-for-row the CSV: same distinct-row multiset
    // (18 distinct full rows with identical multiplicities)
    val csvRows = Tables.stocksCsv(spark, csvPath)
      .groupBy("date", "close", "volume", "open", "high", "low")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.toSeq.mkString("|")).toSet
    val pqRows = pq
      .groupBy("date", "close", "volume", "open", "high", "low")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.toSeq.mkString("|")).toSet
    assert(pqRows === csvRows)
    // second call is a no-op fast path (returns without rewriting)
    assert(Tables.ensureStocksParquet(spark) === dir)
  }

  test("flagship reference query 1.a on the real data: volume >= 1,000,000 filter") {
    // stockify.cu:219-260 — the reference's first experiment, on its data
    val df = Tables.stocksCsv(spark, csvPath)
    val n = df.filter(col("volume") >= 1000000).count()
    assert(n > 0 && n <= 5613300L)
    // volumes are synthetic in [1.2e6, 2.9e6] per SURVEY — all rows pass
    assert(n === 5613300L)
  }
}
