package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Selection operators (reference F1-F6, stockify.cu:89-122).
  *
  * The reference instantiates six thread-per-row predicate kernels (five
  * single-column `>=` filters and one two-way AND), but its comment block
  * (stockify.cu:74-83) declares the intended query class: arbitrary
  * conjunctions of column-vs-constant comparisons over {=, >, >=, <, <=, !=}.
  * We implement the full declared class as a tiny predicate-builder that
  * compiles to Catalyst comparison expressions, so every predicate is
  * codegen'd and pushed into the Parquet scan (visible as PushedFilters in
  * the physical plan) — the distributed analogue of the reference's
  * "evaluate predicate on device-resident data" with data skipping on top.
  *
  * Scale note: these filters shuffle nothing; cost is a single pushdown scan
  * regardless of table size, so the shape is already 100 TB-safe.
  */
object Filters {

  sealed trait CmpOp
  case object Eq extends CmpOp
  case object Ne extends CmpOp
  case object Gt extends CmpOp
  case object Ge extends CmpOp
  case object Lt extends CmpOp
  case object Le extends CmpOp

  /** One column-vs-constant comparison (the atom of stockify.cu:74-83). */
  final case class Pred(column: String, op: CmpOp, value: Any) {
    def toColumn: Column = {
      val c = col(column)
      op match {
        case Eq => c === lit(value)
        case Ne => c =!= lit(value)
        case Gt => c > lit(value)
        case Ge => c >= lit(value)
        case Lt => c < lit(value)
        case Le => c <= lit(value)
      }
    }
  }

  /** Conjunction of atoms — `WHERE p1 AND p2 AND ...`. */
  def conjunction(preds: Seq[Pred]): Column =
    preds.map(_.toColumn).reduce(_ && _)

  /** Compacting filter: keep matching rows (standard SQL WHERE). */
  def filterRows(df: DataFrame, preds: Pred*): DataFrame =
    df.filter(conjunction(preds))

  /** Non-compacting selection vector — the reference's exact output shape:
    * every kernel writes `results[i] = predicate(row_i)` into a bool array
    * without compacting (stockify.cu:89-122, late materialization). */
  def selectionVector(df: DataFrame, flag: String, preds: Pred*): DataFrame =
    df.withColumn(flag, conjunction(preds))

  // ---------------------------------------------------------------- queries
  // Reference filters transposed onto lineitem (FIXTURES.md §B): the five
  // single-column >= kernels (volume/close/open/high/low >= k,
  // stockify.cu:89-116) map to lineitem's numeric columns; the conjunction
  // kernel (:119-122) and the declared full predicate class follow.
  //
  // Verification shape (round-2 fix): row-level dumps are top-k
  // (`ORDER BY keys LIMIT n` → TakeOrderedAndProject, a per-partition heap +
  // single k-row merge — no global sort, scale-safe at any table size), and
  // FULL-result correctness is carried by `f9_filter_checksums`, an
  // order-insensitive integer-checksum aggregate over every predicate's
  // complete output. Round 1 instead global-sorted each full result for the
  // dump, which benchmarked the sort rather than the filter and was flagged
  // as the 100 TB scale-killer.

  private val keys = Seq("l_orderkey", "l_linenumber").map(col)
  /** Dumped rows per row-level verification query (top-k, not full sort). */
  private val DumpK = 1000
  private def li(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.lineitem(s, dir)

  /** Order-insensitive full-result checksum of one predicate's output:
    * exact BIGINT sums (keys, and the value column integer-scaled per row —
    * per-row IEEE arithmetic is bit-identical across engines, and integer
    * sums commute, so no rounding hazard at any row count). */
  /** One predicate's checksums as a CONDITIONAL-aggregate struct, so the
    * whole f9 family evaluates in a SINGLE scan (7 predicates = one pass
    * + 28 conditional sums, not 7 scans — at 100 TB the difference is 6
    * whole reads of the fact table). `otherwise(0)`/COALESCE keep an
    * empty-match predicate at 0 on both engines (a bare SQL sum over no
    * rows is NULL). */
  private def checksumStruct(tag: String, cond: Column, valueCol: Column,
      scale: Int): Column =
    struct(
      lit(tag).as("pred"),
      sum(when(cond, 1L).otherwise(0L)).as("n"),
      sum(when(cond, col("l_orderkey")).otherwise(0L)).as("ck_okey"),
      sum(when(cond, col("l_linenumber").cast("long")).otherwise(0L)).as("ck_line"),
      sum(when(cond, floor(valueCol * lit(scale)).cast("long")).otherwise(0L)).as("ck_val"))

  private def checksumSql(tag: String, where: String, valueCol: String, scale: Int): String =
    // DuckDB sum() over integers returns HUGEINT (INT128); CAST back to
    // BIGINT so the oracle's arrow type matches Spark's LongType exactly.
    s"""SELECT '$tag' AS pred, count(*) AS n,
       |       COALESCE(CAST(sum(l_orderkey) AS BIGINT), 0) AS ck_okey,
       |       COALESCE(CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT), 0) AS ck_line,
       |       COALESCE(CAST(sum(CAST(floor($valueCol * $scale) AS BIGINT)) AS BIGINT), 0) AS ck_val
       |FROM lineitem WHERE $where""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // F1 (stockify.cu:89-92): volume >= k  ->  l_quantity >= 45
    QueryDef("f1_filter_ge_quantity",
      s"""SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem WHERE l_quantity >= 45
        |ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT $DumpK""".stripMargin) { (s, dir) =>
      filterRows(li(s, dir), Pred("l_quantity", Ge, 45))
        .select(keys :+ col("l_quantity"): _*)
        .orderBy(keys :+ col("l_quantity"): _*).limit(DumpK)
    },

    // F2 (stockify.cu:95-98): close >= k  ->  l_extendedprice >= 90000
    QueryDef("f2_filter_ge_extendedprice",
      s"""SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem WHERE l_extendedprice >= 90000
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice LIMIT $DumpK""".stripMargin) { (s, dir) =>
      filterRows(li(s, dir), Pred("l_extendedprice", Ge, 90000))
        .select(keys :+ col("l_extendedprice"): _*)
        .orderBy(keys :+ col("l_extendedprice"): _*).limit(DumpK)
    },

    // F3 (stockify.cu:101-104): open >= k  ->  l_discount >= 0.08
    QueryDef("f3_filter_ge_discount",
      s"""SELECT l_orderkey, l_linenumber, l_discount
        |FROM lineitem WHERE l_discount >= 0.08
        |ORDER BY l_orderkey, l_linenumber, l_discount LIMIT $DumpK""".stripMargin) { (s, dir) =>
      filterRows(li(s, dir), Pred("l_discount", Ge, 0.08))
        .select(keys :+ col("l_discount"): _*)
        .orderBy(keys :+ col("l_discount"): _*).limit(DumpK)
    },

    // F4 (stockify.cu:107-110): high >= k  ->  l_tax >= 0.06
    QueryDef("f4_filter_ge_tax",
      s"""SELECT l_orderkey, l_linenumber, l_tax
        |FROM lineitem WHERE l_tax >= 0.06
        |ORDER BY l_orderkey, l_linenumber, l_tax LIMIT $DumpK""".stripMargin) { (s, dir) =>
      filterRows(li(s, dir), Pred("l_tax", Ge, 0.06))
        .select(keys :+ col("l_tax"): _*)
        .orderBy(keys :+ col("l_tax"): _*).limit(DumpK)
    },

    // F5 (stockify.cu:113-116): low >= k  ->  l_partkey >= 150
    QueryDef("f5_filter_ge_partkey",
      s"""SELECT l_orderkey, l_linenumber, l_partkey
        |FROM lineitem WHERE l_partkey >= 150
        |ORDER BY l_orderkey, l_linenumber, l_partkey LIMIT $DumpK""".stripMargin) { (s, dir) =>
      filterRows(li(s, dir), Pred("l_partkey", Ge, 150L))
        .select(keys :+ col("l_partkey"): _*)
        .orderBy(keys :+ col("l_partkey"): _*).limit(DumpK)
    },

    // F6 (stockify.cu:119-122): high >= a AND low >= b
    QueryDef("f6_filter_conjunction",
      s"""SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem WHERE l_extendedprice >= 50000 AND l_discount >= 0.05
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount LIMIT $DumpK""".stripMargin) { (s, dir) =>
      filterRows(li(s, dir),
        Pred("l_extendedprice", Ge, 50000), Pred("l_discount", Ge, 0.05))
        .select(keys ++ Seq(col("l_extendedprice"), col("l_discount")): _*)
        .orderBy(keys ++ Seq(col("l_extendedprice"), col("l_discount")): _*).limit(DumpK)
    },

    // F7: the FULL declared predicate class (stockify.cu:74-83) — one atom
    // per comparison operator, conjoined.
    QueryDef("f7_predicate_class",
      s"""SELECT l_orderkey, l_linenumber, l_quantity, l_tax
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity > 10 AND l_discount >= 0.02
        |  AND l_linenumber <= 4 AND l_extendedprice < 80000 AND l_tax <> 0.02
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_tax LIMIT $DumpK""".stripMargin) { (s, dir) =>
      filterRows(li(s, dir),
        Pred("l_returnflag", Eq, "R"), Pred("l_quantity", Gt, 10),
        Pred("l_discount", Ge, 0.02), Pred("l_linenumber", Le, 4),
        Pred("l_extendedprice", Lt, 80000), Pred("l_tax", Ne, 0.02))
        .select(keys ++ Seq(col("l_quantity"), col("l_tax")): _*)
        .orderBy(keys ++ Seq(col("l_quantity"), col("l_tax")): _*).limit(DumpK)
    },

    // F8: the reference's literal output shape — a non-compacting boolean
    // selection vector over ALL rows (stockify.cu:89-92 writes bool per row).
    // Full-result coverage for the selection vector comes from the grouped
    // count below (exact over all rows), not a 100%-of-table dump.
    QueryDef("f8_selection_vector",
      """SELECT (l_quantity >= 45) AS pass, count(*) AS n,
        |       CAST(sum(l_orderkey) AS BIGINT) AS ck_okey
        |FROM lineitem GROUP BY 1 ORDER BY pass""".stripMargin) { (s, dir) =>
      selectionVector(li(s, dir), "pass", Pred("l_quantity", Ge, 45))
        .groupBy("pass")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("ck_okey"))
        .orderBy("pass")
    },

    // Projection (reference has none — every query is SELECT *; SURVEY §2.2):
    // explicit column pruning, reaches the scan as ReadSchema. Per-row IEEE
    // arithmetic is deterministic, so no rounding (round() here would DIVERGE:
    // Spark rounds half-up, DuckDB half-even, and 2dp×2dp products sit
    // exactly on .xx5 boundaries).
    QueryDef("p1_projection",
      s"""SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) AS net_price
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, net_price LIMIT $DumpK""".stripMargin) { (s, dir) =>
      li(s, dir)
        .select(keys :+
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"): _*)
        .orderBy(keys :+ col("net_price"): _*).limit(DumpK)
    },

    // F9: order-insensitive full-result checksums — verifies EVERY row each
    // predicate emits (not just the top-k dump) with exact integer sums; ONE
    // narrow scan evaluates all seven predicates as conditional aggregates
    // (no sort, no shuffle beyond the one-row-per-partition partial). This
    // is the 100 TB-safe way to hash-compare a filter family's complete
    // output across engines: one pass, 28 fused sums.
    QueryDef("f9_filter_checksums",
      Seq(
        checksumSql("f1_qty_ge_45", "l_quantity >= 45", "l_quantity", 100),
        checksumSql("f2_price_ge_90000", "l_extendedprice >= 90000", "l_extendedprice", 100),
        checksumSql("f3_disc_ge_008", "l_discount >= 0.08", "l_discount", 100),
        checksumSql("f4_tax_ge_006", "l_tax >= 0.06", "l_tax", 100),
        checksumSql("f5_part_ge_150", "l_partkey >= 150", "l_partkey", 1),
        checksumSql("f6_conj", "l_extendedprice >= 50000 AND l_discount >= 0.05", "l_extendedprice", 100),
        checksumSql("p1_net_price", "true", "l_extendedprice * (1 - l_discount)", 100)
      ).mkString("", "\nUNION ALL\n", "\nORDER BY pred")) { (s, dir) =>
      val t = li(s, dir)
        .withColumn("net_price", col("l_extendedprice") * (lit(1) - col("l_discount")))
      val entries = Seq(
        checksumStruct("f1_qty_ge_45", Pred("l_quantity", Ge, 45).toColumn, col("l_quantity"), 100),
        checksumStruct("f2_price_ge_90000", Pred("l_extendedprice", Ge, 90000).toColumn, col("l_extendedprice"), 100),
        checksumStruct("f3_disc_ge_008", Pred("l_discount", Ge, 0.08).toColumn, col("l_discount"), 100),
        checksumStruct("f4_tax_ge_006", Pred("l_tax", Ge, 0.06).toColumn, col("l_tax"), 100),
        checksumStruct("f5_part_ge_150", Pred("l_partkey", Ge, 150L).toColumn, col("l_partkey"), 1),
        checksumStruct("f6_conj",
          Pred("l_extendedprice", Ge, 50000).toColumn && Pred("l_discount", Ge, 0.05).toColumn,
          col("l_extendedprice"), 100),
        checksumStruct("p1_net_price", lit(true), col("net_price"), 100))
      t.agg(entries.head.as("s0"),
          entries.tail.zipWithIndex.map { case (e, i) => e.as(s"s${i + 1}") }: _*)
        .select(explode(array(entries.indices.map(i => col(s"s$i")): _*)).as("e"))
        .select("e.*").orderBy("pred")
    }
  )
}
