package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregations (reference A1-A3, stockify.cu:135-138, 556-562, 599-605).
  *
  * The reference's global SUM is an `atomicAdd` from every GPU thread into
  * one cell (stockify.cu:137) with a host-side final re-reduce
  * (stockify.cu:498-501); MIN/MAX exist as CPU scalar scans. That
  * per-thread-partial + final-reduce shape is exactly Spark's partial→final
  * `HashAggregateExec` (map-side combine, then exchange of ONE row per
  * partition, then final merge) — so a global aggregate over 100 TB moves
  * only #partitions rows through the shuffle, never the data.
  *
  * Grouped aggregation, grouping sets and distinct counts don't exist in the
  * reference (SURVEY §2.7); they are the natural generalization and come
  * from the same partial/final machinery with the group key as shuffle key.
  *
  * Float discipline: grid-aligned money sums/avgs go through EXACT
  * integer-scaled sums (per-row round(x*scale) → BIGINT sum → divide), so
  * accumulation order (which Spark does not fix across partitions) cannot
  * flip the differential check; irrational-valued aggregates (stddev) are
  * rounded instead. The reference's exact-float `==` checks
  * (stockify.cu:502) are a bug we deliberately do not reproduce.
  */
object Aggregates {

  /** Global aggregate helpers — the A-family surface. */
  def globalSum(df: DataFrame, c: String): DataFrame = df.agg(sum(col(c)))
  def globalMin(df: DataFrame, c: String): DataFrame = df.agg(min(col(c)))
  def globalMax(df: DataFrame, c: String): DataFrame = df.agg(max(col(c)))

  private def li(s: SparkSession, dir: String) = Tables.lineitem(s, dir)

  val defs: Seq[QueryDef] = Seq(
    // A1 (stockify.cu:135-138): global SUM(low) -> sum(l_extendedprice).
    QueryDef("a1_sum_global",
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS sum_price,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty
        |FROM lineitem""".stripMargin) { (s, dir) =>
      li(s, dir).agg(
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0)
          .cast("double").as("sum_price"),
        sum(col("l_quantity").cast("long")).cast("double").as("sum_qty"))
    },

    // A2 (stockify.cu:556-562): global MIN(low) -> min(l_extendedprice).
    QueryDef("a2_min_global",
      """SELECT min(l_extendedprice) AS min_price, min(l_quantity) AS min_qty
        |FROM lineitem""".stripMargin) { (s, dir) =>
      li(s, dir).agg(
        min("l_extendedprice").as("min_price"),
        min("l_quantity").as("min_qty"))
    },

    // A3 (stockify.cu:599-605): global MAX(high) -> max(l_extendedprice).
    QueryDef("a3_max_global",
      """SELECT max(l_extendedprice) AS max_price, max(l_quantity) AS max_qty
        |FROM lineitem""".stripMargin) { (s, dir) =>
      li(s, dir).agg(
        max("l_extendedprice").as("max_price"),
        max("l_quantity").as("max_qty"))
    },

    // A4: count / avg / stddev — obvious completions of the A-family.
    QueryDef("a4_stats_global",
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |       CAST(round(avg(l_extendedprice), 4) AS DOUBLE) AS avg_price,
        |       CAST(round(stddev_samp(l_extendedprice), 4) AS DOUBLE) AS sd_price
        |FROM lineitem""".stripMargin) { (s, dir) =>
      li(s, dir).agg(
        count(lit(1)).as("n"),
        round(avg("l_extendedprice"), 4).cast("double").as("avg_price"),
        round(stddev_samp("l_extendedprice"), 4).cast("double").as("sd_price"))
    },

    // A5: grouped aggregation (TPC-H Q1 shape) — the flagship query.
    // Money sums are computed as EXACT integer-scaled sums then divided
    // back (per-row round of a near-integer double is deterministic; BIGINT
    // sums commute), so both engines round the SAME double — a plain
    // round(sum(4-decimal products), 2) can land exactly on a .xx5 decimal
    // boundary where independent accumulation noise flips the last digit.
    QueryDef("a5_group_flag_status",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS sum_base_price,
        |       CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS DOUBLE) AS sum_disc_price,
        |       CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) / 1000000.0, 2) AS DOUBLE) AS sum_charge,
        |       CAST(round(sum(CAST(l_quantity AS BIGINT)) / CAST(count(*) AS DOUBLE), 4) AS DOUBLE) AS avg_qty,
        |       CAST(round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / CAST(count(*) AS DOUBLE), 4) AS DOUBLE) AS avg_price,
        |       CAST(round(sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0 / CAST(count(*) AS DOUBLE), 4) AS DOUBLE) AS avg_disc,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)(q1TpchStyle),

    // A6: per-day grouped roll-up — the reference's single-instrument
    // time-series generalized to grouped-by-date OHLC-style stats.
    QueryDef("a6_group_by_day",
      """SELECT CAST(l_shipdate AS DATE) AS ship_day,
        |       CAST(count(*) AS BIGINT) AS n,
        |       min(l_extendedprice) AS lo,
        |       max(l_extendedprice) AS hi,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY ship_day""".stripMargin) { (s, dir) =>
      li(s, dir)
        .groupBy(to_date(col("l_shipdate")).as("ship_day"))
        .agg(
          count(lit(1)).as("n"),
          min("l_extendedprice").as("lo"),
          max("l_extendedprice").as("hi"),
          sum(col("l_quantity").cast("long")).cast("double").as("sum_qty"))
        .orderBy("ship_day")
    },

    // A7: exact distinct counts (expand-based, shuffles on the distinct key
    // — scale path is a8's approx sketch).
    QueryDef("a7_count_distinct",
      """SELECT l_returnflag,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      li(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"))
        .orderBy("l_returnflag")
    },

    // A8: HLL approximate distinct — the 100 TB path for distinct counts
    // (mergeable sketch, one pass, no expand). The estimate itself is
    // engine-specific, so the REGISTERED form emits the engine-independent
    // verdict — whether the HLL estimate is within its configured error
    // envelope of the exact count — which the oracle states as constant
    // TRUE per group: the cross-engine check validates the sketch without
    // requiring DuckDB to reproduce Spark's HLL bits, and a broken sketch
    // flips a row to FALSE and fails the hash compare. The raw estimate
    // dump survives as the bench-only `a8_approx_distinct_raw` below.
    QueryDef("a8_approx_distinct",
      """SELECT l_returnflag, TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      // explicit distinct-pairs form of mixing countDistinct with a
      // non-distinct agg: the built-in rewrite's middle (flag, partkey)
      // exchange AQE-coalesced its cheap bytes onto 2 tasks while the
      // scan's 3 splits bounded the partial pass (measured: 2x ~0.63 s
      // near-serial stages). Deduping on a pinned spread exchange keeps
      // both stages at full width, and one exchange drops outright.
      // Results are identical: count over the deduped pairs IS the exact
      // distinct, and an HLL sketch is duplicate-insensitive (registers
      // are maxes over hashed values), so approx_part matches bit-exact.
      Par.spread(li(s, dir).select("l_returnflag", "l_partkey"),
          col("l_returnflag"), col("l_partkey"))
        .distinct()
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_part"),
          count(col("l_partkey")).as("exact_part"))
        .select(col("l_returnflag"),
          (abs(col("approx_part") - col("exact_part")) <=
            col("exact_part") * 0.05).as("within_tol"))
        // fence: the HLL merge is interpreted (its 411-word buffer is past
        // the codegen field cap), so replaying it in the sort sampler is
        // the single most expensive stage here (measured 2x ~0.55 s)
        .transform(Par.sortFence(_, col("l_returnflag")))
        .orderBy("l_returnflag")
    },

    // A10: exact interpolated percentiles. Computed over the INTEGER-valued
    // quantity column on purpose: interpolation fractions are quarters, so
    // every possible output (k + {0, .25, .5, .75}) is binary-exact and the
    // engines' differing interpolation formulas cannot produce different
    // bits. (Percentiles of arbitrary doubles would need tolerance, not
    // hash, comparison.) Requires one full sort of the group — the approx
    // sketch (a8-style) is the 100 TB path for percentiles too.
    QueryDef("a10_percentiles",
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.25) AS p25,
        |       quantile_cont(l_quantity, 0.50) AS p50,
        |       quantile_cont(l_quantity, 0.75) AS p75,
        |       min(l_quantity) AS lo, max(l_quantity) AS hi
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      li(s, dir)
        .groupBy("l_returnflag")
        .agg(
          percentile(col("l_quantity"), lit(0.25)).as("p25"),
          percentile(col("l_quantity"), lit(0.50)).as("p50"),
          percentile(col("l_quantity"), lit(0.75)).as("p75"),
          min("l_quantity").as("lo"), max("l_quantity").as("hi"))
        .orderBy("l_returnflag")
    },

    // A11: approximate percentiles (the sketch tier a10's scaladoc points
    // to): percentile_approx is a mergeable quantile sketch — bounded
    // memory per group and ONE pass, vs a10's full per-group sort, which
    // is the difference at 100 TB. Same cross-engine shape as a8b: Spark
    // checks its own sketch against its own exact percentiles (rank
    // tolerance ±0.05, far looser than the sketch's guarantee at
    // accuracy=1000), the oracle's constant TRUE matches iff the bound
    // really held.
    QueryDef("a11_approx_percentile_tol",
      """SELECT l_returnflag, TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      // spread: 3 scan splits otherwise build the exact-percentile count
      // maps near-serially (measured 0.9 s on 3 tasks); hashing on the
      // value column keeps the partial buffers balanced. The sketch's
      // merge order shifts with partitioning, but within_tol has ±0.05
      // rank slack vs the sketch's ~1e-3 guarantee — and the oracle gate
      // re-certifies the booleans.
      Par.spread(li(s, dir).select("l_returnflag", "l_extendedprice"),
          col("l_extendedprice"))
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("ap"),
          percentile(col("l_extendedprice"), lit(0.45)).as("lo"),
          percentile(col("l_extendedprice"), lit(0.55)).as("hi"))
        .select(col("l_returnflag"),
          (col("ap") >= col("lo") && col("ap") <= col("hi")).as("within_tol"))
        // fence: the 3-row verdict otherwise re-runs the percentile
        // final-merge inside the sort's range sampler (measured 2x 0.5 s)
        .transform(Par.sortFence(_, col("l_returnflag")))
        .orderBy("l_returnflag")
    },

    // A12: MERGEABLE-sketch distinct counting across shards — the actual
    // 100 TB architecture a8 stands for, demonstrated end to end: each
    // "shard" (here: an orderkey-parity split, standing in for per-day /
    // per-partition corpora) builds its own DataSketches HLL
    // (hll_sketch_agg), the BINARY sketches are re-aggregated with
    // hll_union_agg — no re-scan of either shard — and the merged
    // estimate must (a) track the single-pass whole-corpus sketch within
    // 2% (merge is register-wise max so it loses no information, but the
    // union operator runs through HLL_8/coupon promotion, so the merged
    // REPRESENTATION — and with it the estimate — can differ slightly
    // from the one-pass sketch; measured mismatch is sub-percent) and
    // (b) sit within 5% of the exact distinct count. The oracle states
    // both verdicts as constants (the a8b pattern: DuckDB can't
    // reproduce Spark's sketch bits, but the claims are
    // engine-independent).
    QueryDef("a12_sketch_shard_merge",
      """SELECT l_returnflag, TRUE AS merge_close, TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      // one pinned spread exchange feeds all three sketch scans: the two
      // shard subtrees and the whole-corpus subtree canonicalize to the
      // SAME exchange, so ReuseExchange materializes the scan once and
      // every DataSketches partial runs 64-wide instead of on the file's
      // 3 splits (measured: 1.0 s near-serial whole-corpus pass)
      val t = Par.spread(
        li(s, dir).select("l_returnflag", "l_orderkey", "l_partkey"),
        col("l_partkey"))
      def shard(p: Int) = t.filter(col("l_orderkey") % 2 === p)
        .groupBy("l_returnflag")
        .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      val merged = shard(0).unionByName(shard(1))
        .groupBy("l_returnflag")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
      val whole = t.groupBy("l_returnflag")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("est_whole"),
          countDistinct(col("l_partkey")).as("exact"))
      merged.join(whole, "l_returnflag")
        .select(col("l_returnflag"),
          (abs(col("est_merged") - col("est_whole")) <=
            col("est_whole") * 0.02).as("merge_close"),
          (abs(col("est_merged") - col("exact")) <= col("exact") * 0.05).as("within_tol"))
        .orderBy("l_returnflag")
    },

    // A13: exact per-group MODE (most frequent value) with a
    // deterministic tiebreak (highest count, then lowest value) — the
    // statistical aggregate SQL engines bolt on as mode()/any_value
    // hacks; here it's the two-shuffle shape that scales: count per
    // (group, value) with map-side combine, then a keyed top-1 window —
    // never a per-group collect.
    QueryDef("a13_exact_mode",
      """WITH c AS (SELECT l_returnflag, l_linestatus,
        |             CAST(l_quantity AS BIGINT) AS q, count(*) AS n
        |           FROM lineitem GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY l_returnflag, l_linestatus
        |        ORDER BY n DESC, q) AS rn FROM c)
        |SELECT l_returnflag, l_linestatus, q AS mode_qty,
        |       CAST(n AS BIGINT) AS freq
        |FROM r WHERE rn = 1 ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val c = li(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("q"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag", "l_linestatus")
        .orderBy(col("n").desc, col("q"))
      c.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("q").as("mode_qty"), col("n").as("freq"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // A9: grouping sets via ROLLUP — free generalization of grouped aggs
    // (SURVEY §2.7). NULLS FIRST pinned on both sides (DuckDB defaults
    // NULLS LAST on ASC; Spark defaults NULLS FIRST).
    QueryDef("a9_rollup",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin) { (s, dir) =>
      li(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // A14: bivariate statistics — correlation / covariance / least-squares
    // fit of extendedprice against quantity per returnflag. Both engines
    // use numerically-stable streaming co-moments; outputs are rounded
    // well above the ~1e-8 cross-engine accumulation noise floor (r and
    // r² are |·|≤1 rounded at 1e-6; the dollar-scale moments at 1e-4 sit
    // 12 orders above their relative error). One grouped pass, partial
    // aggregation map-side — the 100 TB shape of "fit a line per cohort".
    QueryDef("a14_regression",
      """SELECT l_returnflag,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(round(corr(l_extendedprice, l_quantity), 6) AS DOUBLE) AS r,
        |       CAST(round(regr_r2(l_extendedprice, l_quantity), 6) AS DOUBLE) AS r2,
        |       CAST(round(covar_samp(l_extendedprice, l_quantity), 4) AS DOUBLE) AS cov_s,
        |       CAST(round(covar_pop(l_extendedprice, l_quantity), 4) AS DOUBLE) AS cov_p,
        |       CAST(round(regr_slope(l_extendedprice, l_quantity), 4) AS DOUBLE) AS slope,
        |       CAST(round(regr_intercept(l_extendedprice, l_quantity), 4) AS DOUBLE) AS icept
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      li(s, dir)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          round(corr("l_extendedprice", "l_quantity"), 6).cast("double").as("r"),
          round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).cast("double").as("r2"),
          round(covar_samp("l_extendedprice", "l_quantity"), 4).cast("double").as("cov_s"),
          round(covar_pop("l_extendedprice", "l_quantity"), 4).cast("double").as("cov_p"),
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).cast("double").as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).cast("double").as("icept"))
        .orderBy("l_returnflag")
    },

    // A15: two-phase SALTED aggregation — the skew-mitigation pattern,
    // under the differential gate. l_returnflag has 3 values over the
    // whole fact table, the canonical "hot key" shape: a single-phase
    // groupBy puts a third of 100 TB through three reducers. Phase 1
    // groups by (key, salt) with salt = l_orderkey mod 32 — 96 cells, so
    // every reducer holds ≤ 1/96 of the data; phase 2 re-aggregates the
    // 96 partial rows by key alone. Integer cents sums commute across the
    // two phases, so the result is bit-identical to the unsalted plan the
    // oracle runs (counts add; sums add; min of per-salt mins = min).
    // Spark's map-side partial aggregation already does this WITHIN a
    // stage; explicit salting is the cross-STAGE form that also fixes
    // skewed windows/joins, demonstrated here where an oracle can certify
    // it changes nothing.
    QueryDef("a15_salted_agg",
      """SELECT l_returnflag,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |       CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS lo,
        |       CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS hi
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val cents = round(col("l_extendedprice") * 100).cast("long")
      li(s, dir)
        .groupBy(col("l_returnflag"), pmod(col("l_orderkey"), lit(32)).as("__salt"))
        .agg(count(lit(1)).as("pn"), sum(cents).as("pc"),
          min(cents).as("plo"), max(cents).as("phi"))
        .groupBy("l_returnflag")
        .agg(sum("pn").as("n"), sum("pc").as("cents"),
          min("plo").as("lo"), max("phi").as("hi"))
        .orderBy("l_returnflag")
    },

    // A16: fixed-width histogram — orders binned into $10k buckets
    // (bucket = cents div 1_000_000, clamped to 49). One narrow map to
    // the bucket id + one grouped aggregate: the scan→bin→count shape of
    // every distribution profile at scale, with ≤50 output rows no matter
    // the input size. Bucket assignment is integer division of exact
    // cents, so bucket edges cannot drift between engines.
    QueryDef("a16_histogram",
      """SELECT CAST(least(CAST(round(o_totalprice * 100) AS BIGINT) // 1000000, 49) AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      val cents = round(col("o_totalprice") * 100).cast("long")
      Tables.orders(s, dir)
        .select(least(expr("CAST(round(o_totalprice * 100) AS BIGINT) div 1000000"),
          lit(49L)).as("bucket"), cents.as("c"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum("c").as("cents"))
        .orderBy("bucket")
    }
  )

  /** Bench-only raw form of a8: the HLL estimates themselves (what a
    * dashboard would actually serve). Not on the scoreboard — the estimate
    * is engine-specific, so the registered a8 emits the tolerance verdict
    * instead; this keeps the raw plan timed. */
  val rawDefs: Seq[QueryDef] = Seq(
    QueryDef.unoracled("a8_approx_distinct_raw") { (s, dir) =>
      li(s, dir)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_part"))
        .orderBy("l_returnflag")
    }
  )

  /** TPC-H Q1 shape, also exposed as `SparkEntry.entry` (flagship).
    * Monetary aggregates go through exact integer-scaled sums (see a5
    * comment) so the cross-engine compare rounds identical doubles. */
  def q1TpchStyle(s: SparkSession, dir: String): DataFrame = {
    val qtyL = col("l_quantity").cast("long")
    val price100 = round(col("l_extendedprice") * 100).cast("long")
    val disc100 = round(col("l_discount") * 100).cast("long")
    val net1e4 = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000).cast("long")
    val charge1e6 = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
      * (lit(1) + col("l_tax")) * 1000000).cast("long")
    li(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(qtyL).cast("double").as("sum_qty"),
        (sum(price100) / 100.0).cast("double").as("sum_base_price"),
        round(sum(net1e4) / 10000.0, 2).cast("double").as("sum_disc_price"),
        round(sum(charge1e6) / 1000000.0, 2).cast("double").as("sum_charge"),
        round(sum(qtyL) / count(lit(1)).cast("double"), 4).cast("double").as("avg_qty"),
        round(sum(price100) / 100.0 / count(lit(1)).cast("double"), 4).cast("double").as("avg_price"),
        round(sum(disc100) / 100.0 / count(lit(1)).cast("double"), 4).cast("double").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }
}
