package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Joins over the star-schema testdata. The reference has no joins at all
  * (SURVEY §2.7) — this is the extension surface §7.1 step 5 commits to,
  * and the capability no analytics engine can ship without.
  *
  * Scale design, per join:
  *   - dimension joins (customer/supplier/nation/region) are explicitly
  *     `broadcast()` — the dim ships to every executor, the 100 TB fact
  *     table never shuffles for them;
  *   - fact-fact joins (lineitem ⨝ orders) are shuffle joins on the join
  *     key; j5 pins the sort-merge strategy with a `merge` hint, which is
  *     the right plan when both sides are far beyond broadcast size;
  *   - semi/anti joins use Spark's left_semi / left_anti (no payload
  *     duplication, early-out probing), never a join + distinct.
  * Every query reduces to a grouped/top-k result, so nothing scales with
  * the fact-table row count on the output side.
  */
object Joins {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  /** Salted equi-join for skewed keys: the big side scatters each (possibly
    * hot) key across `salts` sub-keys; the small side replicates each row
    * once per salt. The shuffle then distributes a hot key over `salts`
    * reducers instead of melting one. (AQE's skew-join split handles the
    * sort-merge case automatically; this is the explicit form for when the
    * optimizer can't see the skew — e.g. aggregation-free pipelines.)
    * Requires `left.key === right.key` equi-semantics; result equals the
    * plain join exactly (JoinSpec asserts it). */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(bigKey), monotonically_increasing_id()), lit(salts)).cast("int"))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(explodedSmall,
        saltedBig(bigKey) === explodedSmall(smallKey) &&
          saltedBig("__salt") === explodedSmall("__salt"))
      .drop("__salt")
  }

  val defs: Seq[QueryDef] = Seq(
    // J1: TPC-H Q3 shape — selective dim filter broadcast into two fact
    // joins, grouped revenue, top-k by revenue.
    QueryDef("j1_broadcast_q3",
      """SELECT l_orderkey,
        |       CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS DOUBLE) AS revenue,
        |       CAST(o_orderdate AS DATE) AS odate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1998-01-01' AND l_shipdate > DATE '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01"))
        .join(t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("odate"))
        .agg(round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")) / 10000.0, 2).cast("double").as("revenue"))
        .select("l_orderkey", "revenue", "odate")
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(20)
    },

    // J2: TPC-H Q5 shape — six-table star join; nation/region broadcast,
    // the c_nationkey = s_nationkey condition closes the snowflake.
    QueryDef("j2_star_q5",
      """SELECT n_name,
        |       CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")) / 10000.0, 2).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // J3: semi join — orders containing at least one near-max-quantity line.
    // left_semi probes and short-circuits; no lineitem payload crosses the
    // join, no post-join distinct needed.
    QueryDef("j3_semi_join",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey LIMIT 1000""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") >= 49),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey").limit(1000)
    },

    // J4: anti join — customers with no high-value order.
    QueryDef("j4_anti_join",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice >= 400000)
        |ORDER BY c_custkey LIMIT 1000""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") >= 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey").limit(1000)
    },

    // J5: fact-fact equi-join pinned to sort-merge (`merge` hint) — the
    // 100 TB plan for two tables that both exceed broadcast size: shuffle
    // both on the join key, sort, streamed merge. Integral quantity sums
    // are exact in doubles, no rounding needed.
    QueryDef("j5_sortmerge_factfact",
      """SELECT o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").hint("merge")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy("o_orderpriority")
    },

    // J7: TPC-H Q6 shape — the pure scan-side query: three pushed range
    // predicates, no join, no group key, one global sum. The classic
    // "how fast can you move bytes" probe; every predicate must reach the
    // parquet reader as a PushedFilter.
    QueryDef("j7_q6_revenue",
      """SELECT CAST(round(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) / 10000.0, 2) AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(round(col("l_extendedprice") * col("l_discount") * 10000)
          .cast("long")) / 10000.0, 2).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },

    // J8: TPC-H Q18 shape (large-volume customers) — a HAVING filter over a
    // high-cardinality groupBy feeding the probe side of a join: aggregate
    // lineitem per order, keep orders whose total quantity clears the
    // threshold, decorate with order/customer attributes. The scale shape:
    // the big aggregate happens FIRST and the surviving key set (tiny) is
    // what joins — never the raw fact table against customer. Integral
    // quantities make the HAVING threshold exact in both engines.
    QueryDef("j8_q18_having",
      """SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
        |       CAST(q.sum_qty AS BIGINT) AS sum_qty
        |FROM (SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT)) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(CAST(l_quantity AS BIGINT)) > 210) q
        |JOIN orders o ON q.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY sum_qty DESC, o_orderkey""".stripMargin) { (s, dir) =>
      val q = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 210)
      q.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("sum_qty"))
        .orderBy(col("sum_qty").desc, col("o_orderkey"))
    },

    // J6: left outer join with a selective right side — match accounting per
    // order status (count(col) vs count(*) exposes the null-extension rows).
    QueryDef("j6_outer_join",
      """SELECT o_orderstatus,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(l.l_orderkey) AS BIGINT) AS matched
        |FROM orders
        |LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 49) l
        |  ON o_orderkey = l.l_orderkey
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") >= 49),
          col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), count(col("l_orderkey")).as("matched"))
        .orderBy("o_orderstatus")
    },

    // J9: TPC-H Q13 shape (customer distribution) — LEFT join customer →
    // filtered orders, per-customer order count (null-extended rows count
    // 0), then the distribution of those counts. Two aggregations, both
    // keyed; the second one's domain is tiny (distinct counts), so the
    // heavy lifting is one shuffle of (custkey) pairs. Customers with no
    // orders must survive to the c_count=0 bucket — the outer join is the
    // semantics, not a fallback.
    QueryDef("j9_q13_custdist",
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        |      FROM customer c
        |      LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
        |        ON c.c_custkey = o.o_custkey
        |      GROUP BY c.c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // J10: TPC-H Q15 shape (top supplier) — revenue per supplier over a
    // quarter, keep the supplier(s) hitting the MAX. The max comes from a
    // scalar subquery over the same aggregate: Spark computes the
    // aggregate once (cached), takes the one-row max, and broadcast-joins
    // it back — the 100 TB shape is "aggregate once, decorate with a
    // scalar", never a second scan. Fixed-point revenue arithmetic as j1.
    QueryDef("j10_q15_top_supplier",
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |         CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue
        |FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
        |WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin) { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")) / 10000.0, 2).cast("double").as("total_revenue"))
        .cache()
      val top = rev.agg(max("total_revenue").as("mx"))
      rev.join(broadcast(top), col("total_revenue") === col("mx"))
        .join(t(s, dir, "supplier"), col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },

    // J11: TPC-H Q22 shape (global sales opportunity) — customers with
    // above-average balance and no URGENT orders, rolled up per nation
    // (every customer in this data has SOME order, so the textbook
    // "no orders at all" predicate matches nothing — the filtered anti
    // side keeps the result non-empty without changing the shape). Three
    // primitives composed: a scalar aggregate (the positive-balance
    // average) broadcast into a filter, a left ANTI join against the
    // filtered orders (never a join+distinct), and a final tiny group.
    // The fact side is probed once; the scalar is one row.
    QueryDef("j11_q22_no_orders",
      """WITH avg_bal AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey,
        |       CAST(count(*) AS BIGINT) AS numcust,
        |       CAST(round(sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0, 2) AS DOUBLE) AS totacctbal
        |FROM customer, avg_bal
        |WHERE c_acctbal > ab
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg(avg("c_acctbal").as("ab"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          round(sum(round(col("c_acctbal") * 100).cast("long")) / 100.0, 2)
            .cast("double").as("totacctbal"))
        .orderBy("c_nationkey")
    },

    // J13: TPC-H Q10 shape (returned items) — revenue lost to returns per
    // customer: selective fact filter (returnflag = 'R' + a quarter),
    // fact-fact join to orders, broadcast customer decoration, top 20.
    // The filters sit ON THE SCAN (PushedFilters), the grouped aggregate
    // runs before the row count can re-inflate, and only the 20 survivors
    // order globally.
    QueryDef("j13_q10_returns",
      """SELECT c.c_custkey, c.c_name,
        |       CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS DOUBLE) AS revenue,
        |       c.c_nationkey
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1996-07-01'
        |GROUP BY c.c_custkey, c.c_name, c.c_nationkey
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1996-01-01") &&
              col("o_orderdate") < lit("1996-07-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")) / 10000.0, 2).cast("double").as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_nationkey"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
    },

    // J14: TPC-H Q19 shape (disjunctive predicate) — an OR of three
    // (brand, size-range, quantity-range) conjuncts across the join. The
    // planner must still push the per-table parts of the disjunction to
    // the scans (brand/size prune part, the quantity hull prunes
    // lineitem) and broadcast the shrunken part side; a naive engine
    // evaluates the OR after a full join.
    QueryDef("j14_q19_disjunctive",
      """SELECT CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 25)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 35)""".stripMargin) { (s, dir) =>
      val pre = (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 35))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .filter(pre)
        .agg(round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")) / 10000.0, 2).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },

    // J12: TPC-H Q14 shape (promo effect) — broadcast dim join feeding a
    // conditional-sum ratio: what share of a month's revenue came from
    // PROMO parts. The filter prunes lineitem at the scan; part broadcasts;
    // the ratio is two sums in ONE aggregate pass (never two scans).
    QueryDef("j12_q14_promo_share",
      """SELECT CAST(round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |         THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
        |         ELSE 0 END)
        |       / sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)), 6) AS DOUBLE) AS promo_share,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'""".stripMargin) { (s, dir) =>
      val fixedRev = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
        .cast("long")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01") &&
          col("l_shipdate") < lit("1996-10-01"))
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .agg(
          round(lit(100.0) * sum(when(col("p_type") === "PROMO", fixedRev).otherwise(0L))
            / sum(fixedRev), 6).cast("double").as("promo_share"),
          count(lit(1)).as("n"))
    },

    // J15: TPC-H Q21 SHAPE (suppliers who kept orders waiting) — the
    // hardest join composition in the benchmark: the fact table appears
    // THREE times (base + correlated EXISTS + correlated NOT EXISTS).
    // This testdata has no receipt/commit dates, so the "fault" marker is
    // l_returnflag = 'R': suppliers whose returned line sits on a
    // finished multi-supplier order where NO OTHER supplier had a return
    // — the sole-blame supplier. Semantics (and the decorrelated plan:
    // two fact self-joins, one SEMI one ANTI, on the order key) are
    // exactly Q21's.
    //
    // Scale: both self-joins are keyed on l_orderkey (shuffle join, no
    // broadcast of a fact side); semi/anti probe without payload
    // duplication; supplier broadcasts; the aggregate is one pass.
    QueryDef("j15_q21_shape",
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val l1 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      val base = l1
        .join(l2, col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
          "left_semi")
        .join(l3, col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3"),
          "left_anti")
      base
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(100)
    },

    // J16: TPC-H Q7 SHAPE (volume shipping between two nations) — the
    // six-table chain where the SAME dimension (nation) joins twice under
    // different roles (supplier's nation vs customer's nation) with a
    // symmetric cross-nation disjunction. Revenue sums exact integer
    // cents. Scale: both nation roles and supplier broadcast; lineitem ⋈
    // orders ⋈ customer are keyed shuffle joins; the nation-pair filter
    // lands before the aggregate so only cross-nation rows reach it.
    QueryDef("j16_q7_shape",
      """SELECT supp_nation, cust_nation, l_year, CAST(sum(vol) AS BIGINT) AS revenue_c
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(year(l_shipdate) AS INT) AS l_year,
        |         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS vol
        |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |    AND c_custkey = o_custkey
        |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("nk1"),
        col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("nk2"),
        col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("nk1"))
        .join(broadcast(n2), col("c_nationkey") === col("nk2"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_c"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // J17: TPC-H Q4 SHAPE (order priority checking) — an EXISTS per order
    // decorrelated to ONE left-semi probe of the fact table (this testdata
    // has no commit/receipt dates; the "late" witness is a line shipped
    // after the order date). Orders prune on the date window at the scan;
    // the semi join carries no lineitem payload.
    QueryDef("j17_q4_shape",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-04-01"))
        .join(t(s, dir, "lineitem").select("l_orderkey", "l_shipdate"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"),
          "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // J18: TPC-H Q12 SHAPE (shipping urgency profile) — fact-fact join
    // feeding per-group conditional counts (URGENT/HIGH vs the rest) in
    // ONE aggregate pass; the year of shipment stands in for l_shipmode
    // (absent from this testdata).
    QueryDef("j18_q12_shape",
      """SELECT CAST(year(l_shipdate) AS INT) AS y,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY y""".stripMargin) { (s, dir) =>
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("l_shipdate")).as("y"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_count"))
        .orderBy("y")
    },

    // J19: TPC-H Q17 shape (small-quantity-order revenue) — the
    // correlated-scalar-subquery decorrelation pattern: "lineitems whose
    // quantity is below 20% of that part's average quantity". The
    // per-part averages are computed ONCE as a grouped aggregate over the
    // fact table (semi-pruned to the brand's parts first, so the 100 TB
    // corpus aggregates only the keys that can survive), then joined
    // back — never an avg-per-probe re-scan. avg(l_quantity) is exact in
    // both engines (integral quantities, BIGINT-range sums), so the
    // 0.2·avg threshold compare is bit-deterministic.
    QueryDef("j19_q17_shape",
      """SELECT CAST(round(sum(CAST(round(l_extendedprice * 10000) AS BIGINT)) / 70000.0, 2) AS DOUBLE) AS avg_yearly,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1' AND p_size <= 10
        |  AND l_quantity < (SELECT avg(l2.l_quantity) * 0.2 FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val partsF = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#1" && col("p_size") <= 10)
        .select("p_partkey")
      val thresh = li
        .join(broadcast(partsF), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey").as("t_partkey"))
        .agg((avg("l_quantity") * 0.2).as("qty_thresh"))
      li.join(broadcast(partsF), col("l_partkey") === col("p_partkey"))
        .join(broadcast(thresh), col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < col("qty_thresh"))
        .agg(round(sum(round(col("l_extendedprice") * 10000).cast("long")) / 70000.0, 2)
          .cast("double").as("avg_yearly"),
          count(lit(1)).as("n"))
    },

    // J20: TPC-H Q8 shape (national market share) — the seven-table
    // snowflake: what share of PROMO-part revenue delivered into ASIA
    // came from NATION_7 suppliers, by order year. Every dimension
    // (part, supplier, nation×2, customer-side region chain) broadcasts;
    // the only fact-fact shuffle is lineitem ⨝ orders. The share is a
    // ratio of two conditional BIGINT sums from ONE aggregate pass —
    // identical integer numerators/denominators on both engines, one
    // double division at the end.
    QueryDef("j20_q8_shape",
      """SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS y,
        |       CAST(round(sum(CASE WHEN n2.n_name = 'NATION_7'
        |                THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
        |                ELSE 0 END)
        |              / sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)), 6) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation n2 ON n2.n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON n1.n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = n1.n_regionkey
        |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        |GROUP BY 1 ORDER BY y""".stripMargin) { (s, dir) =>
      val v = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
        .cast("long")
      val suppNation = t(s, dir, "supplier")
        .join(t(s, dir, "nation").select(col("n_nationkey"), col("n_name").as("supp_nation")),
          col("n_nationkey") === col("s_nationkey"))
        .select("s_suppkey", "supp_nation")
      val asiaCust = t(s, dir, "customer")
        .join(t(s, dir, "nation").select(col("n_nationkey").as("c_nk"), col("n_regionkey")),
          col("c_nk") === col("c_nationkey"))
        .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("r_regionkey") === col("n_regionkey"))
        .select("c_custkey")
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_type") === "PROMO")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
        .groupBy(year(col("o_orderdate")).as("y"))
        .agg(round(sum(when(col("supp_nation") === "NATION_7", v).otherwise(0L))
          / sum(v), 6).cast("double").as("mkt_share"))
        .orderBy("y")
    },

    // J21: TPC-H Q9 shape (product-type profit by nation and year). The
    // testdata has no partsupp/ps_supplycost, so cost is proxied as
    // 10% of p_retailprice per unit — the SHAPE (per-row revenue minus
    // cost, grouped by the supplier's nation × order year) is Q9's.
    // Profit is assembled per row as a difference of two integer-scaled
    // BIGINTs (revenue at 1e4, cost at 1e4 via retailprice·qty·1e3), so
    // grouped sums commute and both engines divide the same integer.
    QueryDef("j21_q9_shape",
      """SELECT n_name, CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS y,
        |       CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
        |                    - CAST(round(p_retailprice * l_quantity * 1000) AS BIGINT)) / 10000.0, 2) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val amt = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000).cast("long") -
        round(col("p_retailprice") * col("l_quantity") * 1000).cast("long")
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_name").like("%gear%"))
          .select("p_partkey", "p_retailprice")), col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")
          .join(t(s, dir, "nation").select("n_nationkey", "n_name"),
            col("n_nationkey") === col("s_nationkey"))
          .select("s_suppkey", "n_name")), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("y"))
        .agg(round(sum(amt) / 10000.0, 2).cast("double").as("profit"))
        .orderBy("n_name", "y")
    },

    // J22: SKEW-SALTED shuffle join under the differential gate. The
    // fact side gets a deliberately skewed key (half of all lineitems
    // collapse onto k=0 — the "one hot customer" shape that melts one
    // reducer at 100 TB); the salted join scatters each key across 16
    // sub-keys and replicates the 100-row rate table 16×, so the hot
    // key's rows spread over 16 reducers. shuffle_hash hint keeps the
    // demo honest (Spark would otherwise broadcast the tiny build side
    // and dodge the skew instead of mitigating it). The oracle runs the
    // PLAIN join — certifying salting is semantics-free on real data,
    // not just on the BucketingSpec fixture.
    QueryDef("j22_skew_salted_join",
      """WITH f AS (SELECT CASE WHEN l_quantity <= 25 THEN 0
        |                       ELSE l_orderkey % 100 END AS k,
        |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |           FROM lineitem),
        |d AS (SELECT p_partkey % 100 AS k,
        |             CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS rate
        |      FROM part GROUP BY 1)
        |SELECT f.k AS k, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(f.cents) AS BIGINT) AS cents,
        |       CAST(min(d.rate) AS BIGINT) AS rate
        |FROM f JOIN d ON f.k = d.k
        |GROUP BY 1 ORDER BY k""".stripMargin) { (s, dir) =>
      val f = t(s, dir, "lineitem").select(
        when(col("l_quantity") <= 25, 0L)
          .otherwise(pmod(col("l_orderkey"), lit(100L))).as("k"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val d = t(s, dir, "part")
        .groupBy(pmod(col("p_partkey"), lit(100L)).as("dk"))
        .agg(sum(round(col("p_retailprice") * 100).cast("long")).as("rate"))
      saltedJoin(f, d.hint("shuffle_hash"), "k", "dk", salts = 16)
        .groupBy("k")
        .agg(count(lit(1)).as("n"), sum("cents").as("cents"), min("rate").as("rate"))
        .orderBy("k")
    },

    // J23: TPC-H Q2 SHAPE (minimum-cost supplier). The testdata has no
    // partsupp, so the part-supplier relation is DERIVED from the fact
    // table: cost(part, supp) = min observed line cents — one grouped
    // aggregate, exact BIGINTs. The Q2 skeleton is intact: regional
    // supplier restriction, then "suppliers achieving the per-part
    // minimum cost" — the correlated-min subquery decorrelated to a
    // single min().over(partitionBy(part)) window on the already-grouped
    // (part, supp) frame, NOT a per-probe rescan. Scale: supplier/nation/
    // region broadcast; the only corpus-sized shuffles are the (part,
    // supp) aggregate and the per-part window, both keyed on l_partkey.
    QueryDef("j23_q2_shape",
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS ps_cost
        |  FROM lineitem GROUP BY 1, 2),
        |es AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON n_nationkey = s_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT p_partkey, p_name, s_name, n_name,
        |       CAST(s_acctbal AS DOUBLE) AS acctbal, ps_cost
        |FROM part
        |JOIN ps ON ps_partkey = p_partkey
        |JOIN es ON s_suppkey = ps_suppkey
        |WHERE p_type = 'PROMO' AND p_size <= 25
        |  AND ps_cost = (SELECT min(ps2.ps_cost) FROM ps ps2
        |                 JOIN es es2 ON es2.s_suppkey = ps2.ps_suppkey
        |                 WHERE ps2.ps_partkey = p_partkey)
        |ORDER BY acctbal DESC, p_partkey, s_name LIMIT 100""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val es = t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("n_nationkey") === col("s_nationkey"))
        .join(t(s, dir, "region").filter(col("r_name") === "EUROPE"),
          col("r_regionkey") === col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val psEu = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(round(col("l_extendedprice") * 100).cast("long")).as("ps_cost"))
        .join(broadcast(es), col("l_suppkey") === col("s_suppkey"))
      psEu
        .withColumn("__min_cost",
          min(col("ps_cost")).over(Window.partitionBy(col("l_partkey"))))
        .filter(col("ps_cost") === col("__min_cost"))
        .join(t(s, dir, "part")
          .filter(col("p_type") === "PROMO" && col("p_size") <= 25)
          .select("p_partkey", "p_name"),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
          col("s_acctbal").cast("double").as("acctbal"), col("ps_cost"))
        .orderBy(col("acctbal").desc, col("p_partkey"), col("s_name")).limit(100)
    },

    // J24: TPC-H Q11 SHAPE (important stock identification) — grouped
    // value per part restricted to one region's suppliers, kept only when
    // the part's value exceeds a fixed fraction of the GLOBAL value (the
    // scalar-subquery HAVING). The fraction compare is pure BIGINT
    // (val_c * 1000 > total) — no float threshold to diverge on. Scale:
    // the regional supplier set broadcasts; the per-part aggregate is one
    // keyed shuffle; the global total is a one-row frame broadcast back,
    // never a driver round-trip inside the plan.
    QueryDef("j24_q11_shape",
      """WITH pv AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS val_c
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY 1)
        |SELECT l_partkey, val_c FROM pv
        |WHERE val_c * 1000 > (SELECT sum(val_c) FROM pv)
        |ORDER BY val_c DESC, l_partkey LIMIT 100""".stripMargin) { (s, dir) =>
      val euSupp = t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("n_nationkey") === col("s_nationkey"))
        .join(t(s, dir, "region").filter(col("r_name") === "EUROPE"),
          col("r_regionkey") === col("n_regionkey"))
        .select("s_suppkey")
      val pv = t(s, dir, "lineitem")
        .join(broadcast(euSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("val_c"))
      pv.join(broadcast(pv.agg(sum("val_c").as("__total"))))
        .filter(col("val_c") * 1000 > col("__total"))
        .select("l_partkey", "val_c")
        .orderBy(col("val_c").desc, col("l_partkey")).limit(100)
    },

    // J25: TPC-H Q16 SHAPE (parts/supplier relationship) — distinct
    // supplier count per part attribute triple, minus an excluded
    // supplier set (Q16's "complaints" NOT IN, proxied deterministically
    // as s_suppkey % 7 = 0 since this testdata has no comment column).
    // NOT IN on a non-null key decorrelates to a broadcast left-anti
    // join; count(DISTINCT) runs as Spark's two-phase distinct aggregate
    // (partial distinct per partition, then merge) — no all-to-one.
    QueryDef("j25_q16_shape",
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_suppkey % 7 = 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 100""".stripMargin) { (s, dir) =>
      val excluded = t(s, dir, "supplier")
        .filter(col("s_suppkey") % 7 === 0).select("s_suppkey")
      t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(t(s, dir, "part").filter(col("p_brand") =!= "Brand#1")
          .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
        .limit(100)
    },

    // J26: TPC-H Q20 SHAPE (potential part promotion) — the nested
    // semi-join chain: suppliers IN (derived part-supplier rows whose
    // total shipped quantity exceeds 2× the 1997 shipment, over parts IN
    // (name-pattern set)). Availability is derived from the fact table
    // (no partsupp): total_qty stands in for ps_availqty. Quantities are
    // integral doubles, so the 2× compare is exact BIGINT arithmetic.
    // Scale: the part set broadcasts into a semi-join BEFORE the (part,
    // supp) aggregate, so only pattern-matching parts shuffle; the
    // surviving supplier set is a semi-join key list, no payload.
    QueryDef("j26_q20_shape",
      """WITH agg AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
        |         CAST(sum(CASE WHEN l_shipdate >= DATE '1997-01-01'
        |                        AND l_shipdate < DATE '1998-01-01'
        |                   THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_1997
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
        |  GROUP BY l_suppkey, l_partkey)
        |SELECT s_name, n_name
        |FROM supplier JOIN nation ON n_nationkey = s_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM agg WHERE total_qty > 2 * qty_1997)
        |ORDER BY s_name""".stripMargin) { (s, dir) =>
      val widgetParts = t(s, dir, "part")
        .filter(col("p_name").like("%widget%")).select("p_partkey")
      val qualifying = t(s, dir, "lineitem")
        .join(broadcast(widgetParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"),
          sum(when(col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1998-01-01"),
            col("l_quantity").cast("long")).otherwise(0L)).as("qty_1997"))
        .filter(col("total_qty") > lit(2) * col("qty_1997"))
        .select("l_suppkey")
      t(s, dir, "supplier")
        .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
          col("n_nationkey") === col("s_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    },

    // J27: TPC-DS Q67 shape — rollup revenue over the (type, brand)
    // hierarchy with each level RANKED and SHARE-OF-PARENT'd inside its
    // parent group: brands ranked within their part type, types ranked
    // within the grand total, shares in exact ppm. This is the
    // rollup × window composition no TPC-H-roster query exercises.
    //
    // Deliberately NOT Spark's built-in `rollup()`: rollup plans through
    // Expand, which re-aliases the grouping columns, so the type-window
    // after it would need its own Exchange on top of the rollup's — two
    // full shuffles of the fact flow. Composing the rollup manually keeps
    // ONE hash distribution end to end: the fact rows repartition by
    // p_type once, and because hashpartitioning(p_type) satisfies every
    // downstream ClusteredDistribution over keys ⊇ {p_type}, the detail
    // aggregation (type, brand), the brand-rank window (partition p_type),
    // and the type-subtotal re-aggregation all run shuffle-free on top of
    // it (J27 plan pin in JoinSpec: exactly one "Exchange hashpartitioning"
    // in the whole physical plan). The remaining exchanges are
    // result-sized: the 6-row type frame's rank window and the
    // ~157-row output sort — dimension-bounded, like g2's node ranking.
    // Revenue is the roster's exact-integer 1e-4 quantization, so every
    // level, rank, and ppm share hash-matches bit-for-bit.
    QueryDef("j27_q67_category_share",
      """WITH d AS (SELECT p_type, p_brand,
        |             sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS rev
        |           FROM lineitem JOIN part ON l_partkey = p_partkey
        |           WHERE p_type IS NOT NULL
        |           GROUP BY 1, 2),
        |m AS (SELECT p_type, sum(rev) AS trev FROM d GROUP BY 1),
        |g AS (SELECT sum(trev) AS grev FROM m),
        |lvl0 AS (SELECT 0 AS lvl, d.p_type, d.p_brand, d.rev,
        |           CAST(rank() OVER (PARTITION BY d.p_type
        |                             ORDER BY d.rev DESC, d.p_brand) AS INT) AS rnk,
        |           CAST(d.rev * 1000000 // m.trev AS BIGINT) AS share_ppm
        |         FROM d JOIN m ON d.p_type = m.p_type),
        |lvl1 AS (SELECT 1 AS lvl, m.p_type, NULL AS p_brand, m.trev AS rev,
        |           CAST(rank() OVER (ORDER BY m.trev DESC, m.p_type) AS INT) AS rnk,
        |           CAST(m.trev * 1000000 // g.grev AS BIGINT) AS share_ppm
        |         FROM m, g),
        |lvl2 AS (SELECT 2 AS lvl, NULL AS p_type, NULL AS p_brand, g.grev AS rev,
        |           CAST(1 AS INT) AS rnk, CAST(1000000 AS BIGINT) AS share_ppm
        |         FROM g)
        |SELECT CAST(lvl AS INT) AS lvl, p_type, p_brand,
        |       CAST(rev AS BIGINT) AS rev, rnk, share_ppm
        |FROM (SELECT * FROM lvl0 UNION ALL SELECT * FROM lvl1 UNION ALL SELECT * FROM lvl2)
        |ORDER BY lvl, p_type, p_brand""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
      val base = t(s, dir, "lineitem")
        .select("l_partkey", "l_extendedprice", "l_discount")
        // p_type IS NOT NULL made EXPLICIT (it is vacuous on this data):
        // the lvl0 branch's d ⋈ m equi-join infers it and pushes it below
        // the shuffle, and if the other branches lack it their repartition
        // subtrees stop being canonically equal — breaking exchange reuse
        // and silently running the fact shuffle twice
        .join(broadcast(t(s, dir, "part").select("p_partkey", "p_type", "p_brand")
          .filter(col("p_type").isNotNull)),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_type"), col("p_brand"),
          expr("CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)")
            .as("rev1e4"))
        .repartition(col("p_type")) // the ONE fact shuffle
      // NOT cached although consumed twice: caching would wrap `d` in its
      // own adaptive-plan boundary, hiding the p_type distribution from
      // EnsureRequirements and forcing fresh exchanges at every consumer.
      // Uncached, the duplicated subtree collapses via exchange reuse —
      // the shuffle runs once and every branch reads its files.
      val d = base.groupBy("p_type", "p_brand")
        .agg(sum("rev1e4").as("rev")) // clustered ⊇ {p_type}: no exchange
      val m = d.groupBy("p_type").agg(sum("rev").as("trev"))
      val g = broadcast(m.agg(sum("trev").as("grev")))
      val lvl0 = d.join(broadcast(m), "p_type")
        .select(lit(0).as("lvl"), col("p_type"), col("p_brand"), col("rev"),
          rank().over(w.partitionBy("p_type")
            .orderBy(col("rev").desc, col("p_brand"))).as("rnk"),
          // ppm through DECIMAL(38): rev·1e6 overflows BIGINT once the
          // fact table passes ~sf0.4 (revenue is 1e-4-quantized, so a
          // type subtotal alone reaches ~4e13 at sf0.1 — caught by the
          // x8 scaling run). IntegralDivide on decimals returns BIGINT;
          // the quotient is ≤ 1e6 so only the intermediate needs width.
          // DuckDB needs no twin change: its sum() is already HUGEINT.
          expr("CAST(rev AS DECIMAL(38,0)) * 1000000 div trev").as("share_ppm"))
      // manufacturer frame: 5 rows — the unpartitioned rank window is
      // dimension-bounded by construction (the g2 discipline)
      val lvl1 = m.crossJoin(g)
        .select(lit(1).as("lvl"), col("p_type"), lit(null).cast("string").as("p_brand"),
          col("trev").as("rev"),
          rank().over(w.orderBy(col("trev").desc, col("p_type"))).as("rnk"),
          expr("CAST(trev AS DECIMAL(38,0)) * 1000000 div grev").as("share_ppm"))
      val lvl2 = g.select(lit(2).as("lvl"),
        lit(null).cast("string").as("p_type"), lit(null).cast("string").as("p_brand"),
        col("grev").as("rev"), lit(1).as("rnk"), lit(1000000L).as("share_ppm"))
      lvl0.unionByName(lvl1).unionByName(lvl2)
        .orderBy("lvl", "p_type", "p_brand")
    },

    // J28: TPC-DS Q47 shape — deviation-from-trend ranking. Monthly brand
    // revenue vs the brand's all-months average, the months ranked inside
    // each month by |deviation|: the window × window composition Q67/j27
    // doesn't cover (a full-partition average frame feeding a second
    // differently-partitioned rank window). Exactness: revenue in exact
    // 1e-4 units; the brand mean via integer division ×100 (centiunits)
    // so the deviation — which CAN be negative — is a BIGINT difference,
    // never a float; rank ties break on brand. ONE fact-sized shuffle
    // (the (brand, month) aggregation); both window frames and the final
    // top-3-per-month are dimension×month sized.
    QueryDef("j28_q47_deviation",
      """WITH d AS (SELECT p_brand,
        |             CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE) AS mon,
        |             sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS rev
        |           FROM lineitem JOIN part ON l_partkey = p_partkey
        |           GROUP BY 1, 2),
        |a AS (SELECT p_brand, mon, rev,
        |        count(*) OVER (PARTITION BY p_brand) AS nm,
        |        sum(rev) OVER (PARTITION BY p_brand) AS brev
        |      FROM d),
        |x AS (SELECT p_brand, mon, rev,
        |        rev * 100 - (brev * 100 // nm) AS dev_cc
        |      FROM a),
        |r AS (SELECT p_brand, mon, rev, dev_cc,
        |        rank() OVER (PARTITION BY mon ORDER BY abs(dev_cc) DESC, p_brand) AS rnk
        |      FROM x)
        |SELECT mon, p_brand, CAST(rev AS BIGINT) AS rev,
        |       CAST(dev_cc AS BIGINT) AS dev_cc, CAST(rnk AS INT) AS rnk
        |FROM r WHERE rnk <= 3 ORDER BY mon, rnk, p_brand""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "lineitem")
        .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
        .join(broadcast(t(s, dir, "part").select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), trunc(col("l_shipdate"), "month").as("mon"))
        .agg(sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"))
          .as("rev"))
      d.withColumn("nm", count(lit(1)).over(w.partitionBy("p_brand")))
        .withColumn("brev", sum("rev").over(w.partitionBy("p_brand")))
        // DECIMAL-widened intermediates (the j27 overflow moral): brev·100
        // passes 2^63 near sf1000 and Spark's non-ANSI Long would wrap
        // silently while DuckDB's HUGEINT stays exact; dev_cc itself is
        // BIGINT-bounded (one month's revenue ×100)
        .withColumn("dev_cc", expr(
          "CAST(CAST(rev AS DECIMAL(38,0)) * 100 - " +
            "CAST(brev AS DECIMAL(38,0)) * 100 div nm AS BIGINT)"))
        .withColumn("rnk", rank().over(w.partitionBy("mon")
          .orderBy(abs(col("dev_cc")).desc, col("p_brand"))))
        .filter(col("rnk") <= 3)
        .select(col("mon"), col("p_brand"), col("rev"), col("dev_cc"),
          col("rnk").cast("int").as("rnk"))
        .orderBy("mon", "rnk", "p_brand")
    }
  )
}
