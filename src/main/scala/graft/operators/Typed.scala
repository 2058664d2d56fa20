package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed Dataset[T] surface — the case-class Encoder path (SURVEY §1.2
  * "optionally Dataset[Stock]"). Where schemas are static, typed datasets
  * buy compile-time column safety and lambda logic with no stringly-typed
  * column references; the cost is that closures are opaque to Catalyst
  * (no pushdown through a typed filter), so the typed tier is for logic
  * genuinely awkward as expressions — here the per-group fold mirrors the
  * KeyValueGroupedDataset API the stateful streaming path uses.
  *
  * Determinism note: the per-row arithmetic in the fold
  * (floor(price*(1-disc)*100) → Long) is the same IEEE expression both
  * engines evaluate, and Long addition commutes — so a typed mapGroups
  * fold can still be hash-verified against a SQL oracle.
  */
object Typed {

  final case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: java.sql.Timestamp)

  final case class FlagRevenue(l_returnflag: String, ck_net: Long, n: Long)

  def lineitemDS(s: SparkSession, dir: String): Dataset[Lineitem] = {
    import s.implicits._
    Tables.lineitem(s, dir).as[Lineitem]
  }

  val defs: Seq[QueryDef] = Seq(
    // TY1: typed filter → groupByKey → mapGroups fold, verified against a
    // plain SQL oracle. Exercises Encoders end-to-end (decode to case
    // class, JVM lambda logic, encode back).
    QueryDef("ty1_typed_fold",
      """SELECT l_returnflag,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS ck_net,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem WHERE l_quantity >= 10
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import s.implicits._
      lineitemDS(s, dir)
        .filter(_.l_quantity >= 10)
        .groupByKey(_.l_returnflag)
        .mapGroups { (flag, rows) =>
          var ck = 0L; var n = 0L
          rows.foreach { r =>
            ck += math.floor(r.l_extendedprice * (1 - r.l_discount) * 100).toLong
            n += 1
          }
          FlagRevenue(flag, ck, n)
        }
        .toDF()
        .orderBy("l_returnflag")
    }
  )
}
