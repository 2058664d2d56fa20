package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join — THE time-series operator a stock-analytics engine is asked
  * for first, and one Spark lacks natively. For each left (probe) row,
  * attach the latest right (quote) row with right.time <= left.time within
  * the same key.
  *
  * Built by COMPOSING existing operators (design rule: compose before
  * custom plans): tag both sides, union, and take `last(value, ignoreNulls)`
  * over a (key)-partitioned window ordered by (time, side) with rights
  * sorting before lefts at equal timestamps, so "at-or-before" includes the
  * simultaneous quote. One shuffle on the key + a per-partition sort —
  * the same cost envelope as a sort-merge join, scale-safe at 100 TB
  * (partition by key; no range lookup per probe row, no broadcast of the
  * quote table, no N×M expansion).
  *
  * The oracle is DuckDB's native `ASOF LEFT JOIN` — an independent
  * implementation of the same semantics, which is exactly what a
  * differential check wants. Time is compared in exact integer
  * microseconds on both sides.
  */
object AsOfJoin {

  /** General composition: returns `left` plus `asof_<valueCol>` = the last
    * `right.valueCol` at-or-before the left row's time within `key`.
    *
    * State is the whole right ROW (a (time, value) struct), not the bare
    * value: `last(value, ignoreNulls)` would SKIP a right row whose value
    * is NULL and attach an older non-null one, whereas as-of semantics
    * (and DuckDB's ASOF JOIN) match the latest row and return its NULL.
    * The struct is non-null for every right row, so ignoreNulls only skips
    * the interleaved LEFT rows. Ties among rights at equal (key, time)
    * resolve deterministically to the greatest value (the `__r` order key);
    * engines with arbitrary tie-break may differ there — keep right-side
    * (key, time) unique if exact cross-engine parity matters. */
  def asofJoin(left: DataFrame, right: DataFrame,
      key: String, time: String, valueCol: String): DataFrame = {
    val leftCols = left.columns
    val payload = struct(leftCols.map(left(_)): _*)
    val rStruct = StructType(Seq(
      StructField("t", right.schema(time).dataType),
      StructField("v", right.schema(valueCol).dataType)))
    val lPart = left.select(col(key), col(time),
      lit(null).cast(rStruct).as("__r"),
      lit(1).as("__side"), payload.as("__l"))
    val rPart = right.select(col(key), col(time),
      struct(col(time).as("t"), col(valueCol).as("v")).as("__r"),
      lit(0).as("__side"),
      lit(null).cast(lPart.schema("__l").dataType).as("__l"))
    val w = Window.partitionBy(key)
      .orderBy(col(time), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPart.union(rPart)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) :+
        col("__asof.v").as(s"asof_$valueCol"): _*)
  }

  val defs: Seq[QueryDef] = Seq(
    // ASOF1: for every click, the most recent view's value at-or-before it,
    // per user — the "trade against latest quote" shape on the events table.
    QueryDef("asof1_click_view",
      """WITH clicks AS (SELECT user_id, epoch_us(ts) AS us, event_id
        |               FROM events WHERE event_type = 'click'),
        |     views  AS (SELECT user_id, epoch_us(ts) AS us, value
        |               FROM events WHERE event_type = 'view')
        |SELECT c.event_id, c.user_id,
        |       CAST(floor(v.value * 100) AS BIGINT) AS last_view_v100
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND v.us <= c.us
        |ORDER BY c.event_id LIMIT 2000""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts_us", "value")
      asofJoin(clicks, views, key = "user_id", time = "ts_us", valueCol = "value")
        .select(col("event_id"), col("user_id"),
          floor(col("asof_value") * 100).cast("long").as("last_view_v100"))
        .orderBy("event_id").limit(2000)
    }
  )
}
