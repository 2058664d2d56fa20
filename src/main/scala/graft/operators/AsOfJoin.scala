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
      key: String, time: String, valueCol: String,
      tolerance: Option[Long] = None): DataFrame = {
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
    // tolerance: the match must also be RECENT — a right row older than
    // time − tol yields NULL (staleness bound: "trade against the latest
    // quote, unless it's too stale"). The kernel is unchanged; only the
    // final projection tests the matched row's own timestamp, so the
    // semantics stay "nearest-before, then bound" — NOT "nearest within
    // bound re-searched", which is the same thing for at-or-before
    // matches (anything older is even staler).
    val matched = tolerance match {
      case Some(tol) =>
        when(col("__asof.t") >= col(time) - tol, col("__asof.v"))
      case None => col("__asof.v")
    }
    lPart.union(rPart)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) :+
        matched.as(s"asof_$valueCol"): _*)
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
    },

    // ASOF2: as-of with a STALENESS TOLERANCE (1 hour) — the real
    // trading/sensor semantics: the latest view still counts only if it
    // is recent enough, else NULL. The oracle composes DuckDB's native
    // ASOF with the same bound as a CASE, which is semantically identical
    // because any match older than the nearest-before one is staler.
    QueryDef("asof2_click_view_tol",
      """WITH clicks AS (SELECT user_id, epoch_us(ts) AS us, event_id
        |               FROM events WHERE event_type = 'click'),
        |     views  AS (SELECT user_id, epoch_us(ts) AS us, value
        |               FROM events WHERE event_type = 'view')
        |SELECT c.event_id, c.user_id,
        |       CAST(floor(CASE WHEN v.us >= c.us - 3600000000 THEN v.value END * 100) AS BIGINT) AS last_view_v100
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND v.us <= c.us
        |ORDER BY c.event_id LIMIT 2000""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts_us", "value")
      asofJoin(clicks, views, key = "user_id", time = "ts_us",
        valueCol = "value", tolerance = Some(3600000000L))
        .select(col("event_id"), col("user_id"),
          floor(col("asof_value") * 100).cast("long").as("last_view_v100"))
        .orderBy("event_id").limit(2000)
    }
  )
}
