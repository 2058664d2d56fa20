package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("as-of join picks the latest right row at-or-before each left time, per key") {
    import spark.implicits._
    val quotes = Seq( // (key, time, value)
      (1L, 10L, 100.0), (1L, 20L, 110.0), (1L, 30L, 120.0),
      (2L, 15L, 200.0)
    ).toDF("k", "t", "v")
    val trades = Seq( // (key, time, id)
      (1L, 5L, "a"),   // before any quote -> null
      (1L, 10L, "b"),  // simultaneous quote counts (at-or-before)
      (1L, 25L, "c"),  // between 20 and 30 -> 110
      (1L, 99L, "d"),  // after all -> 120
      (2L, 16L, "e"),  // other key -> 200
      (3L, 50L, "f")   // key with no quotes -> null
    ).toDF("k", "t", "id")
    val got = AsOfJoin.asofJoin(trades, quotes, "k", "t", "v")
      .select("id", "asof_v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got === Map(
      "a" -> None, "b" -> Some(100.0), "c" -> Some(110.0),
      "d" -> Some(120.0), "e" -> Some(200.0), "f" -> None))
  }

  test("as-of join matches the latest right ROW even when its value is NULL") {
    import spark.implicits._
    // quote at t=20 has a NULL value: as-of semantics (and DuckDB's ASOF
    // JOIN) attach THAT row's NULL, not the older non-null quote at t=10
    val quotes = Seq(
      (1L, 10L, Some(100.0)), (1L, 20L, None), (1L, 30L, Some(120.0))
    ).toDF("k", "t", "v")
    val trades = Seq((1L, 25L, "x"), (1L, 35L, "y")).toDF("k", "t", "id")
    val got = AsOfJoin.asofJoin(trades, quotes, "k", "t", "v")
      .select("id", "asof_v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got === Map("x" -> None, "y" -> Some(120.0)))
  }

  test("as-of tolerance: stale matches null out; huge tolerance == no tolerance; zero keeps simultaneous only") {
    import spark.implicits._
    val quotes = Seq((1L, 10L, 100.0), (1L, 20L, 110.0)).toDF("k", "t", "v")
    val trades = Seq((1L, 10L, "sim"), (1L, 24L, "near"), (1L, 90L, "far"))
      .toDF("k", "t", "id")
    def run(tol: Option[Long]) =
      AsOfJoin.asofJoin(trades, quotes, "k", "t", "v", tol)
        .collect().map(r => r.getString(2) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // tol=5: the simultaneous quote (age 0) and the age-4 match stay,
    // the age-70 match nulls out
    assert(run(Some(5L)) === Map("sim" -> Some(100.0), "near" -> Some(110.0), "far" -> None))
    // tol=0 keeps only the simultaneous match
    assert(run(Some(0L)) === Map("sim" -> Some(100.0), "near" -> None, "far" -> None))
    // a tolerance beyond the data span degenerates to the plain as-of
    assert(run(Some(1000000L)) === run(None))
  }

  test("as-of join keeps every left row exactly once (left-join cardinality)") {
    val ev = graft.sources.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_us")
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts_us", "value")
    val joined = AsOfJoin.asofJoin(clicks, views, "user_id", "ts_us", "value")
    assert(joined.count() === clicks.count())
    assert(joined.select("event_id").distinct().count() === clicks.count())
  }

  test("as-of plan shuffles once on the key, no single-partition stage") {
    val ev = graft.sources.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_us")
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts_us", "value")
    val plan = AsOfJoin.asofJoin(clicks, views, "user_id", "ts_us", "value")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(user_id"), s"plan:\n$plan")
    assert(!plan.contains("SinglePartition"), s"plan:\n$plan")
  }
}
