package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Domain invariants of the technical-indicator pack (fin1-fin4). The
  * cross-engine hash gate certifies exact values; these pin the properties
  * a wrong-but-consistent implementation could still violate. */
class FinanceSpec extends SparkSpec {

  private lazy val barsDf = Finance.bars(spark, sf).cache()

  test("bars: close within [low, high], one row per (instrument, bucket)") {
    val n = barsDf.count()
    assert(n > 0)
    assert(barsDf.select("event_type", "bkt").distinct().count() === n)
    assert(barsDf.filter(
      col("close_ck") > col("high_ck") || col("close_ck") < col("low_ck"))
      .count() === 0)
  }

  test("fin1: RSI basis points stay in [0, 10000]") {
    val rows = Finance.defs.find(_.name == "fin1_rsi").get.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val s = r.getAs[Long]("s_rsi")
      val mx = r.getAs[Long]("max_rsi")
      assert(n > 0 && mx >= 0 && mx <= 10000)
      assert(s >= 0 && s <= n * 10000, s"mean RSI out of range: s=$s n=$n")
    }
  }

  test("fin2: drawdown equals a driver-side sequential recomputation") {
    val rows = Finance.defs.find(_.name == "fin2_max_drawdown").get.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mx = r.getAs[Long]("max_dd_bp")
      assert(mx >= 0 && mx < 10000)
    }
    // independent recomputation: fold each instrument's bar series IN
    // ORDER on the driver (no window functions — a different computation
    // path than the engine's running-max plan), deriving the same
    // (n, max_dd, s_dd, mix) aggregate per instrument
    val series = barsDf.select("event_type", "bkt", "close_ck").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toVector).toMap
    val expected = series.map { case (inst, closes) =>
      var peak = 0L
      var rn = 0L
      var n = 0L; var maxDd = 0L; var sDd = 0L; var mix = 0L
      closes.foreach { c =>
        peak = math.max(peak, c)
        rn += 1 // row_number over ALL bars, matching the engine's rn
        if (peak > 0) {
          val dd = (peak - c) * 10000 / peak
          n += 1; maxDd = math.max(maxDd, dd); sDd += dd
          mix += ((rn % 251) + 1) * dd
        }
      }
      inst -> (n, maxDd, sDd, mix)
    }
    assert(rows.map(_.getAs[String]("event_type")).toSet === expected.keySet)
    rows.foreach { r =>
      val want = expected(r.getAs[String]("event_type"))
      val got = (r.getAs[Long]("n"), r.getAs[Long]("max_dd_bp"),
        r.getAs[Long]("s_dd"), r.getAs[Long]("mix"))
      assert(got === want, s"drawdown mismatch for ${r.getAs[String]("event_type")}")
    }
  }

  test("fin3: correlation in [-1, 1], pairs are ordered and unique") {
    val rows = Finance.defs.find(_.name == "fin3_return_corr").get.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getAs[String]("ia"), r.getAs[String]("ib")))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length === pairs.length)
    rows.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(!c.isNaN && c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"corr out of range: $c")
    }
  }

  test("fin3: every emitted correlation matches an independent driver-side Pearson") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("bkt")
    // raw aligned series per instrument, keyed by bucket
    val deltas = barsDf
      .withColumn("r", col("close_ck") - lag("close_ck", 1).over(w))
      .filter(col("r").isNotNull)
      .select("event_type", "bkt", "r").collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    val got = Finance.defs.find(_.name == "fin3_return_corr").get.run(spark, sf)
      .collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      val (ia, ib) = (row.getAs[String]("ia"), row.getAs[String]("ib"))
      val joint = deltas(ia).keySet.intersect(deltas(ib).keySet).toSeq.sorted
      val xs = joint.map(deltas(ia)).map(_.toDouble)
      val ys = joint.map(deltas(ib)).map(_.toDouble)
      val n = xs.length.toDouble
      val num = n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum
      val den = math.sqrt((n * xs.map(x => x * x).sum - xs.sum * xs.sum) *
        (n * ys.map(y => y * y).sum - ys.sum * ys.sum))
      val want = num / den
      assert(row.getAs[Long]("n") === joint.length.toLong)
      assert(math.abs(row.getAs[Double]("corr") - want) < 1e-6,
        s"pair ($ia,$ib): query ${row.getAs[Double]("corr")} vs reference $want")
    }
  }

  test("fin5: median/MAD match a driver-side reference; flags are consistent") {
    import org.apache.spark.sql.expressions.Window
    val rows = Finance.defs.find(_.name == "fin5_robust_outliers").get.run(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows.nonEmpty)
    // driver-side reference for one instrument: lower median + MAD + flags
    val w = Window.partitionBy("event_type").orderBy("bkt")
    val deltas = barsDf
      .withColumn("r", col("close_ck") - lag("close_ck", 1).over(w))
      .filter(col("r").isNotNull && col("event_type") === "click")
      .orderBy("bkt").collect().map(_.getAs[Long]("r"))
    def lowerMedian(xs: Array[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
    val med = lowerMedian(deltas)
    val mad = lowerMedian(deltas.map(d => math.abs(d - med)))
    val got = rows("click")
    assert(got.getAs[Long]("med") === med)
    assert(got.getAs[Long]("mad") === mad)
    assert(got.getAs[Long]("n") === deltas.length)
    val expOut = deltas.count(d => math.abs(d - med) > 3 * mad)
    assert(got.getAs[Long]("n_out") === expOut)
    rows.values.foreach(r =>
      assert(r.getAs[Long]("n_out") <= r.getAs[Long]("n")))
  }

  test("plan pin: fin1 runs exactly two hash exchanges (bars bucket + instrument window)") {
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      // the suite-level barsDf cache would swap an InMemoryTableScan into
      // this plan (and change its exchange layout) — pin the fresh path
      spark.catalog.clearCache()
      val plan = Finance.defs.find(_.name == "fin1_rsi").get.run(spark, sf)
        .queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles === 2,
        s"fin1 must shuffle once on (instrument,bucket) and once on instrument:\n$plan")
    }
  }

  test("fin4: ATR dominates the plain high-low range average") {
    // tr = greatest(high-low, |high-pc|, |low-pc|) >= high-low per bar, so the
    // windowed ATR mean must be >= the same window's mean of (high-low)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("bkt")
    val w14 = w.rowsBetween(-13, 0)
    val t = barsDf
      .withColumn("pc", lag("close_ck", 1).over(w))
      .filter(col("pc").isNotNull)
      .withColumn("tr", greatest(col("high_ck") - col("low_ck"),
        abs(col("high_ck") - col("pc")), abs(col("low_ck") - col("pc"))))
      .withColumn("hl", col("high_ck") - col("low_ck"))
      .withColumn("atr", expr("100 * sum(tr) over (partition by event_type order by bkt rows between 13 preceding and current row) div count(*) over (partition by event_type order by bkt rows between 13 preceding and current row)"))
      .withColumn("hlavg", sum("hl").over(w14) * 100 / count(lit(1)).over(w14))
    assert(t.filter(col("atr") < col("hlavg") - 100).count() === 0)
    assert(t.filter(col("tr") < col("hl")).count() === 0)
  }
}
