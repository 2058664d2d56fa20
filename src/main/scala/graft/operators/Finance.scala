package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Technical-indicator pack over resampled per-instrument bars — the
  * analytics a user of the reference (a stock engine, stockify.cu) runs
  * on top of its primitives. The reference ships the building blocks
  * (filters, rolling min/max/avg over one price series); these queries
  * compose them into the indicators practitioners actually chart: RSI,
  * max drawdown, cross-instrument return correlation, and ATR.
  *
  * Data model: the e7 bar derivation (event_type = ticker, hourly close =
  * rank-1 row in (ts, event_id) order, prices quantized to integer cents
  * via floor(value*100)). Every indicator then runs per instrument over
  * the bar series — the shuffle key is the instrument, so at 100 TB each
  * ticker's indicator builds independently (the w1-w12 partitioning
  * discipline; no single-series bottleneck anywhere).
  *
  * Exactness discipline (the w11/w12 playbook):
  *   - deltas, gains/losses, true ranges, running peaks are BIGINT cents;
  *   - ratios (RSI basis points, drawdown basis points, scaled ATR) are
  *     INTEGER divisions of non-negative BIGINTs — Spark `div` truncates
  *     toward zero, DuckDB `//` floors, identical on non-negatives;
  *   - correlation is computed from EXACT integer moment sums (n, Σx, Σy,
  *     Σxy, Σx², Σy²); the single float step is one sqrt + one division
  *     over those exact inputs, identical IEEE ops in both engines;
  *   - results are full-series checksums (count, sum, max, and a
  *     position-weighted mix that is transposition-sensitive), never
  *     row dumps — the f9/w9 discipline.
  */
object Finance {

  private val HourUs = 3600L * 1000000L

  /** Hourly OHLC bars per instrument in integer cents — the e5/e7 rank-1
    * open/close derivation, reduced to the columns the indicators need.
    * One shuffle on (instrument, bucket); high/low are plain aggregates,
    * close is the rank-1-descending row under the (ts_us, event_id)
    * total order. */
  def bars(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("ts_us"), col("event_id"),
        floor(col("value") * 100).cast("long").as("ck"))
      .withColumn("bkt", expr("ts_us div 3600000000").cast("long"))
    val desc = Window.partitionBy("event_type", "bkt")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    ev.withColumn("rn_d", row_number().over(desc))
      .groupBy("event_type", "bkt")
      .agg(max(when(col("rn_d") === 1, col("ck"))).as("close_ck"),
        max(col("ck")).as("high_ck"),
        min(col("ck")).as("low_ck"))
  }

  /** DuckDB twin of [[bars]] as a WITH-clause prefix. */
  private val barsSql =
    """WITH b AS (SELECT event_type, epoch_us(ts) // 3600000000 AS bkt,
      |                  epoch_us(ts) AS us, event_id,
      |                  CAST(floor(value * 100) AS BIGINT) AS ck
      |           FROM events),
      |r AS (SELECT event_type, bkt, ck,
      |             row_number() OVER (PARTITION BY event_type, bkt
      |                                ORDER BY us DESC, event_id DESC) AS rn_d
      |      FROM b),
      |bars AS (SELECT event_type, bkt,
      |                max(CASE WHEN rn_d = 1 THEN ck END) AS close_ck,
      |                max(ck) AS high_ck, min(ck) AS low_ck
      |         FROM r GROUP BY event_type, bkt)""".stripMargin

  private def byInst = Window.partitionBy("event_type").orderBy("bkt")

  /** Streaming twin of [[bars]]: the same hourly OHLC bars built
    * incrementally from a watermarked event stream. Streaming cannot run
    * the batch form's rank-1 window, so open/close come from
    * `min_by`/`max_by` under the SAME (ts_us, event_id) total order —
    * declarative aggregates the streaming engine folds per micro-batch
    * with bounded state (one row per open (instrument, hour) window;
    * the watermark closes and evicts them). StreamingSpec pins
    * bar-for-bar equality with the batch derivation, which makes this
    * the ingestion half of the indicator pipeline: bars stream into the
    * bar store continuously, fin1-fin5 run batch over the closed bars
    * (the standard lambda split — indicators need ordered history the
    * stream has already sealed). */
  def barsStream(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), col("ts"), col("ts_us"), col("event_id"),
        floor(col("value") * 100).cast("long").as("ck"))
      .groupBy(col("event_type"), window(col("ts"), "1 hour").as("w"))
      .agg(
        max_by(col("ck"), struct(col("ts_us"), col("event_id"))).as("close_ck"),
        max("ck").as("high_ck"), min("ck").as("low_ck"))
      .select(col("event_type"),
        expr("unix_micros(w.start) div 3600000000").as("bkt"),
        col("close_ck"), col("high_ck"), col("low_ck"))

  val defs: Seq[QueryDef] = Seq(

    // FIN1: 14-bar RSI (simple/Cutler form — window sums, not Wilder's
    // recursive smoothing, so the value is exactly representable).
    // rsi_bp = 10000·Σgains / (Σgains + Σlosses) over the trailing 14
    // deltas; only full-history rows with at least one move are scored
    // (rn ≥ 15 guarantees 14 non-null deltas; gain+loss > 0 guards the
    // division). The rn=1 row's NULL delta maps to 0 in both branches
    // via CASE (unknown comparison → ELSE), identically in both engines.
    QueryDef("fin1_rsi",
      s"""$barsSql,
        |d AS (SELECT event_type, bkt,
        |             close_ck - lag(close_ck) OVER w AS delta,
        |             row_number() OVER w AS rn
        |      FROM bars WINDOW w AS (PARTITION BY event_type ORDER BY bkt)),
        |g AS (SELECT event_type, rn,
        |             sum(CASE WHEN delta > 0 THEN delta ELSE 0 END) OVER w14 AS gain,
        |             sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END) OVER w14 AS loss
        |      FROM d WINDOW w14 AS (PARTITION BY event_type ORDER BY bkt
        |                            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |x AS (SELECT event_type, rn, gain * 10000 // (gain + loss) AS rsi_bp
        |      FROM g WHERE rn >= 15 AND gain + loss > 0)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(rsi_bp) AS BIGINT) AS s_rsi,
        |       CAST(max(rsi_bp) AS BIGINT) AS max_rsi,
        |       CAST(sum(((rn % 251) + 1) * rsi_bp) AS BIGINT) AS mix
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val w14 = byInst.rowsBetween(-13, 0)
      bars(s, dir)
        .withColumn("delta", col("close_ck") - lag("close_ck", 1).over(byInst))
        .withColumn("rn", row_number().over(byInst))
        .withColumn("gain",
          sum(when(col("delta") > 0, col("delta")).otherwise(0L)).over(w14))
        .withColumn("loss",
          sum(when(col("delta") < 0, -col("delta")).otherwise(0L)).over(w14))
        .filter(col("rn") >= 15 && col("gain") + col("loss") > 0)
        .withColumn("rsi_bp", expr("gain * 10000 div (gain + loss)"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("rsi_bp").as("s_rsi"),
          max("rsi_bp").as("max_rsi"),
          sum(((col("rn") % 251) + 1) * col("rsi_bp")).as("mix"))
        .orderBy("event_type")
    },

    // FIN2: maximum drawdown — running peak (an UNBOUNDED PRECEDING max,
    // the w7 cumulative-frame shape) and the per-bar drawdown in basis
    // points off it; the answer is max over the series, plus full-series
    // sum/mix checksums so the entire drawdown curve is certified, not
    // just its max. peak ≥ close_ck ≥ 0; peak > 0 guards the division
    // (prices are positive cents, but the guard keeps the contract total).
    QueryDef("fin2_max_drawdown",
      s"""$barsSql,
        |p AS (SELECT event_type, close_ck,
        |             max(close_ck) OVER (PARTITION BY event_type ORDER BY bkt
        |                                 ROWS UNBOUNDED PRECEDING) AS peak,
        |             row_number() OVER (PARTITION BY event_type ORDER BY bkt) AS rn
        |      FROM bars),
        |x AS (SELECT event_type, rn,
        |             (peak - close_ck) * 10000 // peak AS dd_bp
        |      FROM p WHERE peak > 0)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(max(dd_bp) AS BIGINT) AS max_dd_bp,
        |       CAST(sum(dd_bp) AS BIGINT) AS s_dd,
        |       CAST(sum(((rn % 251) + 1) * dd_bp) AS BIGINT) AS mix
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      bars(s, dir)
        .withColumn("peak",
          max("close_ck").over(byInst.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("rn", row_number().over(byInst))
        .filter(col("peak") > 0)
        .withColumn("dd_bp", expr("(peak - close_ck) * 10000 div peak"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), max("dd_bp").as("max_dd_bp"),
          sum("dd_bp").as("s_dd"),
          sum(((col("rn") % 251) + 1) * col("dd_bp")).as("mix"))
        .orderBy("event_type")
    },

    // FIN3: pairwise return correlation between instruments. Bar-over-bar
    // close deltas (integer cents) self-join on the bucket — the aligned
    // sample — for each unordered instrument pair. corr is derived from
    // EXACT BIGINT moment sums; num = n·Σxy − Σx·Σy is emitted raw (an
    // exact hash anchor), the correlation itself is one sqrt + one
    // division + round(6) over exact inputs. Scale: the join fan-out is
    // instruments² per bucket — instruments are a dimension (tickers),
    // so this is |bars|·k, never |bars|². The moment products stay under
    // 2^63 up to ~1e5 aligned bars of ±1e5-cent moves (n·Σx² ≲ 1e17);
    // the PLANS.md overflow moral applied at design time.
    QueryDef("fin3_return_corr",
      s"""$barsSql,
        |d AS (SELECT event_type, bkt,
        |             close_ck - lag(close_ck) OVER (PARTITION BY event_type
        |                                            ORDER BY bkt) AS r
        |      FROM bars),
        |rr AS (SELECT event_type, bkt, r FROM d WHERE r IS NOT NULL),
        |j AS (SELECT a.event_type AS ia, b.event_type AS ib,
        |             a.r AS x, b.r AS y
        |      FROM rr a JOIN rr b ON a.bkt = b.bkt AND a.event_type < b.event_type),
        |s AS (SELECT ia, ib, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |             CAST(sum(x * y) AS BIGINT) AS sxy,
        |             CAST(sum(x * x) AS BIGINT) AS sxx,
        |             CAST(sum(y * y) AS BIGINT) AS syy
        |      FROM j GROUP BY ia, ib)
        |SELECT ia, ib, n, CAST(n * sxy - sx * sy AS BIGINT) AS num,
        |       CAST(round((n * sxy - sx * sy) /
        |                  sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |                       CAST(n * syy - sy * sy AS DOUBLE)), 6) AS DOUBLE) AS corr
        |FROM s
        |WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |ORDER BY ia, ib""".stripMargin) { (s, dir) =>
      val d = bars(s, dir)
        .withColumn("r", col("close_ck") - lag("close_ck", 1).over(byInst))
        .filter(col("r").isNotNull)
        .select(col("event_type"), col("bkt"), col("r"))
      val j = d.as("a").join(d.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("ia"), col("b.event_type").as("ib"),
          col("a.r").as("x"), col("b.r").as("y"))
      j.groupBy("ia", "ib")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        // degenerate pairs (n=1, or constant deltas on either side) have a
        // zero variance denominator: Spark's non-ANSI 0/0 is NULL, DuckDB's
        // is NaN — drop them so the contract stays total AND cross-engine
        .filter(col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
          col("n") * col("syy") - col("sy") * col("sy") > 0)
        .select(col("ia"), col("ib"), col("n"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
            .cast("double").as("corr"))
        .orderBy("ia", "ib")
    },

    // FIN4: 14-bar ATR. True range folds the overnight gap into the bar
    // range — greatest(high−low, |high−prev_close|, |low−prev_close|),
    // all BIGINT cents; the trailing window average uses the w1 integer
    // form (×100 before the integer divide → centicents). The head of
    // each series uses the standard shrinking frame (n14 < 14), counted
    // by the frame itself so both engines agree. rn is the 2-based bar
    // ordinal (rn=1 has no prev_close and is dropped before windowing —
    // the frames of BOTH engines then see identical row sets).
    QueryDef("fin4_atr",
      s"""$barsSql,
        |t AS (SELECT event_type, bkt, high_ck, low_ck,
        |             lag(close_ck) OVER w AS pc,
        |             row_number() OVER w AS rn
        |      FROM bars WINDOW w AS (PARTITION BY event_type ORDER BY bkt)),
        |tr AS (SELECT event_type, bkt, rn,
        |              greatest(high_ck - low_ck, abs(high_ck - pc),
        |                       abs(low_ck - pc)) AS tr
        |       FROM t WHERE pc IS NOT NULL),
        |a AS (SELECT event_type, rn,
        |             sum(tr) OVER w14 AS s14, count(*) OVER w14 AS n14
        |      FROM tr WINDOW w14 AS (PARTITION BY event_type ORDER BY bkt
        |                             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |x AS (SELECT event_type, rn, s14 * 100 // n14 AS atr_cc FROM a)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(atr_cc) AS BIGINT) AS s_atr,
        |       CAST(max(atr_cc) AS BIGINT) AS max_atr,
        |       CAST(sum(((rn % 251) + 1) * atr_cc) AS BIGINT) AS mix
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val w14 = byInst.rowsBetween(-13, 0)
      bars(s, dir)
        .withColumn("pc", lag("close_ck", 1).over(byInst))
        .withColumn("rn", row_number().over(byInst))
        .filter(col("pc").isNotNull)
        .withColumn("tr", greatest(col("high_ck") - col("low_ck"),
          abs(col("high_ck") - col("pc")), abs(col("low_ck") - col("pc"))))
        .withColumn("s14", sum("tr").over(w14))
        .withColumn("n14", count(lit(1)).over(w14))
        .withColumn("atr_cc", expr("s14 * 100 div n14"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("atr_cc").as("s_atr"),
          max("atr_cc").as("max_atr"),
          sum(((col("rn") % 251) + 1) * col("atr_cc")).as("mix"))
        .orderBy("event_type")
    },

    // FIN5: robust outlier detection — median/MAD flagging of bar moves
    // (|Δ − med| > 3·MAD), the anomaly screen quality pipelines run on
    // any metric stream. Median is the LOWER median (the value at sorted
    // position (n+1)÷2): an integer ELEMENT of the data, not an
    // interpolated float, so med, MAD, and every flag are exact BIGINTs
    // in both engines; ties inside row_number don't matter because
    // position k of a sorted MULTISET yields the same value under any
    // tie order. Per-instrument sort is the exact form (the 100 TB form
    // swaps in the one-pass approx_percentile sketch, the cur7/a11
    // trade); med/MAD join back as a broadcast of one row per
    // instrument. The outlier mix checksum is position×value weighted,
    // so the hash certifies WHICH bars flagged, not just how many.
    QueryDef("fin5_robust_outliers",
      s"""$barsSql,
        |d AS (SELECT event_type, bkt,
        |             close_ck - lag(close_ck) OVER (PARTITION BY event_type
        |                                            ORDER BY bkt) AS r
        |      FROM bars),
        |dd AS (SELECT event_type, r,
        |              row_number() OVER (PARTITION BY event_type ORDER BY bkt) AS rnt
        |       FROM d WHERE r IS NOT NULL),
        |m AS (SELECT event_type, r AS med FROM (
        |        SELECT event_type, r,
        |               row_number() OVER (PARTITION BY event_type ORDER BY r) AS rv,
        |               count(*) OVER (PARTITION BY event_type) AS nn
        |        FROM dd) WHERE rv = (nn + 1) // 2),
        |a AS (SELECT dd.event_type, rnt, r, med, abs(r - med) AS ad
        |      FROM dd JOIN m ON dd.event_type = m.event_type),
        |mm AS (SELECT event_type, ad AS mad FROM (
        |        SELECT event_type, ad,
        |               row_number() OVER (PARTITION BY event_type ORDER BY ad) AS rv,
        |               count(*) OVER (PARTITION BY event_type) AS nn
        |        FROM a) WHERE rv = (nn + 1) // 2),
        |x AS (SELECT a.event_type, rnt, r, med, ad, mad
        |      FROM a JOIN mm ON a.event_type = mm.event_type)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(max(med) AS BIGINT) AS med, CAST(max(mad) AS BIGINT) AS mad,
        |       CAST(sum(CASE WHEN ad > 3 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
        |       CAST(sum(CASE WHEN ad > 3 * mad THEN ((rnt % 251) + 1) * r ELSE 0 END) AS BIGINT) AS mix
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val byVal = Window.partitionBy("event_type").orderBy("r")
      val byAd = Window.partitionBy("event_type").orderBy("ad")
      val byType = Window.partitionBy("event_type")
      val dd = bars(s, dir)
        .withColumn("r", col("close_ck") - lag("close_ck", 1).over(byInst))
        .filter(col("r").isNotNull)
        // rnt AFTER the null filter so positions are 1..n like the oracle's
        .withColumn("rnt", row_number().over(byInst))
      val med = dd
        .withColumn("rv", row_number().over(byVal))
        .withColumn("nn", count(lit(1)).over(byType))
        .filter(col("rv") === expr("(nn + 1) div 2")) // div: long `/` is float
        .select(col("event_type"), col("r").as("med"))
      val a = dd.join(broadcast(med), "event_type")
        .withColumn("ad", abs(col("r") - col("med")))
      val mad = a
        .withColumn("rv", row_number().over(byAd))
        .withColumn("nn", count(lit(1)).over(byType))
        .filter(col("rv") === expr("(nn + 1) div 2"))
        .select(col("event_type"), col("ad").as("mad"))
      a.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), max("med").as("med"), max("mad").as("mad"),
          sum(when(col("ad") > col("mad") * 3, 1L).otherwise(0L)).as("n_out"),
          sum(when(col("ad") > col("mad") * 3,
            ((col("rnt") % 251) + 1) * col("r")).otherwise(0L)).as("mix"))
        .orderBy("event_type")
    }
  )
}
