package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate-store maintenance — the lakehouse rollup
  * pattern: a small per-(instrument, day) metrics table kept current by
  * FOLDING each arriving batch into it, instead of recomputing the
  * aggregate over the whole history. At 100 TB this is the difference
  * between touching one day's events and re-scanning years.
  *
  * The store carries only MERGEABLE metrics (count, sum, min, max) so a
  * fold is a re-aggregation of store ∪ batch-aggregate — associative and
  * commutative, which RollupSpec exploits to pin fold-order
  * independence. (Exact distincts are deliberately NOT here: they don't
  * merge; the mergeable-sketch form is e11's HLL territory.)
  *
  * Effectively-once and crash safety are STRUCTURAL, not hand-rolled: the
  * store is a [[TxLog]] table and each fold is one `TxLog.foldOnce`
  * commit, whose tag rides in the same atomic manifest publish as the
  * folded data. A crash anywhere leaves either the old manifest (retry
  * re-folds: one copy) or the new manifest with its tag (retry no-ops) —
  * and unlike the directory-swap discipline this replaced, CONCURRENT
  * folders are safe: the CAS loser re-reads the winner's tag set and
  * retries against fresh state. Readers go through [[TxLog.read]] and
  * get snapshot isolation for free.
  */
object Rollup {

  private val DayUs = 86400L * 1000000L

  /** Tags already folded into the store at `dir` (empty for no store) —
    * the store's txlog note set. */
  def foldedTags(dir: String): Set[String] =
    // TAGS only: `kv:` notes are table properties (e.g. the change-feed
    // attribution markers every overwrite commit carries), not fold tags
    TxLog.snapshot(dir).map(_.notes.filterNot(_.startsWith("kv:")))
      .getOrElse(Set.empty)

  /** Aggregate a raw events batch to the store grain. */
  def grain(batch: DataFrame): DataFrame =
    batch
      .select(col("event_type"),
        expr(s"ts_us div $DayUs").as("day"),
        floor(col("value") * 100).cast("long").as("ck"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), sum("ck").as("s_ck"),
        min("ck").as("mn"), max("ck").as("mx"))

  /** Merge the current store with one batch-grain — the mergeable-metric
    * re-aggregation (associative + commutative). */
  private def mergeGrain(cur: DataFrame, b: DataFrame): DataFrame =
    cur.unionByName(b)
      .groupBy("event_type", "day")
      .agg(sum("n").as("n"), sum("s_ck").as("s_ck"),
        min("mn").as("mn"), max("mx").as("mx"))

  /** A store written by the pre-txlog format (parquet + `_folded_tags`
    * sidecar) must not be silently shadowed: foldOnce would init a v1
    * manifest over the directory, hiding all previously folded data and
    * re-folding replayed tags. Refuse loudly; the migration is a
    * one-time rebuild (or adopt + re-tagging) the operator must choose.
    * Guards EVERY fold entry point ([[fold]] and [[foldHll]]). */
  private def refuseLegacyStore(storeDir: String): Unit =
    require(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(storeDir, "_folded_tags")) ||
        TxLog.snapshot(storeDir).isDefined,
      s"rollup store $storeDir uses the legacy _folded_tags format — " +
        "rebuild it (or adopt + re-tag) before folding through the txlog")

  /** Fold one tagged batch of raw events into the store at `storeDir`.
    * Returns false when the tag was already folded (replay no-op). */
  def fold(s: SparkSession, storeDir: String, batch: DataFrame, tag: String): Boolean = {
    refuseLegacyStore(storeDir)
    TxLog.foldOnce(s, storeDir, tag, {
      case None => grain(batch)
      case Some(cur) => mergeGrain(cur, grain(batch))
    })
  }

  /** Sketch-store grain: one DataSketches HLL per (instrument, day) —
    * the MERGEABLE form of a distinct count. Exact distincts don't fold
    * (yesterday's count + today's count ≠ the union's count); the sketch
    * does, via `hll_union_agg`, which is what lets a 100 TB store answer
    * "distinct users per instrument" incrementally — one batch folded per
    * day, never a recompute over the history. */
  def grainHll(batch: DataFrame): DataFrame =
    batch.groupBy(col("event_type"), expr(s"ts_us div $DayUs").as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("hll"),
        count(lit(1)).as("n"))

  private def mergeGrainHll(cur: DataFrame, b: DataFrame): DataFrame =
    cur.unionByName(b)
      .groupBy("event_type", "day")
      .agg(expr("hll_union_agg(hll)").as("hll"), sum("n").as("n"))

  /** Fold one tagged batch into the HLL sketch store (same txlog
    * effectively-once discipline and legacy-store refusal as [[fold]]). */
  def foldHll(s: SparkSession, storeDir: String, batch: DataFrame, tag: String): Boolean = {
    refuseLegacyStore(storeDir)
    TxLog.foldOnce(s, storeDir, tag, {
      case None => grainHll(batch)
      case Some(cur) => mergeGrainHll(cur, grainHll(batch))
    })
  }

  val defs: Seq[QueryDef] = Seq(
    // S13: the mergeable-sketch store under the gate — distinct users
    // per instrument from a store folded in three batches. The oracle
    // states the EXACT values (row counts, day counts, exact distinct
    // users) plus TRUE for the sketch verdict; the engine emits its own
    // exact values (hash-matched) and certifies the folded sketches
    // estimate within 5% of truth (the a8/t9 sketch-verdict pattern —
    // raw estimates are engine-specific, the error envelope is not).
    QueryDef("s13_rollup_distinct_sketch",
      """WITH g AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |             user_id
        |           FROM events)
        |SELECT event_type,
        |       CAST(count(DISTINCT day) AS BIGINT) AS n_days,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       TRUE AS sketch_within_5pct
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val store = TxLog.freshRoot(dir, "rollup-hll")
      val ev = Tables.events(s, dir)
      def slice(r: Int) = ev.filter(expr(s"ts_us div $DayUs") % 3 === r)
      (0 to 2).foreach { r =>
        require(foldHll(s, store, slice(r), s"slice-$r"),
          s"slice-$r unexpectedly marked folded in a fresh store")
      }
      require(!foldHll(s, store, slice(0), "slice-0"), "replayed sketch batch folded twice")
      val est = TxLog.read(s, store)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("n").as("n_events"),
          expr("hll_sketch_estimate(hll_union_agg(hll))").as("est_users"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct("user_id").as("exact_users"))
      est.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_days").cast("long"),
          col("n_events").cast("long"), col("exact_users").cast("long"),
          (abs(col("est_users") - col("exact_users")) <=
            col("exact_users") * 0.05).as("sketch_within_5pct"))
        .orderBy("event_type")
    },

    // S9: the store, built by folding three deterministic day-sliced
    // batches IN SEQUENCE (day mod 3), must equal the from-scratch
    // aggregate the oracle computes directly over events — certifying
    // fold ≡ recompute through the hash gate. The fixture store is
    // rebuilt fresh per run (idempotence across Verify/Bench reruns);
    // within the run, the replay of batch 0 exercises the tag path.
    QueryDef("s9_incremental_rollup",
      """WITH g AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |             count(*) AS n,
        |             sum(CAST(floor(value * 100) AS BIGINT)) AS s_ck,
        |             min(CAST(floor(value * 100) AS BIGINT)) AS mn,
        |             max(CAST(floor(value * 100) AS BIGINT)) AS mx
        |           FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(sum(n) AS BIGINT) AS n_events,
        |       CAST(sum(s_ck) AS BIGINT) AS total_ck,
        |       CAST(min(mn) AS BIGINT) AS mn, CAST(max(mx) AS BIGINT) AS mx,
        |       CAST(sum(((day % 251) + 1) * n) AS BIGINT) AS mix
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      // fresh store per run: the query's meaning is "fold the full
      // history in batches", not "fold on top of a previous run"
      val store = TxLog.freshRoot(dir, "rollup-store")
      val ev = Tables.events(s, dir)
      (0 to 2).foreach { r =>
        val folded = fold(s, store,
          ev.filter(expr(s"ts_us div $DayUs") % 3 === r), s"slice-$r")
        require(folded, s"slice-$r unexpectedly marked folded in a fresh store")
      }
      // replay of slice-0 must be a no-op (the effectively-once contract)
      require(!fold(s, store,
        ev.filter(expr(s"ts_us div $DayUs") % 3 === 0), "slice-0"),
        "replayed batch was folded twice")
      TxLog.read(s, store)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("n").as("n_events"),
          sum("s_ck").as("total_ck"), min("mn").as("mn"), max("mx").as("mx"),
          sum(((col("day") % 251) + 1) * col("n")).as("mix"))
        .orderBy("event_type")
    }
  )
}
