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
  * Effectively-once: each fold is tagged, and the set of folded tags
  * rides INSIDE the store directory (`_folded_tags`, a non-data `_`
  * file Spark's parquet reader ignores), written into the replacement
  * BEFORE the atomic swap — so the tag set commits in the SAME atomic
  * move as the data it describes. A crash anywhere before the move
  * leaves the old store AND old tag set (the retry re-folds into the
  * pre-swap store: one copy); a crash after the move leaves the new
  * store WITH its tag (the retry is a no-op): there is no window where
  * data and marker disagree — the gap a post-swap sidecar marker would
  * have (caught in review: a crash between swap and marker would
  * double-count the batch on retry).
  */
object Rollup {

  private val DayUs = 86400L * 1000000L

  private def tagsFile(dir: String) = java.nio.file.Paths.get(dir, "_folded_tags")

  /** Tags already folded into the store at `dir` (empty for no store). */
  def foldedTags(dir: String): Set[String] =
    if (java.nio.file.Files.exists(tagsFile(dir)))
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(tagsFile(dir))).asScala.toSet
    else Set.empty

  private def writeTags(dir: String, tags: Set[String]): Unit =
    java.nio.file.Files.write(tagsFile(dir),
      scala.jdk.CollectionConverters.SeqHasAsJava(tags.toSeq.sorted).asJava,
      java.nio.charset.StandardCharsets.UTF_8)

  /** Aggregate a raw events batch to the store grain. */
  def grain(batch: DataFrame): DataFrame =
    batch
      .select(col("event_type"),
        expr(s"ts_us div $DayUs").as("day"),
        floor(col("value") * 100).cast("long").as("ck"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), sum("ck").as("s_ck"),
        min("ck").as("mn"), max("ck").as("mx"))

  /** Fold one tagged batch of raw events into the store at `storeDir`.
    * Returns false when the tag was already folded (replay no-op). */
  def fold(s: SparkSession, storeDir: String, batch: DataFrame, tag: String): Boolean = {
    require(tag.matches("[A-Za-z0-9_-]+"), s"unsafe fold tag: $tag")
    Compaction.recoverSwap(storeDir)
    val prevTags = foldedTags(storeDir)
    if (prevTags(tag)) return false
    val b = grain(batch)
    if (!new java.io.File(storeDir).exists()) {
      val tmp = storeDir + ".rollup-tmp"
      b.write.mode("overwrite").parquet(tmp)
      writeTags(tmp, Set(tag)) // rides the same atomic move as the data
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
        java.nio.file.Paths.get(storeDir),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      s.catalog.refreshByPath(storeDir)
    } else {
      val cur = s.read.parquet(storeDir)
      Compaction.swapInPlace(s, storeDir, "rollup") { tmp =>
        cur.unionByName(b)
          .groupBy("event_type", "day")
          .agg(sum("n").as("n"), sum("s_ck").as("s_ck"),
            min("mn").as("mn"), max("mx").as("mx"))
          .write.mode("overwrite").parquet(tmp)
        // the grown tag set commits WITH the data in swapInPlace's
        // atomic move — no post-commit marker window
        writeTags(tmp, prevTags + tag)
      }
    }
    true
  }

  val defs: Seq[QueryDef] = Seq(
    // S9: the store, built by folding three deterministic day-sliced
    // batches IN SEQUENCE (day mod 3), must equal the from-scratch
    // aggregate the oracle computes directly over events — certifying
    // fold ≡ recompute through the hash gate. The fixture store is
    // rebuilt fresh per run (idempotence across Verify/Bench reruns);
    // within the run, the replay of batch 0 exercises the marker path.
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
      val store = s"/root/repo/target/graft-maint/${new java.io.File(dir).getName}/rollup-store"
      // fresh store per run: the query's meaning is "fold the full
      // history in batches", not "fold on top of a previous run"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
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
      s.read.parquet(store)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("n").as("n_events"),
          sum("s_ck").as("total_ck"), min("mn").as("mn"), max("mx").as("mx"),
          sum(((col("day") % 251) + 1) * col("n")).as("mix"))
        .orderBy("event_type")
    }
  )
}
