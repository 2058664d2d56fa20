package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash signature index for INCREMENTAL near-dedup — the
  * production shape document dedup actually runs in: the corpus is
  * deduplicated once, and every NEW crawl batch is checked against the
  * existing corpus without recomputing it (the d3 pipeline recomputes
  * everything per run; this is its build-once/probe-many sibling, the
  * dedup analog of IvfIndex's ANN split).
  *
  * On-disk layout under `<idx>/`:
  *   - `bands/`    (doc_id, band, bh) — LSH bucket membership,
  *                 partitionBy(band) (16 directories; a probe's candidate
  *                 join is keyed on (band, bh) and each band directory
  *                 joins independently)
  *   - `postings/` (doc_id, g) — the distinct shingles backing the EXACT
  *                 Jaccard verification of candidates (the honest index
  *                 cost: linear in corpus shingles; only candidate docs'
  *                 postings are ever read back thanks to a semi-join)
  *   - `meta/`     indexed-doc count — the staleness key (same contract
  *                 as IvfIndex: testdata is deterministic per sf, so
  *                 count suffices; production would version snapshots)
  *
  * Probe scale shape: new-batch shingles/signatures are computed once
  * (narrow, batch-sized); the candidate join is keyed on (band, bh) —
  * O(batch·bands) rows against the persisted buckets, never corpus ×
  * batch; verification touches only candidate documents' postings
  * (left-semi pushdown into the postings scan), and the exact-Jaccard
  * join is bounded by candidate postings. Append folds a new batch into
  * the same layout with a disjoint-id assertion (appendIvf's contract).
  */
object SigIndex {

  private def pathFor(sfDir: String): String =
    s"${IvfIndex.DefaultRoot}/sig-" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")

  private val buildLock = new Object

  // explicit read schemas: an index built over an EMPTY corpus writes only
  // _SUCCESS markers (partitionBy with zero rows emits no files), and a
  // schema-inferring read would throw UNABLE_TO_INFER_SCHEMA on probe
  import org.apache.spark.sql.types._
  private val bandsSchema = StructType(Seq(StructField("doc_id", LongType),
    StructField("bh", LongType), StructField("band", IntegerType)))
  private val postingsSchema = StructType(Seq(StructField("doc_id", LongType),
    StructField("g", StringType)))

  private def writeMetaCount(s: SparkSession, n: Long, idx: String): Unit =
    s.range(1).select(lit(n).as("n"))
      .write.mode("overwrite").parquet(s"$idx/meta")

  private def isFresh(old: DataFrame, idx: String): Boolean =
    new java.io.File(s"$idx/meta").isDirectory && {
      try old.sparkSession.read.parquet(s"$idx/meta")
        .collect()(0).getAs[Long]("n") == old.count()
      catch { case _: Exception => false }
    }

  /** Build the signature index over `docs` (replacing any prior index).
    * Bands are clustered on the band key before the partitioned write so
    * each `band=k` directory gets ONE file per commit instead of one per
    * shuffle task — the file count a probe must list and open grows with
    * commits, not with commits × tasks. (A single huge band file at
    * extreme scale is the writer's `maxRecordsPerFile` knob, not ours.) */
  def build(docs: DataFrame, idx: String, note: String = ""): Unit = {
    val sh = Dedup.shingles(docs).cache()
    try {
      sh.write.mode("overwrite").parquet(s"$idx/postings")
      Dedup.signatureBands(Dedup.minhashSignature(sh))
        .repartition(col("band"))
        .write.mode("overwrite").partitionBy("band").parquet(s"$idx/bands")
      writeMetaCount(docs.sparkSession, docs.count(), idx)
      IndexCommit.reset(idx, note) // rebuild overwrote the data: fresh history
    } finally sh.unpersist()
  }

  /** Fold a new batch into the index. Precondition (asserted): the batch's
    * doc_ids are disjoint from the indexed corpus — re-appending an
    * indexed document would double its buckets and postings. Cross-process
    * safety is [[IndexCommit]]'s optimistic claim (appendIvf's contract):
    * of two racing drivers exactly one writes; the stale one aborts with
    * ConcurrentModificationException before touching any data file. */
  def append(newDocs: DataFrame, idx: String, note: String = ""): Unit = {
    val s = newDocs.sparkSession
    require(IndexCommit.unfinalized(idx).isEmpty,
      s"SigIndex.append($idx): unfinalized commit (a writer died mid-append) — rebuild")
    val readVersion = IndexCommit.version(idx)
    // disjointness check as a MAP-ONLY pass: broadcast the batch ids and
    // semi-join the index scan against them — the previous form
    // (distinct-then-semi) shuffled every indexed doc_id per append,
    // an O(corpus) shuffle each micro-batch that dominated streaming
    // ingest latency and would be the per-batch bottleneck at 100 TB.
    // The distinct runs AFTER the semi-join, over matches only (zero
    // rows on the healthy path).
    val overlap = s.read.schema(bandsSchema).parquet(s"$idx/bands")
      .join(broadcast(newDocs.select("doc_id")), Seq("doc_id"), "left_semi")
      .select("doc_id").distinct().count()
    require(overlap == 0L, s"append overlaps $overlap indexed doc_ids")
    val prev = s.read.parquet(s"$idx/meta").collect()(0).getAs[Long]("n")
    // materialize the batch count BEFORE the writes (appendIvf's
    // count-before-write discipline: meta must describe what was written)
    val batch = newDocs.cache()
    val n = batch.count()
    val sh = Dedup.shingles(batch).cache()
    try {
      val committed = IndexCommit.claim(idx, readVersion)
      // rollback manifest BEFORE any data write: a crash from here to
      // finalize is recoverable by [[recover]] instead of only a rebuild
      IndexCommit.stage(idx, committed, Seq("postings", "bands", "meta"))
      sh.write.mode("append").parquet(s"$idx/postings")
      // band-clustered append (see build): one file per band per commit
      Dedup.signatureBands(Dedup.minhashSignature(sh))
        .repartition(col("band"))
        .write.mode("append").partitionBy("band").parquet(s"$idx/bands")
      writeMetaCount(s, prev + n, idx)
      IndexCommit.finalizeCommit(idx, committed, note)
    } finally { sh.unpersist(); batch.unpersist() }
  }

  /** Roll back a crashed append (claimed-but-unfinalized commit) to the
    * last committed state via its staged manifest, then re-derive the
    * meta count from the surviving postings — necessary because a crash
    * DURING the meta overwrite deletes the old meta files, which file
    * deletion alone cannot restore. The re-derived count is `distinct
    * doc_id` over postings: exact whenever every indexed document
    * shingled (non-degenerate content); a corpus with shingle-less
    * documents re-derives a smaller n, which the next `ensure` treats as
    * stale and rebuilds — conservative, never wrong. A crash BEFORE the
    * meta overwrite leaves meta intact, so the restored bytes are kept
    * verbatim and nothing is re-derived. No-op (None) on a healthy index
    * or a pre-manifest legacy claim (rebuild stays the only lever
    * there). Caller asserts the crashed writer is dead. */
  def recover(s: SparkSession, idx: String): Option[Long] =
    IndexCommit.cleanPartial(idx).map { case (version, _) =>
      val metaOk =
        try { s.read.parquet(s"$idx/meta").collect()(0).getAs[Long]("n"); true }
        catch { case _: Exception => false }
      if (!metaOk) {
        val n = s.read.schema(postingsSchema).parquet(s"$idx/postings")
          .select("doc_id").distinct().count()
        writeMetaCount(s, n, idx)
      }
      version
    }

  /** Near-dup pairs (old_id, new_id, jaccard ≥ [[Dedup.Tau]]) between the
    * persisted corpus and a new batch, without touching non-candidate
    * corpus documents. The result leans on two internal caches (batch
    * shingles + candidate pairs) that live until the session's cache is
    * cleared — the harness's per-query clearCache convention. Long-lived
    * callers that materialize the result themselves should use
    * [[probeWithHandles]] and unpersist (streamingIngest does). */
  def probe(s: SparkSession, idx: String, newDocs: DataFrame): DataFrame =
    probeWithHandles(s, idx, newDocs)._1

  /** [[probe]] plus the cached frames backing the (lazy) result — the
    * caller unpersists them AFTER materializing.
    *
    * Scale shape: the NEW-batch side of every join against persisted
    * state is explicitly broadcast — a probe batch is broadcast-sized by
    * contract (one crawl micro-batch vs the whole corpus), so the
    * candidate join and the postings semi-join are MAP-ONLY scans of the
    * index with zero index-side shuffle. Without the hints Spark
    * shuffle-joins both sides (batch stats are unknown behind the
    * aggregation), which re-shuffles the entire persisted index on every
    * micro-batch — the asymptotic killer for a 100 TB corpus probed by
    * kilodoc batches. */
  def probeWithHandles(s: SparkSession, idx: String,
      newDocs: DataFrame): (DataFrame, Seq[DataFrame]) = {
    val nsh = Dedup.shingles(newDocs).cache()
    val nbands = Dedup.signatureBands(Dedup.minhashSignature(nsh))
      .select(col("band"), col("bh"), col("doc_id").as("new_id"))
    val cand = s.read.schema(bandsSchema).parquet(s"$idx/bands")
      .select(col("band"), col("bh"), col("doc_id").as("old_id"))
      .join(broadcast(nbands), Seq("band", "bh"))
      .select("old_id", "new_id").distinct().cache()
    // only candidate documents' postings leave the index — and the
    // candidate-id set is broadcast for the same map-only reason
    val oldSh = s.read.schema(postingsSchema).parquet(s"$idx/postings")
      .join(broadcast(cand.select(col("old_id").as("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
    val both = oldSh.unionByName(nsh)
    val pairs = Dedup.exactJaccard(both,
        cand.select(col("old_id").as("a_id"), col("new_id").as("b_id")))
      .filter(col("jac") >= Dedup.Tau)
      .select(col("a_id").as("old_id"), col("b_id").as("new_id"),
        round(col("jac"), 6).cast("double").as("jaccard"))
    (pairs, Seq(nsh, cand))
  }

  /** One streaming-ingest micro-batch, IDEMPOTENT under at-least-once
    * replay (foreachBatch re-delivers a batch whenever the checkpoint
    * commit didn't land). The discipline, ordered so every crash point
    * replays cleanly:
    *
    *   1. a batch whose note (`batch-<id>`) is already among the index's
    *      finalized commits was FULLY processed by a previous attempt —
    *      skip everything (its pairs partition is on disk: pairs write
    *      precedes the commit);
    *   2. pairs land in the per-batch partition dir
    *      `pairsSink/batch_id=<id>` with mode OVERWRITE — a replayed
    *      pre-commit attempt rewrites the same content instead of
    *      duplicating rows (the probe still sees the index WITHOUT this
    *      batch, because the append runs after);
    *   3. the append carries the note into its finalized commit marker,
    *      making step 1's check durable;
    *   4. a bootstrap interrupted between data writes and its commit
    *      marker leaves version 0 — detected and REBUILT rather than
    *      mistaken for an appendable index (the overlap check would
    *      otherwise reject the replay of the half-indexed batch).
    *
    * A crash strictly inside the append (claimed, unfinalized) still
    * fails the stream loudly with the rebuild policy — plain-parquet
    * appends are not atomic and pretending otherwise would be worse. */
  private[operators] def ingestBatch(s: SparkSession, idx: String,
      pairsSink: String, batch: DataFrame, batchId: Long): Unit = {
    val note = s"batch-$batchId"
    if (IndexCommit.committedNotes(idx).contains(note)) return // replay: done
    // a claimed-but-unfinalized commit means an append crashed mid-write
    // and the data dirs may hold PART of that batch. Refuse here, BEFORE
    // the probe/pairs overwrite: probing a contaminated index would
    // clobber this batch's pairs partition with wrong (partially
    // self-matching) pairs on the way to the same failure.
    require(IndexCommit.unfinalized(idx).isEmpty,
      s"ingestBatch($idx): unfinalized commit (a writer died mid-append) — rebuild")
    val b = batch.select("doc_id", "text").cache()
    try {
      if (!new java.io.File(s"$idx/meta").isDirectory ||
          IndexCommit.version(idx) == 0L) {
        // pairs partition FIRST (the replay invariant: a finalized note
        // implies its pairs are on disk — so nothing may finalize before
        // the pairs write, including the bootstrap's build/reset). The
        // bootstrap has no corpus to pair against, so the schema row is
        // constructed directly instead of probing the not-yet-built index.
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("old_id", org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("new_id", org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("jaccard", org.apache.spark.sql.types.DoubleType))))
          .write.mode("overwrite").parquet(s"$pairsSink/batch_id=$batchId")
        build(b, idx, note)
      } else {
        // unpersist AFTER the write materializes the lazy probe —
        // per-batch caches must not accumulate across a long stream
        val (pairs, caches) = probeWithHandles(s, idx, b)
        try pairs.write.mode("overwrite")
          .parquet(s"$pairsSink/batch_id=$batchId")
        finally caches.foreach(_.unpersist())
        append(b, idx, note)
      }
    } finally b.unpersist()
  }

  /** Streaming ingest near-dedup: every micro-batch is probed against the
    * persisted index (emitting its near-dup pairs vs the corpus-so-far)
    * and then folded in — the crawl-ingest loop as a Structured
    * Streaming sink. The first batch bootstraps the index (nothing to
    * pair with; an empty probe creates the pairs sink with the right
    * schema). Effectively-once under foreachBatch's at-least-once
    * contract via [[ingestBatch]]'s note-keyed replay detection +
    * per-batch pairs partitions; the specs pin both the single-pass
    * semantics (emitted pairs ≡ the batch-at-a-time probes, final index
    * ≡ indexing everything at once) and replay idempotence. */
  def streamingIngest(stream: DataFrame, idx: String, pairsSink: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.Trigger
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestBatch(batch.sparkSession, idx, pairsSink, batch, batchId)
    }.option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
  }

  // D15: the incremental probe under the differential gate. The corpus
  // split is modular (doc_id % 5: 80% indexed "corpus", 20% "new batch")
  // so the same split interpolates into the oracle at any scale factor.
  // The oracle is the EXACT cross-split Jaccard pair set — the d3 recall
  // argument (banding sized for recall 1.0 at the observed similarities)
  // certifies the banded probe loses nothing.
  val defs: Seq[QueryDef] = Seq(
    QueryDef("d15_incremental_neardup",
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        |             FROM ws WHERE len(w) >= 3)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS old_id, y.doc_id AS new_id, count(*) AS c
        |          FROM sh x JOIN sh y ON x.g = y.g
        |          WHERE x.doc_id % 5 <> 0 AND y.doc_id % 5 = 0
        |          GROUP BY 1, 2)
        |SELECT old_id, new_id,
        |       CAST(round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS DOUBLE) AS jaccard
        |FROM inter JOIN sz sa ON old_id = sa.doc_id
        |           JOIN sz sb ON new_id = sb.doc_id
        |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= ${Dedup.Tau}
        |ORDER BY old_id, new_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val old = docs.filter(col("doc_id") % 5 =!= 0)
      val idx = pathFor(dir)
      buildLock.synchronized { if (!isFresh(old, idx)) build(old, idx) }
      probe(s, idx, docs.filter(col("doc_id") % 5 === 0))
        .orderBy("old_id", "new_id")
    }
  )
}
