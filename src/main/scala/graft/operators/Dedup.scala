package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the core of a training-data
  * pipeline (north star). Four tiers, cheapest to fuzziest:
  *
  *   d1 exact      — group on content hash, keep lowest doc_id
  *   d2 normalized — same, on canonicalized text (case/punct/whitespace)
  *   d3 MinHash-LSH — banded minhash signatures bucket candidate pairs,
  *                    then EXACT 3-gram Jaccard verifies each candidate
  *   d4 SimHash    — sign-sum fingerprint; identical-fingerprint pairs
  *
  * Scale design (the part the reference can't teach — it has no strings):
  * every step is keyed. d1/d2 shuffle on the hash (one row per group
  * survives). d3 NEVER forms all pairs: candidates come from a self-join
  * on (band, band_hash) — O(n·bands) rows shuffle, bucket sizes bound the
  * pair blow-up, and the exact-Jaccard verification only touches candidate
  * pairs (DedupSpec asserts the candidate count stays O(n·bands), not
  * O(n²)). d4 joins on the 32-bit fingerprint itself. An all-pairs
  * `crossJoin` appears nowhere.
  *
  * Cross-engine determinism: the ORACLE for d3 is the exact 3-gram Jaccard
  * pair set at tau=0.7 (computed in DuckDB via a shingle self-join). The
  * Spark side may therefore use fast native hashing (xxhash64) inside the
  * LSH — only the FINAL pair set and Jaccard values must match, and they
  * do as long as LSH recall is 1.0 at the threshold, which banding is
  * sized for: 16 bands × 4 rows ⇒ P(miss | j=0.9) = (1-0.9⁴)¹⁶ ≈ 4e-8,
  * and this corpus's planted near-dups all sit at j ≥ 0.9 with a clean
  * gap below (verified in DedupSpec at multiple scale factors).
  * d4's oracle instead mirrors the algorithm itself (md5-derived integer
  * bit votes), which both engines compute identically.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  // ----------------------------------------------------------- d1/d2 exact

  /** Keep the lowest doc_id per key — the canonical exact-dedup kernel:
    * shuffle on the hash, rank within group, survivors only. */
  def keepFirstBy(df: DataFrame, key: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy("doc_id")
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Canonical text: lowercase, strip non-alphanumerics, collapse runs of
    * spaces, trim. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  // ----------------------------------------------------------- d3 minhash

  private val Shingle = 3
  private val NumHash = 64
  private val Bands = 16 // × 4 rows = NumHash
  private val Rows = NumHash / Bands
  /** Near-dup verification threshold (public: SigIndex's incremental
    * probe applies the same bar). */
  val Tau = 0.7

  /** Distinct word 3-gram shingles per document (1-indexed to mirror the
    * oracle SQL; docs shorter than the shingle width drop out). Delegates
    * to the shared n-gram kernel — ONE home for the tokenize-once and
    * Par.spread disciplines (see Curation.grams scaladoc). */
  def shingles(d: DataFrame): DataFrame = Curation.grams(d, Shingle)

  /** Document-frequency cap for the inverted-index family (d6/d8). The
    * index join's cost is Σ_g df(g)² — one boilerplate shingle shared by
    * k documents contributes k² join rows, so an uncapped join is a
    * quadratic bomb at corpus scale (a viral footer in 1M docs = 10¹²
    * rows). Dropping shingles with df > cap bounds the join at
    * cap · Σ_g df(g) = O(cap · postings) — linear in the corpus — and is
    * the standard stopword-shingle guard every production near-dedup
    * runs. Semantics: capped shingles leave BOTH the intersection and the
    * sizes (Jaccard over the capped sets); the oracle applies the same
    * cap, so the differential check covers the capped semantics exactly.
    * A shingle this common carries no identity signal — it is a stopword
    * of the corpus — so dropping it barely moves near-dup Jaccard
    * (both members of a near-dup pair lose the same hot shingles).
    * DedupSpec pins the join-input bound under a planted hot shingle. */
  val DfCap = 64

  /** d9 line-dedup knobs: "line" width in words (stand-in for '\n'
    * splitting — this corpus has none) and the corpus-frequency cap above
    * which a line is boilerplate and cut everywhere. */
  val LineWords = 10
  val LineDfCap = 2

  /** d13 exact-substring dedup window width (tokens). The literature uses
    * 50-token windows over BPE tokens (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better" — ExactSubstr); this corpus's
    * documents are ~100 words, so 8 keeps the operator exercised. Declared
    * before `defs`: the oracle SQL interpolates it at object-init time. */
  val SpanW = 8

  /** d14 sparse TF-IDF cosine: integer idf quantum and pair threshold.
    * idf ∝ 1/df (the corpus-size factor N of N/df is CONSTANT across
    * terms, so it cancels in cosine — quantizing 1e6/df instead of
    * 1e6·N/df keeps weights corpus-size-independent and overflow-free at
    * any N). Weights are exact BIGINTs, so dot products and norms are
    * order-free integer sums; the only floats are one sqrt+divide on
    * identical operands in both engines. */
  val TfidfQ = 1000000L
  val CosTau = 0.6

  /** d16 Bloom-gate knobs (declared before `defs`): configured false-
    * positive rate and the absent-probe trial count behind the 4×fpp
    * envelope (same Markov-style stability argument as t9b's CMS bound). */
  val BloomFpp = 0.03
  val BloomAbsentProbes = 1000

  /** Drop rows whose shingle `g` appears in more than `cap` documents.
    * `sh` must hold at most one row per (doc, g) — true for both d6's
    * distinct shingles and d8's tf frame — so rows-per-g IS the df.
    * The HOT set (df > cap) is at most postings/cap shingles —
    * broadcastable at any corpus size — so the guard is one broadcast
    * LEFT ANTI join, not a second shuffle of the postings. */
  def dfCapped(sh: DataFrame, cap: Int = DfCap): DataFrame = {
    // CALLER CONTRACT: pass `sh` already cached — it is consumed twice
    // (hot-set aggregation + anti-join probe), and caching here would
    // hide a corpus-sized cache behind a function with no handle to
    // unpersist it (long-lived callers could only free it with a blanket
    // catalog.clearCache). Owning the cache at the call site keeps its
    // lifetime where it can be released.
    val hot = sh.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > cap).select("g")
    sh.join(broadcast(hot), Seq("g"), "left_anti")
  }

  /** Shared inverted-index pair kernel (d6 Jaccard, d11 containment):
    * every a<b pair sharing at least one shingle of the (already
    * df-capped, already cached) frame `sh`, with intersection count `c`
    * and both set sizes `na`/`nb` — the measures differ only in how they
    * combine these three numbers. */
  private def shinglePairSizes(sh: DataFrame): DataFrame = {
    val inter = sh.select(col("doc_id").as("a_id"), col("g"))
      .join(sh.select(col("doc_id").as("b_id"), col("g")), Seq("g"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("c"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
  }

  /** MinHash signatures as one 64-long array per doc via the custom
    * `minhash_agg` TypedImperativeAggregate (graft.functions.MinHashAgg):
    * a STREAMING fold whose per-group state is exactly 64 longs at every
    * stage — update, partial shuffle, merge — regardless of document size
    * (a `collect_list` fold materializes every per-shingle hash array:
    * O(#shingles × 64) per doc, an executor OOM on a giant doc). Partial
    * aggregation applies as with built-ins, so the shuffle moves one
    * 64-long buffer per (doc, partition). The single custom aggregate
    * also keeps codegen size independent of the signature width — the
    * equivalent 64 `min(xxhash64(...))` columns generate a 64-field
    * aggregate whose first-run janino compile is a real cost
    * (MinHashAggSpec pins slot-for-slot equality with that form). */
  def minhashSignature(sh: DataFrame): DataFrame = {
    graft.functions.MinHashAgg.register(sh.sparkSession)
    // hash the shingle STRING once; the 64 slot hashes re-hash the cheap
    // 64-bit value, not the string
    sh.select(col("doc_id"), xxhash64(col("g")).as("g64"))
      .groupBy("doc_id")
      .agg(expr(s"minhash_agg(g64, $NumHash)").as("sig"))
  }

  /** The n-wide built-in-aggregate twin of [[minhashSignature]] (64
    * `min(xxhash64(g64, slot))` columns) — kept as the reference
    * implementation MinHashAggSpec verifies the custom aggregate against. */
  def minhashSignatureWide(sh: DataFrame): DataFrame = {
    val withG = sh.select(col("doc_id"), xxhash64(col("g")).as("g64"))
    val mins = (0 until NumHash).map(i =>
      min(xxhash64(col("g64"), lit(i))).as(s"m$i"))
    withG.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHash).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** (doc_id, band, bh) rows from minhash signatures — the LSH bucket
    * membership both the in-corpus candidate join (lshCandidates) and the
    * persisted incremental index (SigIndex) key on. */
  def signatureBands(sig: DataFrame): DataFrame = {
    val bandHashes = transform(sequence(lit(0), lit(Bands - 1)),
      b => xxhash64(slice(col("sig"), b * Rows + 1, lit(Rows))))
    sig.select(col("doc_id"), posexplode(bandHashes).as(Seq("band", "bh")))
  }

  /** LSH bands: hash each run of `Rows` signature slots; docs sharing any
    * (band, band_hash) bucket become candidate pairs. */
  def lshCandidates(sig: DataFrame): DataFrame = {
    val bands = signatureBands(sig)
    bands.select(col("band"), col("bh"), col("doc_id").as("a_id"))
      .join(bands.select(col("band"), col("bh"), col("doc_id").as("b_id")),
        Seq("band", "bh"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Exact 3-gram Jaccard for the given pairs (shingle equi-join, counts
    * only — integer arithmetic, engine-exact). */
  def exactJaccard(sh: DataFrame, pairs: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.select(col("doc_id").as("a_id"), col("g")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("g")), Seq("b_id", "g"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jac"))
  }

  /** Connected components by iterative min-label propagation PLUS pointer
    * halving: each round every node adopts the smallest label among
    * itself, its neighbors, and its label's label. Each round is two
    * keyed joins + a grouped min (distributed); rounds needed =
    * O(log diameter) — near-dup cliques converge in 2-3 rounds, and even
    * a 10k-node chain (diameter 10⁴) converges in ~15 (DedupSpec pins
    * it). The canonical transitive-closure step that turns a pair list
    * into dedup CLUSTERS with one surviving representative. */
  private val MaxCcRounds = 50

  def connectedComponents(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // symmetrize in ONE pass over the edge list (explode of both
    // directions) — a union of two selects evaluates the upstream edge
    // pipeline twice, and here that pipeline is the whole LSH+verify run
    val sym = edges.select(explode(array(
        struct(col("a_id").as("u"), col("b_id").as("v")),
        struct(col("b_id").as("u"), col("a_id").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .cache()
    var labels = nodes.select(col("doc_id").as("u"), col("doc_id").as("lbl")).cache()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < MaxCcRounds) {
      val viaNbr = sym.join(labels, "u")
        .groupBy(col("v").as("u")).agg(min("lbl").as("nbrLbl"))
      // cached: it feeds both sides of the halving self-join below, and
      // uncached the neighbor join + grouped min would run twice per round.
      // The start-of-round label rides along as `old` (r18): the
      // convergence count below then needs NO join against the previous
      // generation — one corpus-sized equi-join of two cached frames per
      // round replaced by a filter over the frame the count materializes
      // anyway (guide §2.4 remove shuffles outright).
      val prop = labels.join(viaNbr, Seq("u"), "left")
        .select(col("u"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nbrLbl"), col("lbl"))).as("lbl"))
        .cache()
      // pointer halving: every label is itself a node id, so in the same
      // round also adopt the label OF the label — lbl(lbl(u)). Neighbor
      // propagation alone needs diameter rounds (a 10k-node chain = 10k
      // rounds, far past any sane cap); with halving the label graph's
      // depth halves each round, so chains collapse in O(log diameter).
      // Safe: labels only ever decrease, and only to ids inside the same
      // component (prop's labels are; so are their labels), so the
      // fixpoint — per-component min — is unchanged, reached faster.
      val nextPlan = prop.join(
          prop.select(col("u").as("lbl"), col("lbl").as("lbl2")),
          Seq("lbl"), "left")
        .select(col("u"), col("old"),
          least(col("lbl"), coalesce(col("lbl2"), col("lbl"))).as("lbl"))
      // truncate lineage EVERY round: the halving self-join embeds `prop`
      // twice, so an unchecked plan doubles per round (2^k growth between
      // periodic checkpoints OOMed the analyzer on a 10k chain — the plan
      // string alone exhausted the heap). Rebuilding the frame from its
      // RDD gives a LogicalRDD leaf (constant per-round LOGICAL plan —
      // what the analyzer sees) while staying a NORMAL cached dataset, so
      // the superseded generation below is freed deterministically by
      // unpersist() — a localCheckpoint'd frame persists its RDD outside
      // the cache manager, where Dataset.unpersist() is a silent no-op
      // and ~diameter corpus-sized generations would pile up in block
      // storage until driver GC. (RDD lineage still grows, but it is a
      // few cheap stages per round, bounded by MaxCcRounds — no analyzer
      // involvement.)
      val next = prop.sparkSession.createDataFrame(nextPlan.rdd, nextPlan.schema).cache()
      // the count that materializes `next` IS the convergence probe:
      // labels only ever decrease, so lbl < old ⟺ this round moved the
      // node (old is the start-of-round label carried through the plan —
      // no join against the superseded generation). `next` keeps the
      // extra long column until it is superseded; the final select below
      // drops it from the returned frame.
      changed = next.filter(col("lbl") < col("old")).count()
      prop.unpersist()
      labels.unpersist() // superseded generation
      labels = next
      rounds += 1
    }
    sym.unpersist()
    if (changed > 0) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $MaxCcRounds rounds " +
          "(component diameter exceeds the cap); raise MaxCcRounds")
    }
    // final generation is materialized (the convergence count ran it); the
    // returned frame reads those blocks. Callers doing many downstream
    // passes may labels.unpersist() via .unpersist() on this frame's child.
    labels.select(col("u").as("doc_id"), col("lbl").as("cluster_id"))
  }

  val defs: Seq[QueryDef] = Seq(
    // D1: exact dedup on the content hash — survivors, lowest doc_id wins.
    QueryDef("d1_exact_dedup",
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id LIMIT 2000""".stripMargin) { (s, dir) =>
      keepFirstBy(docs(s, dir), md5(col("text").cast("binary")))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id").limit(2000)
    },

    // D2: normalized dedup — same kernel on canonicalized text. The
    // grouped count view proves how much the normalization collapsed.
    QueryDef("d2_normalized_dedup",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text),
        |            '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))) AS BIGINT) AS n_uniq
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(normalized(col("text")).cast("binary"))).as("n_uniq"))
        .orderBy("lang")
    },

    // D9: line-level corpus dedup (the RefinedWeb/C4 pass): any "line"
    // repeated more than LineDfCap times ACROSS THE WHOLE CORPUS is
    // boilerplate (nav bars, cookie banners, license footers) and is cut
    // from every document that carries it, leaving the rest of the
    // document intact — document-level dedup (d1/d3) can't catch a shared
    // footer inside otherwise-distinct pages. This corpus has no newlines,
    // so the "line" unit is a fixed 10-word chunk (real corpora split on
    // '\n'; the pipeline shape is identical).
    //
    // Scale shape: chunks explode behind a doc_id repartition (narrow);
    // corpus-wide frequency is ONE shuffle of 16-byte md5s (not chunk
    // text); the hot set (freq > cap) is at most total_chunks/cap rows —
    // broadcastable at any corpus size, same argument as dfCapped — so
    // tagging is a broadcast left join, and the rebuild groupBy(doc_id)
    // reuses the repartition's partitioning (no second corpus shuffle).
    QueryDef("d9_line_dedup",
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (SELECT doc_id, i,
        |              array_to_string(w[(i-1)*$LineWords+1:i*$LineWords], ' ') AS chunk
        |       FROM (SELECT doc_id, w,
        |                    unnest(generate_series(1, CAST(ceil(len(w) / $LineWords.0) AS BIGINT))) AS i
        |             FROM ws)),
        |hot AS (SELECT chunk, 1 AS is_hot FROM ch GROUP BY chunk HAVING count(*) > $LineDfCap),
        |m AS (SELECT c.doc_id, c.i, c.chunk, h.is_hot FROM ch c LEFT JOIN hot h USING (chunk))
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS total_chunks,
        |       CAST(sum(CASE WHEN is_hot IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
        |       md5(coalesce(array_to_string(list(chunk ORDER BY i) FILTER (WHERE is_hot IS NULL), ' '), '')) AS clean_fp
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val w = col("w")
      val ch = Par.spread(docs(s, dir), col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), ceil(size(w) / lit(LineWords.toDouble)).cast("int")),
          i => struct(i.as("i"),
            concat_ws(" ", slice(w, (i - 1) * LineWords + 1, lit(LineWords))).as("chunk")))).as("c"))
        .select(col("doc_id"), col("c.i").as("i"), col("c.chunk").as("chunk"),
          md5(col("c.chunk").cast("binary")).as("h"))
        // cached: feeds the frequency aggregation AND the tagging join —
        // uncached, the chunk explosion + per-chunk md5 runs twice
        .cache()
      val hot = ch.groupBy("h").agg(count(lit(1)).as("freq"))
        .filter(col("freq") > LineDfCap)
        .select(col("h"), lit(1).as("is_hot"))
      ch.join(broadcast(hot), Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("total_chunks"),
          sum(when(col("is_hot").isNull, 1L).otherwise(0L)).as("kept_chunks"),
          md5(concat_ws(" ", transform(
            sort_array(collect_list(when(col("is_hot").isNull,
              struct(col("i"), col("chunk"))))),
            c => c.getField("chunk"))).cast("binary")).as("clean_fp"))
        .orderBy("doc_id")
    },

    // D10: keep-best-copy dedup — duplicates grouped on NORMALIZED text,
    // but the survivor is the LONGEST raw copy (ties → lowest doc_id),
    // not the first seen: when duplicates differ by truncation or
    // stripped markup, the pipeline should keep the most complete copy.
    // Same keyed window shape as d1 (shuffle on the hash, rank, filter) —
    // only the ORDER BY policy changes, which is the point: survivor
    // policy is orthogonal to the dedup kernel.
    QueryDef("d10_keep_best_copy",
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |         row_number() OVER (
        |           PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text),
        |             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
        |           ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id LIMIT 2000""".stripMargin) { (s, dir) =>
      val w = Window
        .partitionBy(md5(normalized(col("text")).cast("binary")))
        .orderBy(col("n_chars").desc, col("doc_id"))
      docs(s, dir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id").limit(2000)
    },

    // D3: MinHash-LSH near-dedup, verified by exact Jaccard. Oracle = the
    // exact pair set at tau (banding is sized so LSH recall is 1.0 at the
    // observed near-dup similarities; see object scaladoc).
    QueryDef("d3_minhash_lsh",
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${Shingle - 1})) AS i
        |             FROM ws WHERE len(w) >= $Shingle)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS c
        |          FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
        |          GROUP BY 1, 2)
        |SELECT a_id, b_id,
        |       CAST(round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sz sa ON a_id = sa.doc_id
        |JOIN sz sb ON b_id = sb.doc_id
        |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $Tau
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val sh = shingles(docs(s, dir)).cache()
      val cand = lshCandidates(minhashSignature(sh))
      exactJaccard(sh, cand)
        .filter(col("jac") >= Tau)
        .select(col("a_id"), col("b_id"),
          round(col("jac"), 6).cast("double").as("jaccard"))
        .orderBy("a_id", "b_id")
    },

    // D7: dedup clusters — transitive closure over the near-dup pair list
    // (LSH candidates verified at tau), every document labeled with its
    // cluster's canonical (minimum) doc_id. This is the step that turns
    // pairwise similarity into an actual dedup decision: keep doc_id ==
    // cluster_id, drop the rest. The oracle computes the same closure with
    // a recursive CTE over the exact-Jaccard edge list.
    QueryDef("d7_dedup_clusters",
      s"""WITH RECURSIVE
        |ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${Shingle - 1})) AS i
        |             FROM ws WHERE len(w) >= $Shingle)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS c
        |          FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT a_id, b_id FROM inter
        |          JOIN sz sa ON a_id = sa.doc_id JOIN sz sb ON b_id = sb.doc_id
        |          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $Tau),
        |edges AS (SELECT a_id AS u, b_id AS v FROM pairs
        |          UNION ALL SELECT b_id, a_id FROM pairs),
        |reach(u, v) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
        |SELECT u AS doc_id, min(v) AS cluster_id,
        |       (u = min(v)) AS is_canonical
        |FROM reach GROUP BY u
        |ORDER BY doc_id LIMIT 2000""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val sh = shingles(d).cache()
      val pairs = exactJaccard(sh, lshCandidates(minhashSignature(sh)))
        .filter(col("jac") >= Tau).select("a_id", "b_id")
      connectedComponents(d.select("doc_id"), pairs)
        .select(col("doc_id"), col("cluster_id"),
          (col("doc_id") === col("cluster_id")).as("is_canonical"))
        .orderBy("doc_id").limit(2000)
    },

    // D6: exact n-gram Jaccard via the shingle INVERTED-INDEX join (no
    // LSH): pairs sharing any shingle meet in the index, intersection
    // counts are grouped, sizes close the formula. Exact and complete at
    // any threshold over the df-CAPPED shingle sets (see [[dfCapped]]) —
    // the cap is what bounds the index join's Σ df² under hot-shingle
    // skew; d3's LSH stays the preferred 100 TB path, this is the precise
    // sibling for moderate corpora and the oracle-shape ground truth.
    QueryDef("d6_ngram_jaccard",
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${Shingle - 1})) AS i
        |             FROM ws WHERE len(w) >= $Shingle)),
        |sh AS (SELECT doc_id, g FROM (
        |         SELECT doc_id, g, count(*) OVER (PARTITION BY g) AS df FROM sh0)
        |       WHERE df <= $DfCap),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS c
        |          FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
        |          GROUP BY 1, 2)
        |SELECT a_id, b_id,
        |       CAST(round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sz sa ON a_id = sa.doc_id
        |JOIN sz sb ON b_id = sb.doc_id
        |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.3
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      shinglePairSizes(dfCapped(shingles(docs(s, dir)).cache()).cache())
        .withColumn("jac", col("c").cast("double") / (col("na") + col("nb") - col("c")))
        .filter(col("jac") >= 0.3)
        .select(col("a_id"), col("b_id"),
          round(col("jac"), 6).cast("double").as("jaccard"))
        // fence: the sort sampler otherwise replays the pair aggregation
        // + size joins above their exchange (Par.sortFence scaladoc)
        .transform(Par.sortFence(_, col("a_id"), col("b_id")))
        .orderBy("a_id", "b_id")
    },

    // D11: shingle CONTAINMENT — the asymmetric sibling of d6's Jaccard:
    // C = |A∩B| / min(|A|,|B|), i.e. how much of the SMALLER document's
    // shingle set lives inside the other. Catches wholesale inclusion
    // (a quoted article inside a longer page, a doc plus appended junk)
    // that symmetric Jaccard dilutes below any sane threshold when the
    // size ratio is large. Identical inverted-index shape and df-cap
    // guard as d6 — only the denominator changes.
    QueryDef("d11_containment",
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${Shingle - 1})) AS i
        |             FROM ws WHERE len(w) >= $Shingle)),
        |sh AS (SELECT doc_id, g FROM (
        |         SELECT doc_id, g, count(*) OVER (PARTITION BY g) AS df FROM sh0)
        |       WHERE df <= $DfCap),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS c
        |          FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
        |          GROUP BY 1, 2)
        |SELECT a_id, b_id,
        |       CAST(round(CAST(c AS DOUBLE) / least(sa.n, sb.n), 6) AS DOUBLE) AS containment
        |FROM inter
        |JOIN sz sa ON a_id = sa.doc_id
        |JOIN sz sb ON b_id = sb.doc_id
        |WHERE CAST(c AS DOUBLE) / least(sa.n, sb.n) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      shinglePairSizes(dfCapped(shingles(docs(s, dir)).cache()).cache())
        .withColumn("cont", col("c").cast("double") / least(col("na"), col("nb")))
        .filter(col("cont") >= 0.8)
        .select(col("a_id"), col("b_id"),
          round(col("cont"), 6).cast("double").as("containment"))
        .transform(Par.sortFence(_, col("a_id"), col("b_id")))
        .orderBy("a_id", "b_id")
    },

    // D8: tf-WEIGHTED Jaccard — the weighted sibling of d6 for corpora
    // where repetition matters (boilerplate spam repeats its shingles; set
    // semantics can't see that). J_w = Σ_g min(tf_a, tf_b) / Σ_g
    // max(tf_a, tf_b), computed via the identity Σmax = tot_a + tot_b −
    // Σmin so only SHARED shingles ever join (same inverted-index shape
    // and cost as d6 — including the same df cap bounding Σ df², applied
    // to the tf frame where rows-per-g = df; integer arithmetic
    // end-to-end — engine-exact).
    QueryDef("d8_weighted_jaccard",
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${Shingle - 1})) AS i
        |             FROM ws WHERE len(w) >= $Shingle)),
        |tf0 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS tf FROM sh GROUP BY 1, 2),
        |tf AS (SELECT doc_id, g, tf FROM (
        |         SELECT doc_id, g, tf, count(*) OVER (PARTITION BY g) AS df FROM tf0)
        |       WHERE df <= $DfCap),
        |tot AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tot FROM tf GROUP BY 1),
        |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |                 CAST(sum(least(a.tf, b.tf)) AS BIGINT) AS m
        |          FROM tf a JOIN tf b ON a.g = b.g AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT a_id, b_id,
        |       CAST(round(CAST(m AS DOUBLE) / (ta.tot + tb.tot - m), 6) AS DOUBLE) AS wjac
        |FROM inter
        |JOIN tot ta ON a_id = ta.doc_id
        |JOIN tot tb ON b_id = tb.doc_id
        |WHERE CAST(m AS DOUBLE) / (ta.tot + tb.tot - m) >= 0.3
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val w = col("w")
      val sh = Par.spread(docs(s, dir), col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("w")) // tokenize ONCE (see shingles)
        .filter(size(w) >= Shingle)
        .select(col("doc_id"), explode(
          transform(sequence(lit(1), size(w) - (Shingle - 1)),
            i => concat_ws(" ",
              element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))).as("g"))
      // the raw tf frame is cached per dfCapped's caller contract (it
      // feeds the hot-set agg + anti-join probe); the capped output is
      // cached too — it feeds three consumers (both join sides + totals)
      val tf = dfCapped(
        sh.groupBy("doc_id", "g").agg(count(lit(1)).as("tf")).cache()).cache()
      val tot = tf.groupBy("doc_id").agg(sum("tf").as("tot"))
      val inter = tf.select(col("doc_id").as("a_id"), col("g"), col("tf").as("ta"))
        .join(tf.select(col("doc_id").as("b_id"), col("g"), col("tf").as("tb")), Seq("g"))
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(sum(least(col("ta"), col("tb"))).as("m"))
      inter
        .join(tot.select(col("doc_id").as("a_id"), col("tot").as("tota")), "a_id")
        .join(tot.select(col("doc_id").as("b_id"), col("tot").as("totb")), "b_id")
        .withColumn("wj",
          col("m").cast("double") / (col("tota") + col("totb") - col("m")))
        .filter(col("wj") >= 0.3)
        .select(col("a_id"), col("b_id"),
          round(col("wj"), 6).cast("double").as("wjac"))
        .transform(Par.sortFence(_, col("a_id"), col("b_id")))
        .orderBy("a_id", "b_id")
    },

    // D4: SimHash (Charikar) — 32-bit, frequency-weighted: every token
    // OCCURRENCE votes ±1 per bit position, bits drawn from the first 32
    // bits of the token's md5 (hex parsed to an integer ONCE per token;
    // the per-bit vote is then two integer ops, not a substring — the
    // 32-substring form was the top bench cost and its codegen was
    // unstable). Docs with IDENTICAL fingerprints pair up (hamming-0
    // buckets, a keyed self-join — no all-pairs). The oracle replicates
    // the fingerprint arithmetic itself: integer shifts both engines
    // compute identically.
    QueryDef("d4_simhash_pairs", {
      val sums = (0 until 32).map(p =>
        s"sum(((v >> $p) & 1) * 2 - 1) AS b$p")
        .mkString(",\n        |        ")
      val fp = (0 until 32).map(p => s"(CASE WHEN b$p >= 0 THEN '1' ELSE '0' END)")
        .mkString(" || ")
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |             FROM documents),
        |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS v FROM tok),
        |s AS (SELECT doc_id,
        |        $sums
        |      FROM h GROUP BY doc_id),
        |f AS (SELECT doc_id, $fp AS fp FROM s)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.fp AS fp
        |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |ORDER BY a_id, b_id""".stripMargin
    }) { (s, dir) =>
      val fp = concat((0 until 32).map(p =>
        when(col(s"b$p") >= 0, "1").otherwise("0")): _*)
      val f = simhashVotes(docs(s, dir)).select(col("doc_id"), fp.as("fp"))
      f.select(col("fp"), col("doc_id").as("a_id"))
        .join(f.select(col("fp"), col("doc_id").as("b_id")), Seq("fp"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), col("fp"))
        .orderBy("a_id", "b_id")
    },

    // D4B: SimHash NEAR-dedup — hamming distance ≤ 3, the fuzzy tier d4's
    // hamming-0 buckets can't see. Pigeonhole banding: split the 64-bit
    // fingerprint into 4 16-bit blocks; a pair within hamming 3 differs in
    // at most 3 blocks, so it must AGREE on at least one — equi-join on
    // (block index, block value) yields the candidates (keyed, never
    // all-pairs; 65,536 values per block keep buckets sparse as n grows),
    // then `bit_count(xor)` verifies exact hamming on candidates only.
    // The oracle is a genuinely independent implementation: full O(n²)
    // pair scan in DuckDB over the same fingerprint arithmetic — at
    // oracle scale that's cheap, and it proves the banding loses nothing.
    QueryDef("d4b_simhash_hamming", {
      val sums = (0 until 64).map { p =>
        val (v, sh) = if (p < 32) ("v1", p) else ("v2", p - 32)
        s"sum((($v >> $sh) & 1) * 2 - 1) AS b$p"
      }.mkString(",\n        |        ")
      // bit 63 = Long.MinValue: spelled as (-MAX - 1) so the literal never
      // overflows a BIGINT parse; disjoint bit positions make the sum exact
      val fpInt = (0 until 64).map { p =>
        val v = if (p == 63) "(CAST(-9223372036854775807 AS BIGINT) - 1)"
        else s"CAST(${1L << p} AS BIGINT)"
        s"(CASE WHEN b$p >= 0 THEN $v ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |             FROM documents),
        |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS v1,
        |             ('0x' || substr(md5(t), 9, 8))::BIGINT AS v2 FROM tok),
        |s AS (SELECT doc_id,
        |        $sums
        |      FROM h GROUP BY doc_id),
        |f AS (SELECT doc_id, $fpInt AS fp FROM s)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
        |FROM f a JOIN f b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3
        |ORDER BY a_id, b_id""".stripMargin
    }) { (s, dir) =>
      simhashHammingPairs(docs(s, dir), maxHamming = 3)
        .orderBy("a_id", "b_id")
    },

    // D13: exact-substring span dedup (ExactSubstr, Lee et al. 2022) — any
    // SpanW-token window whose content occurs MORE THAN ONCE corpus-wide
    // marks all its token positions as duplicated; overlapping marked
    // windows merge into maximal spans, which are cut from every carrier.
    // This is the operator document-level dedup (d1/d3) and boilerplate
    // line dedup (d9, non-overlapping chunks above a frequency cap) both
    // miss: a paragraph quoted verbatim inside two otherwise-unrelated
    // documents. Output per doc: token counts, duplicated-token count,
    // merged-span count, and a fingerprint of the surviving text.
    //
    // Scale shape: windows explode behind the doc_id repartition (stride 1
    // → ~n_tokens rows/doc, each a 16-byte md5 — window TEXT never
    // shuffles); corpus frequency is one hash shuffle; the duplicated set
    // is corpus-scale (up to all windows), so the flag join is a keyed
    // shuffle equi-join, NOT a broadcast (unlike d9's capped hot set);
    // span coverage explodes ×SpanW on flagged windows only; island
    // numbering runs per-doc (keyed window, no global sort). Everything is
    // linear in corpus size — no pairs are ever formed.
    QueryDef("d13_substring_dedup",
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |wins AS (SELECT doc_id, i, md5(array_to_string(w[i:i+${SpanW - 1}], ' ')) AS h
        |         FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${SpanW - 1})) AS i
        |               FROM ws WHERE len(w) >= $SpanW)),
        |dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) > 1),
        |flag AS (SELECT doc_id, i FROM wins JOIN dup USING (h)),
        |cover AS (SELECT DISTINCT doc_id, p FROM
        |            (SELECT doc_id, unnest(generate_series(i, i + ${SpanW - 1})) AS p FROM flag)),
        |toks AS (SELECT doc_id, p, w[p] AS tok
        |         FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS p FROM ws)),
        |isl AS (SELECT doc_id, p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS g
        |        FROM cover),
        |spans AS (SELECT doc_id, count(DISTINCT g) AS n_spans FROM isl GROUP BY doc_id),
        |base AS (SELECT t.doc_id, count(*) AS n_tokens,
        |                sum(CASE WHEN c.p IS NOT NULL THEN 1 ELSE 0 END) AS dup_tokens,
        |                md5(coalesce(array_to_string(
        |                  list(t.tok ORDER BY t.p) FILTER (WHERE c.p IS NULL), ' '), '')) AS kept_fp
        |         FROM toks t LEFT JOIN cover c ON t.doc_id = c.doc_id AND t.p = c.p
        |         GROUP BY t.doc_id)
        |SELECT b.doc_id AS doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |       CAST(b.dup_tokens AS BIGINT) AS dup_tokens,
        |       CAST(coalesce(s.n_spans, 0) AS BIGINT) AS n_spans, b.kept_fp
        |FROM base b LEFT JOIN spans s ON b.doc_id = s.doc_id
        |ORDER BY b.doc_id""".stripMargin) { (s, dir) =>
      val w = col("w")
      val ws = Par.spread(docs(s, dir), col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .cache() // consumed twice: window explode + token explode
      val wins = ws.filter(size(w) >= SpanW)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(w) - (SpanW - 1)),
          i => struct(i.as("i"),
            md5(concat_ws(" ", slice(w, i, lit(SpanW))).cast("binary")).as("h")))).as("x"))
        .select(col("doc_id"), col("x.i").as("i"), col("x.h").as("h"))
        .cache() // consumed twice: frequency aggregation + flag join
      val dup = wins.groupBy("h").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).select("h")
      val flag = wins.join(dup, Seq("h")).select("doc_id", "i")
      val cover = flag
        .select(col("doc_id"), explode(sequence(col("i"), col("i") + (SpanW - 1))).as("p"))
        .distinct()
        .cache() // consumed twice: island numbering + coverage join
      val toks = ws.select(col("doc_id"), posexplode(w).as(Seq("p0", "tok")))
        .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
      val islW = Window.partitionBy("doc_id").orderBy("p")
      val spans = cover.withColumn("g", col("p") - row_number().over(islW))
        .groupBy("doc_id").agg(countDistinct("g").as("n_spans"))
      val base = toks.join(cover.withColumn("hit", lit(1)), Seq("doc_id", "p"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("dup_tokens"),
          md5(concat_ws(" ", transform(
            sort_array(collect_list(when(col("hit").isNull,
              struct(col("p"), col("tok"))))),
            c => c.getField("tok"))).cast("binary")).as("kept_fp"))
      base.join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("dup_tokens"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"), col("kept_fp"))
        // fence: the replayed chunk is the per-doc collect_list + md5
        // final aggregation — the most expensive thing to run twice here
        .transform(Par.sortFence(_, col("doc_id")))
        .orderBy("doc_id")
    },

    // D14: sparse TF-IDF cosine similarity — the classic lexical-retrieval
    // geometry (the sparse sibling of d5's dense-embedding cosine).
    // Weights are EXACT integers (tf × (1e6 div df); see TfidfQ scaladoc
    // for why 1/df suffices as idf under cosine), so dot products and
    // norms are order-free BIGINT sums both engines compute identically;
    // the only floating point is one sqrt+divide on identical operands.
    // Terms above the df cap drop (the d6/d8 stopword guard — they carry
    // no identity signal and their postings are the quadratic bomb).
    //
    // Scale shape: unigram postings behind the df cap → candidate join
    // bounded at cap · postings (linear); norms are one grouped sum; no
    // all-pairs anywhere.
    QueryDef("d14_tfidf_cosine",
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
        |dfr AS (SELECT t, count(*) AS df FROM tf GROUP BY t HAVING count(*) <= $DfCap),
        |post AS (SELECT doc_id, tf.t, tf.tf * ($TfidfQ // df) AS wq
        |         FROM tf JOIN dfr ON tf.t = dfr.t),
        |norms AS (SELECT doc_id, CAST(sum(wq * wq) AS BIGINT) AS n2 FROM post GROUP BY doc_id),
        |num AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |               CAST(sum(a.wq * b.wq) AS BIGINT) AS num
        |        FROM post a JOIN post b ON a.t = b.t AND a.doc_id < b.doc_id
        |        GROUP BY 1, 2)
        |SELECT a_id, b_id,
        |       CAST(round(CAST(num AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE))
        |                  / sqrt(CAST(nb.n2 AS DOUBLE)), 6) AS DOUBLE) AS cos_sim
        |FROM num JOIN norms na ON a_id = na.doc_id
        |         JOIN norms nb ON b_id = nb.doc_id
        |WHERE CAST(num AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE))
        |      / sqrt(CAST(nb.n2 AS DOUBLE)) >= $CosTau
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val toks = Par.spread(docs(s, dir), col("doc_id"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      val tf = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("tf")).cache()
      val dfr = tf.groupBy("t").agg(count(lit(1)).as("df"))
        .filter(col("df") <= DfCap)
      val post = tf.join(dfr, Seq("t"))
        .select(col("doc_id"), col("t"),
          (col("tf") * expr(s"$TfidfQ div df")).as("wq"))
        .cache() // consumed three times: norms + both sides of the pair join
      val norms = post.groupBy("doc_id").agg(sum(col("wq") * col("wq")).as("n2"))
      val num = post.select(col("doc_id").as("a_id"), col("t"), col("wq").as("wa"))
        .join(post.select(col("doc_id").as("b_id"), col("t"), col("wq").as("wb")), Seq("t"))
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(sum(col("wa") * col("wb")).as("num"))
      val cos = col("num").cast("double") /
        sqrt(col("na2").cast("double")) / sqrt(col("nb2").cast("double"))
      num
        .join(norms.select(col("doc_id").as("a_id"), col("n2").as("na2")), "a_id")
        .join(norms.select(col("doc_id").as("b_id"), col("n2").as("nb2")), "b_id")
        .filter(cos >= CosTau)
        .select(col("a_id"), col("b_id"),
          round(cos, 6).cast("double").as("cos_sim"))
        .orderBy("a_id", "b_id")
    },

    // D16: Bloom-filter membership gate — the streaming-ingest "have we
    // already got this document?" primitive, completing the sketch family
    // (CMS t9, HLL a8, Bloom here). The filter builds DISTRIBUTED (bit
    // arrays OR-merge per partition, order-free — so the build is
    // deterministic for a given corpus), then the fixed probe sets check
    // the two sides of the contract: every present key MUST hit (a Bloom
    // filter has NO false negatives — an unconditional guarantee, exact
    // count oracled), and absent-key false positives stay under 4× the
    // configured fpp over BloomAbsentProbes trials (Markov/Chernoff: a
    // correct sketch breaks that envelope with probability ≈ 1e-9; a
    // broken hash or merge flips the verdict row and fails the hash
    // compare). Probing happens driver-side against the O(1)-size sketch
    // — the corpus never moves.
    QueryDef("d16_bloom_gate", {
      s"""SELECT 'absent' AS probe_class,
        |       (SELECT count(*) FROM documents WHERE false) AS n_required_hits,
        |       TRUE AS within_bound
        |UNION ALL
        |SELECT 'present' AS probe_class,
        |       (SELECT CAST(count(*) AS BIGINT) FROM
        |         (SELECT DISTINCT doc_id FROM documents
        |          WHERE doc_id % 5 = 0 AND doc_id < 1000)) AS n_required_hits,
        |       TRUE AS within_bound
        |ORDER BY probe_class""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val keyed = docs(s, dir).select(col("doc_id"),
        md5(normalized(col("text")).cast("binary")).as("h"))
      // FIXED probe set (≤200 keys at any corpus size) — the sketch is
      // what's distributed; verification stays O(probes) on the driver
      val present = keyed.filter(col("doc_id") % 5 === 0 && col("doc_id") < 1000)
        .select("doc_id", "h").distinct().collect()
      // capacity tracks the CORPUS (one cheap count() — Catalyst prunes
      // the md5 projection under count): a hardcoded capacity saturates
      // past its sizing point and the fpp envelope breaks; sized to n the
      // envelope holds at any scale, and the probe-side bound below is
      // already capacity-free (it depends only on the configured fpp)
      val nDocs = math.max(keyed.count(), 1L)
      val bf = keyed.stat.bloomFilter("h", expectedNumItems = nDocs, fpp = BloomFpp)
      val presentHits = present.count(r => bf.mightContain(r.getString(1)))
      // absent probes: md5 of a namespace no document hash can collide
      // with (domain-separated), so every hit is a true false positive
      val absentFp = (0 until BloomAbsentProbes)
        .count(i => bf.mightContain(s"graft-absent-probe-$i"))
      val bound = (4 * BloomFpp * BloomAbsentProbes).toLong
      Seq(("absent", 0L, absentFp <= bound),
        ("present", presentHits.toLong, presentHits == present.length))
        .toDF("probe_class", "n_required_hits", "within_bound")
        .orderBy("probe_class")
    }
  )

  /** Per-document SimHash bit votes b0..b{nBits-1} (sum of ±1 per token
    * occurrence, bit p drawn from the token's md5-derived value).
    * nBits codegen'd integer-vote sums. (An array-fold variant — one
    * aggregate over per-token ±1 vectors — was tried and is ~10× slower:
    * the interpreted zip_with fold allocates per token. The wide
    * generated aggregate pays a one-time JIT compile on first run and
    * then executes at full codegen speed.)
    *
    * The md5 hex parses as two 32-bit halves (bits 0-31 from chars 1-8,
    * 32-63 from chars 9-16): `conv` returns a STRING, and a 16-hex-digit
    * value above Long.MaxValue casts to NULL — a single 64-bit parse
    * would silently drop half the token space. Callers that only need 32
    * bits (d4) leave `v2` unused and Catalyst prunes it. */
  def simhashVotes(d: DataFrame, nBits: Int = 32): DataFrame = {
    require(nBits == 32 || nBits == 64, s"unsupported SimHash width $nBits")
    // spread (explicit count, not bare repartition): the doc_id hash also
    // SATISFIES the groupBy's distribution below, so the votes aggregate
    // collapses into this stage with no second exchange — and the pinned
    // count keeps AQE from coalescing the cheap-bytes/expensive-rows
    // 64-sum merge onto one task (measured: 0.66 s single-task final agg)
    val tok = Par.spread(d, col("doc_id"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .withColumn("h", md5(col("t").cast("binary")))
      .withColumn("v", conv(substring(col("h"), 1, 8), 16, 10).cast("long"))
      .withColumn("v2", conv(substring(col("h"), 9, 8), 16, 10).cast("long"))
    val sums = (0 until nBits).map { p =>
      val (src, sh) = if (p < 32) (col("v"), p) else (col("v2"), p - 32)
      sum(shiftright(src, sh).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$p")
    }
    tok.groupBy("doc_id").agg(sums.head, sums.tail: _*)
  }

  /** SimHash fingerprint width for the hamming tier. 64-bit (not 32): the
    * banding below buckets on (block index, block value), so the bucket
    * space per block is 2^(bits/nBlocks). At 32 bits / 4 blocks that is
    * only 256 values — buckets hold n/256 docs and candidates grow
    * O(n²/1024), a scale-killer. At 64 bits / 4 blocks each block has
    * 65,536 values: buckets stay sparse 256× longer, and the wider
    * fingerprint also discriminates better (fewer random hamming-3
    * collisions). The pigeonhole proof is width-independent. */
  val SimHashBits = 64

  /** (doc_id, fp): the 64-bit integer SimHash fingerprint per document. */
  def simhashFingerprints(d: DataFrame): DataFrame = {
    // bit 63's value is Long.MinValue; summing stays exact because the
    // terms occupy disjoint bit positions (sum == bitwise OR, no carries)
    val fpInt = (0 until SimHashBits).map(p =>
      when(col(s"b$p") >= 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
    simhashVotes(d, SimHashBits).select(col("doc_id"), fpInt.as("fp"))
  }

  /** Banded candidate pairs for hamming ≤ `maxHamming` (pre-verify): the
    * fingerprint splits into `maxHamming + 1` blocks and docs sharing any
    * (block index, block value) bucket pair up — pigeonhole: a qualifying
    * pair agrees on at least one block. Keyed equi-join, never all-pairs;
    * DedupSpec pins candidate sparsity on a 10× corpus.
    *
    * `sharedExchange` picks the self-join's materialization: `true`
    * spreads the block frame on the join keys so both branches
    * canonicalize onto ONE reused exchange — the right shape when the
    * fingerprint lineage is a corpus-scale aggregation (d4b's 64-sum
    * votes pass otherwise executed once per branch, two ~0.5 s
    * duplicate stages, one AQE-coalesced to a single task). `false`
    * keeps the planner's broadcast of one branch — cheaper when the
    * lineage is a small bounded fixture (mm5's 300 decoded images: the
    * two branches run CONCURRENTLY, and three pinned exchanges are pure
    * fixed cost at that size, +0.4 s measured). */
  def simhashCandidates(f: DataFrame, maxHamming: Int,
      sharedExchange: Boolean = true): DataFrame = {
    val nBlocks = maxHamming + 1
    val bits = SimHashBits / nBlocks
    val mask = (1L << bits) - 1
    val blocks0 = f.select(col("doc_id"), col("fp"),
      posexplode(array((0 until nBlocks).map(b =>
        shiftright(col("fp"), b * bits).bitwiseAND(lit(mask))): _*))
        .as(Seq("blk", "bv")))
    val blocks = if (sharedExchange)
      Par.spread(blocks0, col("blk"), col("bv")) else blocks0
    blocks.select(col("blk"), col("bv"), col("doc_id").as("a_id"), col("fp").as("a_fp"))
      .join(blocks.select(col("blk"), col("bv"), col("doc_id").as("b_id"), col("fp").as("b_fp")),
        Seq("blk", "bv"))
      .filter(col("a_id") < col("b_id"))
  }

  /** Banded candidates + exact `bit_count(xor)` verify for hamming ≤
    * `maxHamming` over ANY (doc_id, fp: LONG) fingerprint frame — the
    * kernel text SimHash (d4b) and image dHash (mm5) share; see
    * [[simhashCandidates]] for the `sharedExchange` choice. */
  def hammingPairs(f: DataFrame, maxHamming: Int,
      sharedExchange: Boolean = true): DataFrame =
    simhashCandidates(f, maxHamming, sharedExchange)
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair can agree on several blocks

  /** [[hammingPairs]] over the text SimHash fingerprint. */
  def simhashHammingPairs(d: DataFrame, maxHamming: Int): DataFrame =
    hammingPairs(simhashFingerprints(d), maxHamming)
}
