package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float], 64-dim) —
  * north-star extension surface.
  *
  * Cosine is built from higher-order functions (`zip_with` + `aggregate`,
  * SURVEY §4.3): a left-to-right double fold, bit-reproducible across
  * engines when the oracle mirrors the same element order and double
  * casts. No UDFs — the lambdas compile to Catalyst expressions and stay
  * in codegen.
  *
  * Scale paths:
  *   - sim1/sim2 are the BRUTE-FORCE baselines: one broadcast of the tiny
  *     query side, a narrow map over the big side, top-k via
  *     TakeOrderedAndProject / per-query window — O(n·q·d) with no
  *     all-pairs shuffle; correct at any n, cost linear in the corpus.
  *   - sim3 (IVF) is the sub-linear path: a CONSTANT-k coarse quantizer
  *     (hash-sampled seeds + one k-means sweep), inverted lists bucketed
  *     by nearest centroid, probe the nprobe closest lists only. Unoracled
  *     (pruning is approximate); SimilaritySpec pins recall@20 >= 0.8 vs
  *     sim1's exact answer. Note the synthetic corpus is near-uniform in
  *     embedding space, so recall here is bounded by fraction-scanned
  *     (nprobe/k); on real clustered embeddings IVF's recall/scan ratio is
  *     far better — the structural property that matters at 100 TB is that
  *     build cost is O(k·n) with a constant-size broadcast, never O(n²).
  *   - d5 (embedding near-dup) joins only WITHIN a blocking key — the
  *     standard blocked-dedup shape: cost Σ b², never n².
  */
object Similarity {

  /** Dot product of two float vectors as an ordered double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity = dot / (||a|| * ||b||), all in doubles. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** The native codegen'd cosine (one fused loop, bit-identical to
    * [[cosine]] — CosineNativeSpec asserts exact equality). The HOF form
    * stays as the readable baseline and the sim1/sim4 bench pair; every
    * hot pairwise loop below uses this one. Args are column NAMES (the
    * expression resolves through the registered function). */
  def cosineFast(s: SparkSession, a: String, b: String): Column = {
    graft.functions.CosineNative.register(s)
    expr(s"cosine_native($a, $b)")
  }

  /** DuckDB rendering of the same fold (list_sum over an in-order list of
    * per-element double products) — kept textually adjacent to the Scala
    * so the two trees stay in lockstep. */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> p[1]::DOUBLE * p[2]::DOUBLE))"
  private def normSql(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> x::DOUBLE * x::DOUBLE)))"
  private[operators] def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"

  private def emb(s: SparkSession, dir: String) = Tables.embeddings(s, dir)

  val defs: Seq[QueryDef] = Seq(
    // EMB1: per-label prototype (centroid) vectors — the class-mean
    // embeddings semantic curation pipelines build (SemDeDup-style
    // cluster prototypes, nearest-class-mean pruning, k-means init).
    // Exact fixed-point: each element floor-quantized to 1e-6 BIGINTs,
    // integer-summed (order-free, hash-stable); the only float is one
    // division on identical operands in both engines. Scale shape: one
    // partial/final aggregate over (label, dim) — 64·|labels| groups,
    // map-side combine, no corpus-sized shuffle of the vectors.
    QueryDef("emb1_label_centroids",
      """WITH ds AS (SELECT unnest(generate_series(1, 64)) AS d)
        |SELECT label,
        |       CAST(d - 1 AS INTEGER) AS dim,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(floor(embedding[d]::DOUBLE * 1000000) AS BIGINT)) AS BIGINT) AS sum_q,
        |       CAST(sum(CAST(floor(embedding[d]::DOUBLE * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 / count(*) AS centroid
        |FROM embeddings, ds
        |GROUP BY label, dim
        |ORDER BY label, dim""".stripMargin) { (s, dir) =>
      emb(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("label", "dim")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("x").cast("double") * 1000000).cast("long")).as("sum_q"))
        .select(col("label"), col("dim"), col("n"), col("sum_q"),
          (col("sum_q").cast("double") / 1000000 / col("n")).as("centroid"))
        .orderBy("label", "dim")
    },

    // SIM1: brute-force cosine top-k against one query vector (vec_id 0).
    // The exact baseline every ANN variant is judged against.
    // SIM9: EXACT filtered search — top-k cosine restricted to one
    // metadata class (label = 3). The oracled ground truth sim10's
    // filtered ANN is judged against, and a real operator in its own
    // right (the "WHERE lang = 'en'" retrieval shape). The label filter
    // sits on the scan — predicate pushdown, not post-ranking discard.
    QueryDef("sim9_filtered_topk",
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |       CAST(round(${cosSql("embedding", "qv")}, 6) AS DOUBLE) AS cos
        |FROM embeddings, q
        |WHERE vec_id <> 0 AND label = 3
        |ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val q = broadcast(e.filter(col("vec_id") === 0).select(col("embedding").as("qv")))
      e.filter(col("vec_id") =!= 0 && col("label") === 3)
        .crossJoin(q)
        .select(col("vec_id"),
          round(cosine(col("embedding"), col("qv")), 6).cast("double").as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(20)
    },

    QueryDef("sim1_cosine_topk",
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |       CAST(round(${cosSql("embedding", "qv")}, 6) AS DOUBLE) AS cos
        |FROM embeddings, q
        |WHERE vec_id <> 0
        |ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val q = broadcast(e.filter(col("vec_id") === 0).select(col("embedding").as("qv")))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(q)
        .select(col("vec_id"),
          round(cosine(col("embedding"), col("qv")), 6).cast("double").as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(20)
    },

    // SIM2: batch kNN join — 10 query vectors × top-5 neighbors each, via a
    // broadcast of the query side and a per-query ranking window. Ranking
    // uses the ROUNDED score so tie order is engine-independent.
    QueryDef("sim2_knn_join",
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q_id, vec_id,
        |         CAST(round(${cosSql("embedding", "qv")}, 6) AS DOUBLE) AS cos
        |  FROM embeddings, q WHERE vec_id <> q_id),
        |ranked AS (
        |  SELECT q_id, vec_id, cos,
        |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INT) AS rn
        |  FROM scored)
        |SELECT q_id, vec_id, cos, rn FROM ranked WHERE rn <= 5
        |ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val q = broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv")))
      val scored = e.crossJoin(q)
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          round(cosineFast(s, "embedding", "qv"), 6).cast("double").as("cos"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .orderBy("q_id", "rn")
    },

    // D5: embedding-cosine near-dup pairs within a blocking key (label) —
    // the blocked-exact dedup shape: pairs are only formed inside a block,
    // so the join is keyed (shuffle on label), cost Σ block², never n².
    QueryDef("d5_embedding_neardup",
      s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |       CAST(round(${cosSql("a.embedding", "b.embedding")}, 6) AS DOUBLE) AS cos
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.35
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      // Per-pair scoring runs through the native fused expression — one
      // codegen'd loop computing dot + both norms per pair (the earlier
      // precomputed-norm HOF variant still paid an interpreted fold per
      // pair, which dominated the bench inside the quadratic block join).
      val e = emb(s, dir)
      val a = e.select(col("label"), col("vec_id").as("a_id"),
        col("embedding").as("av"))
      val b = e.select(col("label"), col("vec_id").as("b_id"),
        col("embedding").as("bv"))
      a.join(b, Seq("label"))
        .filter(col("a_id") < col("b_id"))
        // the block join keys on `label` (few, possibly skewed partitions);
        // respread the PAIRS before the per-pair fold so the similarity
        // compute uses full parallelism, not one task per block
        .transform(Par.spread(_, col("a_id"), col("b_id")))
        .withColumn("cosv", cosineFast(s, "av", "bv"))
        .filter(col("cosv") >= 0.35)
        .select(col("a_id"), col("b_id"),
          round(col("cosv"), 6).cast("double").as("cos"))
        .orderBy("a_id", "b_id")
    }
  )

  // ------------------------------------------------------------------ IVF

  /** Number of coarse centroids — CONSTANT, independent of corpus size.
    * (The earlier form sampled every 50th vector, so the centroid set —
    * and with it the assignment join and its broadcast — grew linearly
    * with n, making "ANN" assignment O(n²/50). A fixed k keeps assignment
    * O(k·n) with a constant-size broadcast at any corpus scale; a k-means
    * refinement sweep would drop in between seeds() and ivfAssign().) */
  val IvfK = 16

  /** IVF multi-assignment replication factor: every vector is stored in
    * its `AssignR` nearest inverted lists (the standard FAISS-style
    * recall/space trade). On a near-uniform corpus a single-assigned IVF's
    * recall is bounded by the fraction of lists probed (~nprobe/k); with
    * R-way replication a neighbor is missed only if ALL R of its lists go
    * unprobed — P(miss) falls from (1−p) to (1−p)^R — which is what lets
    * the pinned recall floors hold across scale factors. Cost: R× list
    * storage and R× probe scan width, compute-bounded and linear; probes
    * dedup copies with a max-aggregate on the (tiny) scored candidates.
    * K-means refinement and the PQ coarse assignment stay single-assigned
    * (a training point must pull on ONE centroid). */
  val AssignR = 2

  /** Collapse multi-assigned duplicate candidates WITHOUT shuffling the
    * candidate set: every vector appears at most [[AssignR]] times, so
    * the top-k distinct vectors by best score always sit inside the top
    * k·AssignR scored ROWS (rows above a vector's best row belong to
    * vectors with a better best — at most k−1 of them, each contributing
    * ≤ AssignR rows). Pruning to that cap first makes the dedup
    * aggregate run over ≤ k·AssignR rows instead of the whole scanned
    * candidate fraction: unpartitioned, the prune is a TakeOrdered
    * (per-partition heaps, no exchange); per-query, it reuses the rank
    * window's single exchange. Returns (parts…, vec_id, scoreCol) with
    * the best score per vector — order is NOT guaranteed (callers sort). */
  def dedupTopK(scored: DataFrame, parts: Seq[String], scoreCol: String,
      k: Int): DataFrame = {
    val cap = k * AssignR
    val pruned =
      if (parts.isEmpty)
        scored.orderBy(col(scoreCol).desc, col("vec_id")).limit(cap)
      else {
        val w = Window.partitionBy(parts.map(col): _*)
          .orderBy(col(scoreCol).desc, col("vec_id"))
        scored.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= cap).drop("__rn")
      }
    pruned.groupBy((parts :+ "vec_id").map(col): _*)
      .agg(max(scoreCol).as(scoreCol))
  }

  /** Deterministic pseudo-random k-vector centroid sample: order by a hash
    * of the id, keep the first k. Plans as TakeOrderedAndProject (per-
    * partition k-heaps + one k-row merge — no global sort, no RNG, so
    * builds are resumable and cross-run stable). */
  def seeds(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("embedding"), xxhash64(col("vec_id")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(IvfK)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))

  /** Flatten a centroid frame (c_id, cv) into ONE row: `cents_flat` (the
    * centroid vectors row-major in c_id order, doubles) + `ids` (sorted
    * c_ids, aligning flat index i with ids[i]). Attached to every vector
    * row via a one-row broadcast so nearest-centroid assignment becomes a
    * NARROW codegen'd map — no n×k row inflation, no argmax shuffle. */
  private def flatCentroids(cs: DataFrame): DataFrame =
    cs.select(col("c_id"), posexplode(col("cv")).as(Seq("pos", "x")))
      .agg(array_sort(collect_list(struct(col("c_id"), col("pos"), col("x")))).as("e"),
        array_sort(collect_set(col("c_id"))).as("ids"))
      .select(transform(col("e"), t => t("x").cast("double")).as("cents_flat"),
        col("ids"))

  /** Assign every vector to its `r` nearest centroids in `cs` (c_id, cv)
    * via the native fused kernels (graft.functions.PqNative) — one narrow
    * codegen'd pass either way; r>1 emits r rows per vector (IVF
    * multi-assignment, see [[AssignR]]). */
  private[graft] def assignTo(e: DataFrame, cs: DataFrame, r: Int = 1,
      carry: Seq[String] = Nil): DataFrame = {
    graft.functions.PqNative.register(e.sparkSession)
    val keep = carry.map(col)
    val base = Par.spread(e, col("vec_id")) // parallelize past the single input file
      .crossJoin(broadcast(flatCentroids(cs)))
    if (r == 1)
      base.select(col("vec_id") +:
        element_at(col("ids"),
          expr("nearest_centroid(embedding, cents_flat)") + 1).as("list_id") +:
        col("embedding") +: keep: _*)
    else
      base.select(col("vec_id") +:
        explode(expr(s"top_centroids(embedding, cents_flat, $r)")).as("ci") +:
        col("embedding") +: col("ids") +: keep: _*)
        .select(col("vec_id") +:
          element_at(col("ids"), col("ci") + 1).as("list_id") +:
          col("embedding") +: keep: _*)
  }

  /** One k-means refinement sweep: assign to the current centroids, then
    * re-center each list on its member mean (element-wise: posexplode →
    * per-(list, dim) avg with map-side combine → re-assemble; k·dim groups
    * total, independent of corpus size). Lists that lose all members keep
    * their sampled seed position implicitly absent (fine — probe skips
    * empty lists). */
  def refineCentroids(e: DataFrame, cs: DataFrame): DataFrame =
    assignTo(e, cs)
      .select(col("list_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("list_id", "pos").agg(avg("x").as("m"))
      .groupBy("list_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("list_id").as("c_id"),
        transform(col("pm"), p => p("m").cast("float")).as("cv"))

  /** Constant-size deterministic training sample (hash-ordered top-n):
    * k-means refinement never touches more than `n` vectors regardless of
    * corpus scale — at 100 TB you train the quantizer on a bounded sample
    * and only the ASSIGNMENT pass reads the full corpus. */
  def trainSample(e: DataFrame, n: Int): DataFrame =
    e.select(col("vec_id"), col("embedding"), xxhash64(col("vec_id")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(n)
      .select(col("vec_id"), col("embedding"))

  val TrainN = 1024

  /** Final centroids: sampled seeds + one k-means sweep over a bounded
    * training sample. */
  def centroids(e: DataFrame): DataFrame =
    refineCentroids(trainSample(e, TrainN), seeds(e))

  /** IVF build: assign every vector to its [[AssignR]] nearest centroids
    * (multi-assigned inverted lists). */
  def ivfAssign(e: DataFrame): DataFrame = assignTo(e, centroids(e), AssignR)

  /** IVF build+probe FUSED in one plan: search only the `nprobe` lists
    * closest to the query. The approximate counterpart of sim1 —
    * SimilaritySpec measures its recall. NOTE this inline form re-assigns
    * the corpus on every call; it exists as the algebraic reference twin
    * and for one-shot queries. The build-once/probe-many path — the one
    * the registered sim3 query runs, and the only sane shape at 100 TB —
    * is [[IvfIndex]]: lists persisted to Parquet partitioned by list_id,
    * probes read only the probed directories. */
  def ivfTopK(e: DataFrame, queryVecId: Long, k: Int, nprobe: Int): DataFrame = {
    val s = e.sparkSession
    val q = broadcast(e.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv")))
    val probed = broadcast(centroids(e).crossJoin(q)
      .select(col("c_id"), cosineFast(s, "cv", "qv").as("csim"))
      .orderBy(col("csim").desc, col("c_id")).limit(nprobe)
      .select(col("c_id").as("list_id")))
    val scored = ivfAssign(e)
      .join(probed, "list_id") // prune to probed inverted lists
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(q)
      .select(col("vec_id"), cosineFast(s, "embedding", "qv").as("cosv"))
    // multi-assigned copies landing in >1 probed list collapse via the
    // shuffle-free capped dedup (see dedupTopK)
    dedupTopK(scored, Seq.empty, "cosv", k)
      .select(col("vec_id"), round(col("cosv"), 6).cast("double").as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(k)
  }

  /** SIM3's raw top-k form, bench-only (the REGISTERED `sim3_ann_ivf` is
    * RecallVerdict's oracled recall-floor verdict over this same plan).
    * Runs through the PERSISTED index (build once per corpus, probe by
    * partition-pruned reads); [[ivfTopK]] is the inline reference twin. */
  val annDef: QueryDef = QueryDef.unoracled("sim3_ann_ivf_raw") { (s, dir) =>
    IvfIndex.ivfTopKPersisted(emb(s, dir), dir, queryVecId = 0L, k = 20,
      nprobe = 8)
  }

  /** SIM4: identical semantics to sim1 through the NATIVE codegen'd
    * expression (graft.functions.CosineSimilarity) — same oracle, same
    * bits, one fused loop inside WholeStageCodegen instead of three
    * interpreted HOF passes. The bench pair sim1/sim4 quantifies the
    * native-expression speedup on the same plan shape. */
  val nativeDef: QueryDef = QueryDef("sim4_cosine_topk_native",
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id,
      |       CAST(round(${cosSql("embedding", "qv")}, 6) AS DOUBLE) AS cos
      |FROM embeddings, q
      |WHERE vec_id <> 0
      |ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin) { (s, dir) =>
    graft.functions.CosineNative.register(s)
    val e = emb(s, dir)
    val q = broadcast(e.filter(col("vec_id") === 0).select(col("embedding").as("qv")))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(q)
      .select(col("vec_id"),
        round(expr("cosine_native(embedding, qv)"), 6).cast("double").as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(20)
  }
}
