package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-compression tier of the
  * similarity stack (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011). A 64-dim float vector (256 bytes) is
  * split into M=8 contiguous 8-dim subvectors; each subspace gets a
  * K=16-entry codebook, so a vector encodes as 8 four-bit codes — packed
  * here into ONE 32-bit int (64× smaller than the raw floats). At 100 TB
  * of embeddings this is the difference between "the index fits in
  * cluster memory" and "it does not": scans rank by code lookups against
  * a per-query distance table (ADC — asymmetric distance computation),
  * touching raw vectors only for the final candidate rerank.
  *
  * Everything is deterministic DataFrame algebra: codebooks are a
  * hash-sampled constant-size draw per subspace (no RNG, corpus-size
  * independent — same discipline as the IVF centroids), encoding is a
  * keyed min-distance join against a broadcast codebook (O(n·M·K), never
  * quadratic), and the ADC scan joins the packed codes against a
  * broadcast 128-entry lookup table. QuantizationSpec pins recall@20 ≥
  * 0.9 after rerank and the constant codebook size.
  */
object Quantization {

  val M = 8          // subspaces
  val SubDim = 8     // dims per subspace (64-dim embeddings)
  val K = 16         // centroids per subspace -> 4-bit codes
  private val CodeBits = 4

  /** Unit-normalized copy of the embeddings (PQ of unit vectors
    * approximates cosine via plain dot products). */
  def normalized(e: DataFrame): DataFrame = {
    val nrm = sqrt(aggregate(transform(col("embedding"),
      x => x.cast("double") * x.cast("double")), lit(0.0), (a, v) => a + v))
    e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double") / nrm).as("u"))
  }

  /** (vec_id, sub, sv): the M subvectors of each normalized vector. */
  private def subvectors(norm: DataFrame): DataFrame =
    norm.select(col("vec_id"), posexplode(
      array((0 until M).map(s => slice(col("u"), s * SubDim + 1, SubDim)): _*))
      .as(Seq("sub", "sv")))

  /** Squared L2 distance between two equal-length double arrays. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  private def dotArr(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Seed codebooks: per subspace, the subvectors of K hash-sampled
    * vectors (constant size M·K regardless of corpus scale). Output:
    * (sub, c_id 0..K-1, cv). */
  def seedCodebooks(e: DataFrame): DataFrame =
    seedCodebooksV(normalized(e))

  /** [[seedCodebooks]] over already-normalized/residual (vec_id, u)
    * vectors. */
  def seedCodebooksV(vs: DataFrame): DataFrame = {
    val sample = vs
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h", "vec_id").limit(K)
      .withColumn("c_id",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("h", "vec_id")) - 1).cast("int"))
    subvectors(sample.select(col("vec_id"), col("u")))
      .join(sample.select(col("vec_id"), col("c_id")), "vec_id")
      .select(col("sub"), col("c_id"), col("sv").as("cv"))
  }

  /** One k-means sweep per subspace: assign every subvector to its nearest
    * codebook entry, re-center entries on their member means (M·K·SubDim
    * groups total — constant, corpus-size independent). Halves the
    * quantization distortion of the raw sample on this corpus. */
  def refineCodebooks(e: DataFrame, books: DataFrame): DataFrame =
    refineCodebooksV(normalized(e).repartition(col("vec_id")), books)

  /** [[refineCodebooks]] over already-normalized/residual (vec_id, u)
    * vectors. */
  def refineCodebooksV(vs: DataFrame, books: DataFrame): DataFrame =
    subvectors(vs)
      .join(broadcast(books), "sub")
      .select(col("vec_id"), col("sub"), col("sv"), col("c_id"),
        l2sq(col("sv"), col("cv")).as("d"))
      .groupBy("vec_id", "sub")
      .agg(min_by(struct(col("c_id"), col("sv")), struct(col("d"), col("c_id"))).as("a"))
      .select(col("sub"), col("a.c_id").as("c_id"),
        posexplode(col("a.sv")).as(Seq("pos", "x")))
      .groupBy("sub", "c_id", "pos").agg(avg("x").as("m"))
      .groupBy("sub", "c_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("sub"), col("c_id"), transform(col("pm"), p => p("m")).as("cv"))

  /** Final codebooks: hash-sampled seeds + two k-means sweeps (the second
    * sweep buys ~5 recall points on the synthetic corpus; further sweeps
    * plateau). Training runs over a BOUNDED hash sample — at scale only
    * the encode pass reads the full corpus. */
  def codebooks(e: DataFrame): DataFrame = {
    // cache the sample: it feeds the seed draw plus both k-means sweeps,
    // each of which would otherwise re-run the corpus-wide TakeOrdered
    val t = Similarity.trainSample(e, Similarity.TrainN).cache()
    refineCodebooks(t, refineCodebooks(t, seedCodebooks(t)))
  }

  /** [[codebooks]] over already-normalized/residual (vec_id, u) vectors
    * (caller bounds + caches the training set). */
  def codebooksFor(vs: DataFrame): DataFrame =
    refineCodebooksV(vs, refineCodebooksV(vs, seedCodebooksV(vs)))

  /** Encode every vector as ONE packed int: 4 bits per subspace code
    * (nearest codebook entry by L2 in that subspace). */
  def encode(e: DataFrame, books: DataFrame): DataFrame =
    encodeVectors(normalized(e).repartition(col("vec_id")), books)

  /** [[encode]] over already-normalized/residual (vec_id, u) vectors. */
  def encodeVectors(vs: DataFrame, books: DataFrame): DataFrame =
    subvectors(vs.select(col("vec_id"), col("u")))
      .join(broadcast(books), "sub")
      .select(col("vec_id"), col("sub"), col("c_id"),
        l2sq(col("sv"), col("cv")).as("d"))
      .groupBy("vec_id", "sub")
      .agg(min_by(col("c_id"), struct(col("d"), col("c_id"))).as("code"))
      .groupBy("vec_id")
      // 32 bits used of a BIGINT column (a signed int32 can't hold code7>=8
      // without two's-complement games, and shiftleft on INT wraps at 32
      // bits; a production sink would emit the low 4 bytes as fixed-width
      // binary — the 64x compression is unchanged)
      .agg(sum(expr(s"shiftleft(CAST(code AS BIGINT), sub * $CodeBits)")).as("codes"))

  /** ADC scan: approx dot(query, x) = Σ_s table[s][code_s(x)], where the
    * 128-entry table holds dot(q_sub, centroid) per (sub, c_id). Returns
    * (vec_id, approx) for every encoded vector — one narrow pass over the
    * packed codes, raw vectors untouched. */
  def adcScores(encoded: DataFrame, books: DataFrame, qNorm: DataFrame): DataFrame = {
    val table = books.crossJoin(broadcast(qNorm))
      .select(col("sub"), col("c_id"),
        dotArr(col("cv"), slice(col("qu"), col("sub") * SubDim + 1, lit(SubDim)))
          .as("t"))
    encoded.select(col("vec_id"), posexplode(
      array((0 until M).map(s =>
        shiftright(col("codes"), s * CodeBits).bitwiseAND(lit(K - 1L)).cast("int")): _*))
      .as(Seq("sub", "c_id")))
      .join(broadcast(table), Seq("sub", "c_id"))
      .groupBy("vec_id").agg(sum("t").as("approx"))
  }

  /** PQ top-k with exact rerank: ADC-rank the whole corpus from the packed
    * codes, keep `rerank` candidates, then score those few exactly. */
  def pqTopK(e: DataFrame, queryVecId: Long, k: Int, rerank: Int): DataFrame = {
    val books = codebooks(e).cache()
    val qNorm = normalized(e.filter(col("vec_id") === queryVecId))
      .select(col("u").as("qu"))
    val cand = adcScores(encode(e, books), books, qNorm)
      .filter(col("vec_id") =!= queryVecId)
      .orderBy(col("approx").desc, col("vec_id")).limit(rerank)
    val q = broadcast(e.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv")))
    e.join(broadcast(cand.select("vec_id")), "vec_id")
      .crossJoin(q)
      .select(col("vec_id"),
        round(Similarity.cosineFast(e.sparkSession, "embedding", "qv"), 6)
          .cast("double").as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(k)
  }

  // --------------------------------------------------------------- IVF-PQ

  /** IVF-PQ (the composed FAISS-style ANN architecture): the constant-k
    * IVF coarse quantizer prunes the corpus to `nprobe` inverted lists,
    * and within the lists vectors are ranked from 4-byte PQ codes of their
    * RESIDUALS (x_u − centroid) via per-list ADC tables, with an exact
    * rerank of the survivors. dot(q,x) = dot(q,c) + dot(q, x−c): the first
    * term is the per-list bias, the second is Σ_s table[list][s][code].
    *
    * This is the 100 TB shape both tiers exist for: the coarse quantizer
    * bounds COMPUTE (scan nprobe/k of the corpus), the PQ codes bound
    * MEMORY (4 bytes/vector + constant codebooks + nprobe·M·K broadcast
    * tables), and raw vectors are touched only for `rerank` candidates.
    * Residual PQ beats plain PQ (sim5) because residuals concentrate near
    * 0 with far less variance than raw vectors, so the same 4-bit budget
    * quantizes finer. QuantizationSpec pins recall and the constant sizes.
    */
  def ivfpqTopK(e: DataFrame, queryVecId: Long, k: Int, nprobe: Int,
      rerank: Int): DataFrame = {
    // centroids, unit-normalized into cosine space: (list_id, cu)
    val csU = Similarity.centroids(e)
      .select(col("c_id").as("list_id"),
        transform(col("cv"), x => x.cast("double") /
          sqrt(aggregate(transform(col("cv"),
            y => y.cast("double") * y.cast("double")), lit(0.0), (a, v) => a + v)))
          .as("cu"))
      .cache()

    // assign every unit vector to its nearest centroid (max dot = cosine)
    val assigned = normalized(e).repartition(col("vec_id"))
      .crossJoin(broadcast(csU))
      .select(col("vec_id"), col("u"), col("list_id"),
        dotArr(col("u"), col("cu")).as("sim"))
      .groupBy("vec_id")
      .agg(max_by(struct(col("list_id"), col("u")),
        struct(col("sim"), col("list_id"))).as("a"))
      .select(col("vec_id"), col("a.list_id").as("list_id"), col("a.u").as("u"))

    // residuals r = u − cu, and PQ codebooks trained on a BOUNDED residual
    // sample (same discipline as codebooks(): train small, encode all)
    val res = assigned.join(broadcast(csU), "list_id")
      .select(col("vec_id"), col("list_id"),
        zip_with(col("u"), col("cu"), (x, y) => x - y).as("u"))
    val trainRes = res
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h", "vec_id").limit(Similarity.TrainN)
      .select("vec_id", "u").cache()
    val books = codebooksFor(trainRes).cache()

    // packed 32-bit residual codes, re-keyed by their inverted list
    val codes = encodeVectors(res, books)
      .join(res.select("vec_id", "list_id"), "vec_id")

    // query: probed lists = nprobe nearest centroids; per-list ADC table
    // over the residual query qr = qu − cu, plus the dot(q,c) bias
    val qU = normalized(e.filter(col("vec_id") === queryVecId))
      .select(col("u").as("qu"))
    val tables = csU.crossJoin(broadcast(qU))
      .select(col("list_id"), dotArr(col("qu"), col("cu")).as("bias"),
        zip_with(col("qu"), col("cu"), (x, y) => x - y).as("qr"))
      .orderBy(col("bias").desc, col("list_id")).limit(nprobe)
      .crossJoin(books)
      .select(col("list_id"), col("bias"), col("sub"), col("c_id"),
        dotArr(slice(col("qr"), col("sub") * SubDim + 1, lit(SubDim)), col("cv"))
          .as("t"))

    // ADC scan: only vectors in probed lists, scored purely from codes
    val cand = codes
      .select(col("vec_id"), col("list_id"), posexplode(
        array((0 until M).map(s =>
          shiftright(col("codes"), s * CodeBits).bitwiseAND(lit(K - 1L)).cast("int")): _*))
        .as(Seq("sub", "c_id")))
      .join(broadcast(tables), Seq("list_id", "sub", "c_id"))
      .groupBy("vec_id").agg((first("bias") + sum("t")).as("approx"))
      .filter(col("vec_id") =!= queryVecId)
      .orderBy(col("approx").desc, col("vec_id")).limit(rerank)

    // exact rerank of the survivors only
    val q = broadcast(e.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv")))
    e.join(broadcast(cand.select("vec_id")), "vec_id")
      .crossJoin(q)
      .select(col("vec_id"),
        round(Similarity.cosineFast(e.sparkSession, "embedding", "qv"), 6)
          .cast("double").as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(k)
  }

  /** SIM5/SIM6 as registered (unoracled) queries — approximate result
    * sets; QuantizationSpec pins recall and compression. */
  val defs: Seq[QueryDef] = Seq(
    QueryDef.unoracled("sim5_pq_topk") { (s, dir) =>
      pqTopK(Tables.embeddings(s, dir), queryVecId = 0L, k = 20, rerank = 100)
    },
    QueryDef.unoracled("sim6_ivfpq_topk") { (s, dir) =>
      ivfpqTopK(Tables.embeddings(s, dir), queryVecId = 0L, k = 20,
        nprobe = 8, rerank = 200)
    }
  )
}
