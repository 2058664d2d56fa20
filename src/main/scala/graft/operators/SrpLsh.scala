package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Signed-random-projection (hyperplane) LSH for cosine similarity — the
  * LSH-bucketed ANN variant (Charikar 2002, the same theory SimHash uses,
  * applied to real-valued embeddings instead of token bags).
  *
  * Fingerprint: bit i = sign(dot(v, r_i)) for NBits deterministic
  * pseudo-random hyperplanes r_i. P(bit agrees) = 1 − θ/π, so banding the
  * fingerprint buckets similar vectors together. Search:
  *
  *   - fingerprint pass: one NARROW map over the corpus (the hyperplanes
  *     ride along as a one-row broadcast; each bit is one fused
  *     `cosine_native` loop — sign(cos) = sign(dot)) — no shuffle;
  *   - probe: the query's band values are constant-size metadata; the
  *     candidate filter `OR_b band_b(fp) = q_b` is a narrow predicate —
  *     no join at all for single-query probes (a batch probe would
  *     equi-join on (band, value) exactly like Dedup.lshCandidates);
  *   - exact cosine rerank on candidates only.
  *
  * Scale: the fingerprint is write-once (persist next to the corpus like
  * IvfIndex's lists; NBits bits/vector), probes touch raw vectors only
  * for candidates. On this synthetic near-uniform corpus the candidate
  * fraction is large (like sim3, recall is bounded by fraction scanned on
  * uniform data — SimilaritySpec documents the same caveat); on real
  * clustered embeddings the same banding prunes far harder. The
  * structural property that matters at 100 TB: fingerprinting is linear
  * and narrow, candidates come from bucket equality, and nothing is ever
  * O(n²).
  *
  * Determinism: hyperplane component (i, d) derives from a pure integer
  * mix (splitmix64-style), so fingerprints are reproducible across runs
  * and engines — no RNG state anywhere.
  */
object SrpLsh {

  val NBits = 12      // 6 bands × 2 bits
  val Bands = 6
  val BitsPerBand = NBits / Bands
  private val BandMask = (1L << BitsPerBand) - 1

  /** Deterministic hyperplanes: splitmix64 finalizer over (i·dim + d),
    * mapped to [-1, 1]. */
  def hyperplane(i: Int, dim: Int): Array[Float] =
    Array.tabulate(dim) { d =>
      var z = (i.toLong * dim + d) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      // top 53 bits → [0, 1) → [-1, 1)
      ((z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
    }

  /** One-row frame carrying all hyperplanes (columns r0..r{NBits-1}),
    * broadcast onto the corpus so the fingerprint map stays narrow. */
  private def planesFrame(s: SparkSession, dim: Int): DataFrame = {
    import s.implicits._
    val row = (0 until NBits).map(i => hyperplane(i, dim).toSeq)
    Seq(Tuple1(row)).toDF("rs")
      .select((0 until NBits).map(i => element_at(col("rs"), i + 1).as(s"r$i")): _*)
  }

  /** (…, fp): attach the NBits-bit SRP fingerprint to every row of `e`. */
  def fingerprints(e: DataFrame, dim: Int = 64): DataFrame = {
    val s = e.sparkSession
    graft.functions.CosineNative.register(s)
    val bits = (0 until NBits).map(i =>
      when(expr(s"cosine_native(embedding, r$i)") >= 0, lit(1L << i))
        .otherwise(lit(0L)))
    Par.spread(e, col("vec_id")) // parallelize past the single input file
      .crossJoin(broadcast(planesFrame(s, dim)))
      .select(col("vec_id"), col("embedding"),
        bits.reduce(_ + _).as("fp"))
  }

  private[operators] def band(fp: Column, b: Int): Column =
    shiftright(fp, b * BitsPerBand).bitwiseAND(lit(BandMask))

  /** Predicate: the row's `fp` agrees with `qfp` on at least one band —
    * the bucket-membership test, a narrow codegen'd expression. */
  def sharesBandWith(qfp: Long): Column =
    (0 until Bands)
      .map(b => band(col("fp"), b) === lit((qfp >> (b * BitsPerBand)) & BandMask))
      .reduce(_ || _)

  /** Single-query probe over a prebuilt fingerprint frame
    * (vec_id, embedding, fp): candidates share ≥1 fingerprint band with
    * the query (narrow OR-filter — bucket equality without a join), then
    * exact cosine ranks the candidates. */
  def probe(e: DataFrame, fps: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val s = e.sparkSession
    graft.functions.CosineNative.register(s)
    // the query's band values: constant-size probe metadata (one row)
    val qfp = fps.filter(col("vec_id") === queryVecId)
      .select("fp").collect()(0).getLong(0)
    val q = broadcast(e.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv")))
    fps.filter(sharesBandWith(qfp))
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(q)
      .select(col("vec_id"),
        round(Similarity.cosineFast(s, "embedding", "qv"), 6)
          .cast("double").as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(k)
  }

  /** Fused fingerprint+probe in one call — the inline twin of the
    * persisted path (IvfIndex.srpTopKPersisted), which fingerprints once
    * per corpus instead of per query. */
  def srpTopK(e: DataFrame, queryVecId: Long, k: Int): DataFrame =
    probe(e, fingerprints(e), queryVecId, k)

  // ------------------------------------------------- semantic dedup (d12)

  /** d12 near-dup threshold (cosine) — matches d5's, so the two blocking
    * strategies (metadata label vs learned LSH) are directly comparable. */
  val DedupTau = 0.35

  /** D12 kernel — SemDeDup-style SEMANTIC dedup with LSH blocking: no
    * metadata labels needed (d5's blocking key does not exist in a raw
    * production corpus). Candidates = pairs sharing ≥ 1 fingerprint band
    * (keyed equi-join on (band, value) — the d3 banding shape applied to
    * embeddings, never all-pairs on clustered data); the exact cosine
    * verifies each candidate; the survivor policy is greedy keep-lowest
    * (a vector drops iff SOME lower-id candidate matches it at ≥ tau —
    * chains stay dropped; d7's transitive closure is the full-cluster
    * alternative). Returns (vec_id, kept).
    *
    * Fully ORACLED even though LSH is involved: the hyperplanes are pure
    * splitmix64 functions, so the oracle SQL reproduces the ENTIRE
    * pipeline — plane literals interpolated value-exact, sign bits from
    * the same left-to-right float→double dot folds, identical banding
    * arithmetic, same greedy policy — making this the d4 pattern
    * (algorithm-mirroring oracle) for the embedding tier. */
  def semanticDedup(e: DataFrame, tau: Double): DataFrame = {
    val s = e.sparkSession
    val bandStructs = (0 until Bands).map(bi =>
      struct(lit(bi).as("bi"), band(col("fp"), bi).as("bval")))
    // spread on the join keys (the d4b banded-self-join shape): both
    // branches of the band join canonicalize onto this one exchange, so
    // ReuseExchange computes the 64-plane fingerprint lineage ONCE and
    // the join runs at pinned width instead of a broadcast branch
    // re-deriving the fingerprints per side
    val bands = Par.spread(fingerprints(e)
      .select(col("vec_id"), col("embedding"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("vec_id"), col("embedding"),
        col("bs.bi").as("bi"), col("bs.bval").as("bval")),
      col("bi"), col("bval"))
    // the band join's INPUT is n·Bands narrow rows; its output (the
    // candidate pairs, with a duplicate per extra shared band) feeds the
    // codegen'd cosine + filter directly — no shuffle between them, and
    // the distinct collapses only the few pairs that SURVIVE tau
    val dropped = bands
      .select(col("bi"), col("bval"), col("vec_id").as("a_id"), col("embedding").as("av"))
      .join(bands.select(col("bi"), col("bval"), col("vec_id").as("b_id"),
        col("embedding").as("bv2")), Seq("bi", "bval"))
      .filter(col("a_id") < col("b_id"))
      .transform(Par.spread(_, col("a_id"), col("b_id")))
      .filter(Similarity.cosineFast(s, "av", "bv2") >= tau)
      .select(col("b_id").as("vec_id")).distinct()
    e.select("vec_id")
      .join(dropped.withColumn("__d", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("__d").isNull.as("kept"))
      .orderBy("vec_id")
  }

  /** The oracle's plane literals: the FLOAT hyperplane values emitted as
    * exact round-trip decimal doubles (Scala Double.toString is the
    * shortest representation that parses back to the same IEEE bits). */
  private def planeLiteral(i: Int, dim: Int): String =
    hyperplane(i, dim).map(f => f.toDouble.toString).mkString("[", ", ", "]")

  private def d12OracleSql: String = {
    val planes = (0 until NBits)
      .map(i => s"($i, ${planeLiteral(i, 64)})").mkString(",\n      ")
    val dot = "list_sum(list_transform(list_zip(e.embedding, p.r), z -> z[1]::DOUBLE * z[2]))"
    val cos = "list_sum(list_transform(list_zip(a.embedding, b.embedding), z -> z[1]::DOUBLE * z[2]::DOUBLE))" +
      " / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))" +
      " * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE))))"
    s"""WITH planes(i, r) AS (VALUES
      |      $planes),
      |fp AS (
      |  SELECT e.vec_id, e.embedding,
      |         CAST(sum(CASE WHEN $dot >= 0 THEN (1::BIGINT << p.i) ELSE 0 END) AS BIGINT) AS fp
      |  FROM embeddings e CROSS JOIN planes p
      |  GROUP BY e.vec_id, e.embedding),
      |bands AS (
      |  SELECT vec_id, embedding, b.bi, (fp >> ($BitsPerBand * b.bi)) & $BandMask AS bval
      |  FROM fp, (SELECT unnest(generate_series(0, ${Bands - 1})) AS bi) b),
      |dropped AS (
      |  SELECT DISTINCT b.vec_id AS vec_id
      |  FROM bands a JOIN bands b
      |    ON a.bi = b.bi AND a.bval = b.bval AND a.vec_id < b.vec_id
      |  WHERE $cos >= $DedupTau)
      |SELECT e.vec_id, (d.vec_id IS NULL) AS kept
      |FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.vec_id
      |ORDER BY e.vec_id""".stripMargin
  }

  /** D12, the fully-oracled LSH-blocked semantic dedup. */
  val defs: Seq[QueryDef] = Seq(
    QueryDef("d12_semantic_dedup", d12OracleSql) { (s, dir) =>
      semanticDedup(Tables.embeddings(s, dir), DedupTau)
    }
  )

  /** SIM7's raw top-k form, bench-only (the REGISTERED `sim7_ann_srp` is
    * RecallVerdict's oracled recall-floor verdict over this same plan),
    * served from the PERSISTED fingerprint frame; SrpLshSpec pins recall
    * vs sim1, pruning, and persisted≡inline. */
  val rawDefs: Seq[QueryDef] = Seq(
    QueryDef.unoracled("sim7_ann_srp_raw") { (s, dir) =>
      IvfIndex.srpTopKPersisted(Tables.embeddings(s, dir), dir,
        queryVecId = 0L, k = 20)
    }
  )
}
