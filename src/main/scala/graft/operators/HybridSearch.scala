package graft.operators

import graft.QueryDef
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion (RRF) of the lexical and
  * dense rankings, the standard two-tower retrieval shape (BM25 candidates
  * ∪ embedding candidates → one fused list). Fusion is rank-based on
  * purpose: scores from different retrievers are incommensurable, ranks
  * are not, and RRF (Σ 1/(60+rank), the TREC constant) is the
  * boringly-effective fusion every hybrid search stack ships.
  *
  * Both input rankings are the REGISTERED, already-hash-certified queries
  * (t10_bm25 over documents, sim1_cosine_topk over embeddings — vec_id IS
  * the embedded document's doc_id), looked up from the registry so the
  * fusion certifies the production kernels, not copies. The oracle
  * composes the same two oracle texts as CTEs and fuses in SQL — every
  * arithmetic step (CAST(1 AS DOUBLE) divisions, coalesce-to-0 sum,
  * round 6) runs on identical operands in both engines, so the fused list
  * hash-matches end to end.
  *
  * Scale shape: each branch is its own already-audited plan; fusion joins
  * two k-row frames (k = 20) — driver-negligible, no new shuffle shapes.
  */
object HybridSearch {

  private def defByName(name: String, defs: Seq[QueryDef]): QueryDef =
    defs.find(_.name == name).getOrElse(sys.error(s"no registered query named $name"))

  private val bm25 = defByName("t10_bm25", TextAnalysis.defs)
  private val cosine = defByName("sim1_cosine_topk", Similarity.defs)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ret1_hybrid_rrf",
      s"""WITH bm_base AS (${bm25.oracle.get}),
        |cos_base AS (${cosine.oracle.get}),
        |bm AS (SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rb
        |       FROM bm_base),
        |cs AS (SELECT vec_id,
        |         CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rc
        |       FROM cos_base),
        |f AS (SELECT coalesce(bm.doc_id, cs.vec_id) AS id,
        |        coalesce(CAST(1 AS DOUBLE) / CAST(60 + bm.rb AS DOUBLE), 0)
        |        + coalesce(CAST(1 AS DOUBLE) / CAST(60 + cs.rc AS DOUBLE), 0) AS rrf
        |      FROM bm FULL OUTER JOIN cs ON bm.doc_id = cs.vec_id)
        |SELECT id, CAST(round(rrf, 6) AS DOUBLE) AS rrf
        |FROM f ORDER BY rrf DESC, id LIMIT 20""".stripMargin) { (s, dir) =>
      val bm = bm25.run(s, dir)
        .withColumn("rb", row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("rb"))
      val cs = cosine.run(s, dir)
        .withColumn("rc", row_number().over(
          Window.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
        .select(col("vec_id"), col("rc"))
      // k-row frames: the single-partition window and full-outer join are
      // over 20 rows each, never the corpus
      bm.join(cs, bm("doc_id") === cs("vec_id"), "full_outer")
        .select(coalesce(col("doc_id"), col("vec_id")).as("id"),
          (coalesce(lit(1.0) / (lit(60L) + col("rb")).cast("double"), lit(0.0)) +
           coalesce(lit(1.0) / (lit(60L) + col("rc")).cast("double"), lit(0.0))).as("rrf"))
        .select(col("id"), round(col("rrf"), 6).cast("double").as("rrf"))
        .orderBy(col("rrf").desc, col("id")).limit(20)
    },

    // RET2: MMR diversification — greedy maximal-marginal-relevance
    // re-rank of sim1's top-20 (λ = 1/2: score = rel/2 − maxSimToPicked/2;
    // halving a double is exact binary scaling, so both engines compute
    // identical IEEE values from the identically-rounded rel/sim inputs).
    // The oracle UNROLLS the 5 greedy steps as chained CTEs — the g1
    // fixed-sweep pattern applied to selection. The Spark side's per-step
    // driver pick is k-bounded (5 actions over ≤20-row frames): rerank
    // happens on the serving node in any production stack; the corpus
    // work (candidate generation) stays in sim1's audited plan.
    QueryDef("ret2_mmr_diversify", {
      val K = 5
      val steps = (2 to K).map { k =>
        s"""p$k AS (
          |  SELECT c.vec_id, c.cos,
          |         c.cos / 2 - (SELECT max(p.sim) FROM pair p
          |                      WHERE p.ai = c.vec_id
          |                        AND p.bi IN (SELECT vec_id FROM sel${k - 1})) / 2 AS score
          |  FROM cand c
          |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${k - 1})
          |  ORDER BY score DESC, c.vec_id LIMIT 1),
          |sel$k AS (SELECT vec_id FROM sel${k - 1} UNION ALL SELECT vec_id FROM p$k)""".stripMargin
      }.mkString(",\n")
      val emit = (1 to K).map(k =>
        s"SELECT $k AS rank, vec_id, CAST(round(score, 6) AS DOUBLE) AS mmr FROM p$k")
        .mkString("\n UNION ALL ")
      s"""WITH cand AS (${defByName("sim1_cosine_topk", Similarity.defs).oracle.get}),
        |pair AS (
        |  SELECT a.vec_id AS ai, b.vec_id AS bi,
        |         CAST(round(${Similarity.cosSql("ea.embedding", "eb.embedding")}, 6) AS DOUBLE) AS sim
        |  FROM cand a JOIN embeddings ea ON ea.vec_id = a.vec_id
        |       JOIN cand b ON b.vec_id <> a.vec_id
        |       JOIN embeddings eb ON eb.vec_id = b.vec_id),
        |p1 AS (SELECT vec_id, cos, cos / 2 AS score FROM cand
        |       ORDER BY score DESC, vec_id LIMIT 1),
        |sel1 AS (SELECT vec_id FROM p1),
        |$steps
        |$emit
        |ORDER BY rank""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val K = 5
      val cand = cosine.run(s, dir).select("vec_id", "cos").cache()
      val withVec = cand.join(graft.sources.Tables.embeddings(s, dir), "vec_id")
        .select(col("vec_id"), col("cos"), col("embedding"))
      val a = withVec.select(col("vec_id").as("ai"), col("embedding").as("ea"))
      val b = withVec.select(col("vec_id").as("bi"), col("embedding").as("eb"))
      // 20×19 candidate pairs — broadcast-tiny, never the corpus
      val pair = a.crossJoin(b).filter(col("ai") =!= col("bi"))
        .select(col("ai"), col("bi"),
          round(Similarity.cosineFast(s, "ea", "eb"), 6).cast("double").as("sim"))
        .cache()
      try {
        var picked = Vector.empty[(Int, Long, Double)]
        for (k <- 1 to K) {
          val sel = picked.map(_._2)
          val scored =
            if (sel.isEmpty) cand.select(col("vec_id"), (col("cos") / 2).as("score"))
            else cand.filter(!col("vec_id").isInCollection(sel))
              .join(pair.filter(col("bi").isInCollection(sel)),
                col("vec_id") === col("ai"))
              .groupBy(col("vec_id"), col("cos"))
              .agg(max(col("sim")).as("ms"))
              .select(col("vec_id"), (col("cos") / 2 - col("ms") / 2).as("score"))
          val row = scored.orderBy(col("score").desc, col("vec_id")).limit(1).head()
          picked :+= ((k, row.getLong(0), row.getDouble(1)))
        }
        picked.toDF("rank", "vec_id", "mmr")
          .select(col("rank"), col("vec_id"),
            round(col("mmr"), 6).cast("double").as("mmr"))
          .orderBy("rank")
      } finally { cand.unpersist(); pair.unpersist() }
    }
  )
}
