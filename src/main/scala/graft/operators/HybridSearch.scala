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
    }
  )
}
