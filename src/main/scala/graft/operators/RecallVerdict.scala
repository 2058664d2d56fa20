package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The REGISTERED (oracled) form of the approximate-ANN tier: each approx
  * query (sim3/5/6/7/8/10) runs next to its EXACT registered twin (sim1
  * brute-force top-k, sim2 brute-force kNN join, sim9 filtered brute
  * force) and emits only the engine-independent verdict — "recall met its
  * pinned floor". The oracle states the constant TRUE, so the cross-engine
  * hash check validates the ANN path without requiring DuckDB to reproduce
  * hash-seeded centroids or hyperplanes: a recall regression flips the row
  * to FALSE and fails the driver's hash compare. The raw top-k dumps
  * survive as bench-only `*_raw` queries (SparkEntry.benchOnlyDefs), so
  * the probe plans stay timed without reopening `no_oracle` rows.
  *
  * Floors are the ones the ScalaTest specs pin (SimilaritySpec 0.8,
  * QuantizationSpec 0.9 / 0.75, SrpLshSpec 0.8, IvfIndexSpec mean 0.7)
  * expressed in EXACT integer arithmetic: matched-id count ≥ ceil(floor·k)
  * — no floating-point recall ratio anywhere, so the verdict cannot drift
  * on representation.
  *
  * Both sides run registered QueryDefs (looked up by name from the raw
  * bench rosters), so the verdict certifies the literal production probe
  * plan, not a reimplementation. Cost: one extra brute-force pass per
  * verdict — linear, broadcast-query, no new shuffle shapes.
  */
object RecallVerdict {

  private def byName(name: String, defs: Seq[QueryDef]): (SparkSession, String) => DataFrame =
    defs.find(_.name == name)
      .getOrElse(sys.error(s"no registered query named $name")).run

  private val sim1 = byName("sim1_cosine_topk", Similarity.defs)
  private val sim2 = byName("sim2_knn_join", Similarity.defs)
  private val sim9 = byName("sim9_filtered_topk", Similarity.defs)
  private val sim10 = byName("sim10_filtered_ann_raw", IvfIndex.rawDefs)
  private val sim3 = Similarity.annDef.run
  private val sim5 = byName("sim5_pq_topk_raw", Quantization.rawDefs)
  private val sim6 = byName("sim6_ivfpq_topk_raw", Quantization.rawDefs)
  private val sim7 = byName("sim7_ann_srp_raw", SrpLsh.rawDefs)
  private val sim8 = byName("sim8_knn_join_ivf_raw", IvfIndex.rawDefs)

  /** |exact ∩ approx| ≥ minMatch over the id columns `keys` — one verdict
    * row. Both inputs are k-row (or |q|·k-row) frames, so the join is
    * driver-negligible; the heavy lifting already happened inside the two
    * query plans. */
  private def verdict(exact: DataFrame, approx: DataFrame, keys: Seq[String],
      minMatch: Long): DataFrame =
    exact.select(keys.map(col): _*)
      .join(approx.select(keys.map(col): _*), keys)
      .agg((count(lit(1)) >= minMatch).as("recall_ge_floor"))

  private val SingleOracle =
    "SELECT CAST(0 AS BIGINT) AS query_vec, TRUE AS recall_ge_floor"

  /** Registered form of a single-query top-20 ANN variant: recall@20 vs
    * sim1's exact answer, floor as a matched count (16 = 0.8·20, etc.). */
  private def topkVerdict(name: String, minMatch: Long,
      approx: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, SingleOracle) { (s, dir) =>
      verdict(sim1(s, dir), approx(s, dir), Seq("vec_id"), minMatch)
        .select(lit(0L).as("query_vec"), col("recall_ge_floor"))
    }

  val defs: Seq[QueryDef] = Seq(
    // floors = the spec pins, as exact integer matched-count thresholds
    topkVerdict("sim3_ann_ivf", minMatch = 16, sim3),    // 0.80·20
    topkVerdict("sim5_pq_topk", minMatch = 18, sim5),    // 0.90·20
    topkVerdict("sim6_ivfpq_topk", minMatch = 15, sim6), // 0.75·20
    topkVerdict("sim7_ann_srp", minMatch = 16, sim7),    // 0.80·20

    // sim8: batch kNN join (10 queries × top-5). IvfIndexSpec pins MEAN
    // recall@5 ≥ 0.7; mean ≥ 0.7 over 10×5 pairs ⇔ total matches ≥ 35 —
    // the same bound in exact integers.
    QueryDef("sim8_knn_join_ivf",
      "SELECT CAST(10 AS BIGINT) AS n_queries, TRUE AS recall_ge_floor") { (s, dir) =>
      verdict(sim2(s, dir), sim8(s, dir), Seq("q_id", "vec_id"), minMatch = 35)
        .select(lit(10L).as("n_queries"), col("recall_ge_floor"))
    },

    // sim10: filtered ANN vs sim9's EXACT filtered answer — same 0.8·20
    // floor as the unfiltered tier, certified on the label-restricted
    // candidate set (the widened probe must not have thinned recall).
    QueryDef("sim10_filtered_ann", SingleOracle) { (s, dir) =>
      verdict(sim9(s, dir), sim10(s, dir), Seq("vec_id"), minMatch = 16)
        .select(lit(0L).as("query_vec"), col("recall_ge_floor"))
    }
  )
}
