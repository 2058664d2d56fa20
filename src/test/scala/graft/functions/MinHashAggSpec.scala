package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The custom minhash_agg TypedImperativeAggregate must produce the same
  * signature, slot for slot, as the 64-wide built-in aggregate it
  * replaces, and must plan with partial aggregation (map-side combine). */
class MinHashAggSpec extends SparkSpec {

  test("minhash_agg == 64 min(xxhash64) columns, slot for slot") {
    val sh = Dedup.shingles(Tables.documents(spark, sf)).cache()
    val agg = Dedup.minhashSignature(sh)
    val wide = Dedup.minhashSignatureWide(sh).withColumnRenamed("sig", "wide_sig")
    val joined = agg.join(wide, "doc_id").cache()
    assert(joined.count() > 0)
    val bad = joined.filter(col("sig") =!= col("wide_sig")).count()
    assert(bad === 0, s"$bad documents with diverging signatures")
    joined.unpersist(); sh.unpersist()
  }

  test("minhash_agg plans with partial aggregation (two aggregate stages)") {
    val sig = Dedup.minhashSignature(
      Dedup.shingles(Tables.documents(spark, sf)))
    val plan = sig.queryExecution.executedPlan.toString
    // ObjectHashAggregate partial_minhash_agg ... Exchange ... final
    assert(plan.contains("partial_minhash_agg"), s"no partial stage:\n$plan")
    assert(plan.contains("minhash_agg"), plan)
  }

  test("signature is insensitive to shingle arrival order") {
    val sh = Dedup.shingles(Tables.documents(spark, sf))
    val a = Dedup.minhashSignature(sh)
    val b = Dedup.minhashSignature(sh.orderBy(desc("g")))
    assert(a.join(b.withColumnRenamed("sig", "b_sig"), "doc_id")
      .filter(col("sig") =!= col("b_sig")).count() === 0)
  }
}
