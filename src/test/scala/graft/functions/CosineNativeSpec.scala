package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

class CosineNativeSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("native expression is BIT-identical to the HOF fold on real vectors") {
    CosineNative.register(spark)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        Similarity.cosine(col("embedding"), col("qv")).as("hof"),
        expr("cosine_native(embedding, qv)").as("native"))
      .collect()
    both.foreach { r =>
      // exact double equality — same accumulation order by construction
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(both.length > 0)
  }

  test("expression participates in whole-stage codegen") {
    CosineNative.register(spark)
    // plain projection, AQE off so the physical plan shows its codegen
    // stages directly (AQE re-wraps stages lazily and hides the marker)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(expr("cosine_native(embedding, embedding)").as("c"))
      // the `*(n)` prefix marks operators fused into a WholeStageCodegen
      // stage; the expression must sit INSIDE a starred Project
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
        l.contains("cosine_native") && l.trim.startsWith("*(")), s"plan:\n$plan")
      // and it executes through the generated code
      val n = df.filter(col("c") > 0.999999).count()
      assert(n === df.count()) // self-cosine == 1
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("null and mismatched-length inputs behave safely") {
    CosineNative.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 0.0f)), Some(Seq(1.0f, 0.0f))),
      (None, Some(Seq(1.0f, 0.0f))),
      (Some(Seq(1.0f, 0.0f, 5.0f)), Some(Seq(1.0f, 0.0f)))
    ).toDF("a", "b")
    val out = df.select(expr("cosine_native(a, b)").as("c")).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).isNullAt(0)) // null propagates
    assert(math.abs(out(2).getDouble(0) - 1.0) < 1e-12) // min-length semantics
  }
}
