package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("PQ + exact rerank: recall@20 >= 0.9 vs brute force") {
    val brute = Similarity.defs.find(_.name == "sim1_cosine_topk").get
      .run(spark, sf).select("vec_id").collect().map(_.getLong(0)).toSet
    val pq = Quantization.pqTopK(emb, queryVecId = 0L, k = 20, rerank = 300)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(pq).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("codes pack into one BIGINT (32x smaller than raw floats); every vector encoded") {
    val books = Quantization.codebooks(emb)
    val enc = Quantization.encode(emb, books).cache()
    assert(enc.count() === emb.count())
    // M·CodeBits = 64: the packed BIGINT may use every bit (incl. sign);
    // validity is per 4-bit field, checked below
    // every subspace code is a valid codebook id
    val ids = enc.select(posexplode(array((0 until Quantization.M).map(s =>
      shiftright(col("codes"), s * 4).bitwiseAND(lit(15L))): _*)).as(Seq("sub", "c")))
    assert(ids.filter(col("c") < 0 || col("c") >= Quantization.K).count() === 0)
    enc.unpersist()
  }

  test("codebook size is constant — independent of corpus size") {
    val n1 = Quantization.codebooks(emb).count()
    val doubled = emb.unionByName(
      emb.withColumn("vec_id", col("vec_id") + 1000000L))
    val n2 = Quantization.codebooks(doubled).count()
    assert(n1 === (Quantization.M * Quantization.K).toLong)
    assert(n2 === n1, s"codebook grew with corpus: $n1 -> $n2")
  }

  test("IVF-PQ + exact rerank: recall@20 >= 0.75 vs brute force") {
    val brute = Similarity.defs.find(_.name == "sim1_cosine_topk").get
      .run(spark, sf).select("vec_id").collect().map(_.getLong(0)).toSet
    val got = Quantization.ivfpqTopK(emb, queryVecId = 0L, k = 20,
      nprobe = 8, rerank = 400)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(got).size.toDouble / brute.size
    // bounded below by the IVF probe coverage (nprobe/k lists of a
    // near-uniform corpus — same bound SimilaritySpec documents for sim3);
    // the PQ+rerank stage must not lose candidates the probe found
    assert(recall >= 0.75, s"recall $recall")
  }

  test("IVF-PQ auxiliary state is constant-size (codebooks, ADC tables)") {
    // residual codebooks: M*K entries regardless of corpus size — reuse
    // the generic trainer the IVF-PQ path calls internally
    val n1 = Quantization.codebooksFor(
      Quantization.normalized(emb).limit(200).cache()).count()
    assert(n1 === (Quantization.M * Quantization.K).toLong)
    // a doubled corpus yields the same IVF centroid count (the coarse
    // quantizer the per-list ADC tables are keyed by)
    val doubled = emb.unionByName(
      emb.withColumn("vec_id", col("vec_id") + 1000000L))
    assert(Similarity.centroids(doubled).count() <= Similarity.IvfK.toLong)
  }

  test("ADC approximation correlates with exact cosine (sanity on ordering quality)") {
    val books = Quantization.codebooks(emb).cache()
    val qNorm = emb.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x =>
        x.cast("double") / sqrt(aggregate(transform(col("embedding"),
          y => y.cast("double") * y.cast("double")), lit(0.0), (a, v) => a + v)))
        .as("qu"))
    val approx = Quantization.adcScores(Quantization.encode(emb, books), books, qNorm)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val exact = emb.crossJoin(broadcast(q))
      .select(col("vec_id"), Similarity.cosine(col("embedding"), col("qv")).as("cos"))
    val joined = approx.join(exact, "vec_id")
      .select(corr("approx", "cos")).collect()(0).getDouble(0)
    assert(joined > 0.7, s"ADC scores should track exact cosine, corr=$joined")
  }
}
