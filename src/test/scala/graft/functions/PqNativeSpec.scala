package graft.functions

import graft.SparkSpec
import graft.operators.{Quantization, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The native quantization kernels must agree with their DataFrame-algebra
  * twins (the join + grouped-argmin formulations they replace). */
class PqNativeSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("pq_encode == algebraic encode, code for code") {
    val books = Quantization.codebooks(emb).cache()
    val alg = Quantization.encode(emb, books)
      .withColumnRenamed("codes", "alg_codes")
    val nat = Quantization.encodeNative(emb, books)
    val joined = alg.join(nat, "vec_id").cache()
    assert(joined.count() === emb.count())
    val diff = joined.filter(col("alg_codes") =!= col("codes")).count()
    assert(diff === 0, s"$diff vectors encoded differently")
    joined.unpersist(); books.unpersist()
  }

  test("pq_adc == algebraic ADC within float tolerance") {
    val books = Quantization.codebooks(emb).cache()
    val qNorm = Quantization.normalized(emb.filter(col("vec_id") === 0))
      .select(col("u").as("qu"))
    val enc = Quantization.encodeNative(emb, books).cache()
    val alg = Quantization.adcScores(enc, books, qNorm)
      .withColumnRenamed("approx", "alg_approx")
    val nat = Quantization.adcScoresNative(enc, books, qNorm)
    // the algebraic form sums the 8 per-subspace terms in shuffle order,
    // the native loop in subspace order — equal up to fp reassociation
    val bad = alg.join(nat, "vec_id")
      .filter(abs(col("alg_approx") - col("approx")) > 1e-9).count()
    assert(bad === 0)
    enc.unpersist(); books.unpersist()
  }

  test("native kernels are null-safe (null vector -> null result, no crash)") {
    import spark.implicits._
    PqNative.register(spark)
    val df = Seq(
      (1L, Some(Array(1.0f, 0.0f))),
      (2L, Option.empty[Array[Float]]))
      .toDF("vec_id", "embedding")
      .withColumn("cents", typedLit(Array(1.0, 0.0, 0.0, 1.0)))
    val got = df.selectExpr("vec_id", "nearest_centroid(embedding, cents) AS c")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(got(1L) === Some(0))
    assert(got(2L) === None)
  }

  test("nearest_centroid == algebraic argmax-cosine assignment") {
    val cs = Similarity.centroids(emb).cache()
    val nat = Similarity.assignTo(emb, cs).select("vec_id", "list_id")
    val alg = emb.crossJoin(broadcast(cs))
      .select(col("vec_id"), col("c_id"),
        Similarity.cosine(col("embedding"), col("cv")).as("sim"))
      .groupBy("vec_id")
      .agg(max_by(col("c_id"), struct(col("sim"), col("c_id"))).as("alg_list"))
    val bad = nat.join(alg, "vec_id")
      .filter(col("list_id") =!= col("alg_list")).count()
    assert(bad === 0, s"$bad vectors assigned to different lists")
    cs.unpersist()
  }

  test("top_centroids == algebraic top-R ranking; element 0 == nearest_centroid") {
    import org.apache.spark.sql.expressions.Window
    val cs = Similarity.centroids(emb).cache()
    val r = Similarity.AssignR
    // kernel: R (vec_id, rank, list_id) rows per vector
    val nat = Similarity.assignTo(emb, cs, r)
      .groupBy("vec_id")
      .agg(collect_list(col("list_id")).as("nat_lists"))
    // algebraic twin: rank centroids per vector by (cosine desc, c_id asc)
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("c_id"))
    val alg = emb.crossJoin(broadcast(cs))
      .select(col("vec_id"), col("c_id"),
        Similarity.cosine(col("embedding"), col("cv")).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= r)
      .groupBy("vec_id")
      .agg(array_sort(collect_list(col("c_id"))).as("alg_lists"))
    val bad = nat
      .select(col("vec_id"), array_sort(col("nat_lists")).as("nat_lists"))
      .join(alg, "vec_id")
      .filter(col("nat_lists") =!= col("alg_lists")).count()
    assert(bad === 0, s"$bad vectors with different top-$r centroid sets")
    cs.unpersist()
  }
}
