package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SrpLshSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("SRP-LSH recall@20 >= 0.8 vs brute force; banding actually prunes") {
    val brute = Similarity.defs.find(_.name == "sim1_cosine_topk").get
      .run(spark, sf).select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = SrpLsh.srpTopK(emb, queryVecId = 0L, k = 20)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(ann).size.toDouble / brute.size
    info(f"SRP recall@20 = $recall%.2f")
    assert(recall >= 0.8, s"recall $recall")

    // candidate set is a strict subset (the banding filter rejects some
    // of the corpus; on this near-uniform synthetic corpus the candidate
    // fraction is large by nature — see scaladoc — but must be < 1 and
    // the probe must reach its recall from that subset alone)
    val n = emb.count()
    val fps = SrpLsh.fingerprints(emb).cache()
    val qfp = fps.filter(col("vec_id") === 0L)
      .select("fp").collect()(0).getLong(0)
    val cand = fps.filter(SrpLsh.sharesBandWith(qfp)).count()
    info(f"candidate fraction = ${cand.toDouble / n}%.2f")
    assert(cand < n, s"banding pruned nothing: $cand of $n")
    fps.unpersist()
  }

  test("persisted SRP probe matches the inline fingerprint+probe result") {
    val persisted = IvfIndex.srpTopKPersisted(emb, sf, queryVecId = 0L, k = 20)
    val inline = SrpLsh.srpTopK(emb, queryVecId = 0L, k = 20)
    assert(persisted.collect().toSeq === inline.collect().toSeq)
  }

  test("fingerprints are deterministic (pure hyperplanes, no RNG state)") {
    val a = SrpLsh.fingerprints(emb).select("vec_id", "fp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = SrpLsh.fingerprints(emb).select("vec_id", "fp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.values.forall(fp => fp >= 0 && fp < (1L << SrpLsh.NBits)))
  }

  test("d12 semantic dedup: exact duplicates collapse to the lowest id; conservation; recall vs global pairs") {
    import spark.implicits._
    // plant two exact copies of vector 0 (identical embeddings share every
    // band, cosine 1.0 >= tau) — greedy keep-lowest must keep ONLY id 0
    val v0 = emb.filter(col("vec_id") === 0L).select("embedding")
      .collect()(0).getAs[scala.collection.Seq[Float]](0)
    val copies = Seq((900001L, v0), (900002L, v0))
      .toDF("vec_id", "embedding")
    val planted = emb.select("vec_id", "embedding").unionByName(copies)
    val res = SrpLsh.semanticDedup(planted, SrpLsh.DedupTau)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(res.size === res.keySet.size && res.size === emb.count() + 2)
    assert(res(0L), "lowest-id copy must survive")
    assert(!res(900001L) && !res(900002L), "higher-id exact copies must drop")

    // every dropped vector really has a lower-id tau-neighbor (precision,
    // via the independent HOF cosine), and banding catches >= 90% of the
    // GLOBAL tau-pair set (blocking recall — the SemDeDup quality metric)
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("av"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("bv"))
    val global = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .filter(Similarity.cosine(col("av"), col("bv")) >= SrpLsh.DedupTau)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val kept = SrpLsh.semanticDedup(emb, SrpLsh.DedupTau)
      .filter(!col("kept")).select("vec_id").collect().map(_.getLong(0)).toSet
    kept.foreach { dId =>
      assert(global.exists(_._2 == dId), s"dropped $dId has no global tau-neighbor with lower id")
    }
    val fps = SrpLsh.fingerprints(emb).select("vec_id", "fp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def shares(x: Long, y: Long): Boolean = (0 until SrpLsh.Bands).exists { bi =>
      ((fps(x) >> (bi * SrpLsh.NBits / SrpLsh.Bands)) & 3) ==
        ((fps(y) >> (bi * SrpLsh.NBits / SrpLsh.Bands)) & 3)
    }
    if (global.nonEmpty) {
      val capturedN = global.count { case (x, y) => shares(x, y) }
      info(f"blocking recall = ${capturedN.toDouble / global.size}%.3f over ${global.size} global pairs")
      assert(capturedN.toDouble / global.size >= 0.9)
    }
  }

  test("bit agreement tracks cosine (the SRP property: P(agree) = 1 - theta/pi)") {
    // the most-similar pair by brute cosine must agree on at least as
    // many bits as a dissimilar pair, statistically — check on the
    // query's best vs worst neighbor
    val q = broadcast(emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv")))
    val scored = emb.filter(col("vec_id") =!= 0).crossJoin(q)
      .select(col("vec_id"), Similarity.cosine(col("embedding"), col("qv")).as("c"))
      .orderBy(col("c").desc).collect()
    val (best, worst) = (scored.head.getLong(0), scored.last.getLong(0))
    val fps = SrpLsh.fingerprints(emb).select("vec_id", "fp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def agree(a: Long, b: Long): Int =
      SrpLsh.NBits - java.lang.Long.bitCount(fps(a) ^ fps(b))
    assert(agree(0L, best) >= agree(0L, worst),
      s"best-neighbor bit agreement ${agree(0L, best)} < worst ${agree(0L, worst)}")
  }
}
