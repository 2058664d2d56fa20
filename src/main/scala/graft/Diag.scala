package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the driver contract): times the
  * sub-stages of the heavy pipelines in isolation to localize cost. */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    import graft.operators.Dedup
    import graft.sources.Tables

    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      import graft.operators.Quantization
      val e = Tables.embeddings(spark, sfDir)
      val books = Quantization.codebooks(e)
      println("=== encodeNative plan ===")
      Quantization.encodeNative(e, books).explain("formatted")
      println("=== ivfAssign (nearest_centroid) plan ===")
      graft.operators.Similarity.ivfAssign(e).explain("formatted")
      println("=== d3 plan ===")
      SparkEntry.allDefs.find(_.name == "d3_minhash_lsh").get
        .run(spark, sfDir).explain()
      println("=== IvfIndex persisted probe plan (sim3) ===")
      graft.operators.IvfIndex
        .ivfTopKPersisted(e, sfDir, queryVecId = 0L, k = 20, nprobe = 8)
        .explain()
      println("=== d6 df-capped inverted-index plan ===")
      SparkEntry.allDefs.find(_.name == "d6_ngram_jaccard").get
        .run(spark, sfDir).explain()
      println("=== d9 line-dedup plan (round 4) ===")
      SparkEntry.allDefs.find(_.name == "d9_line_dedup").get
        .run(spark, sfDir).explain()
      println("=== j10 scalar-max decoration plan (round 4) ===")
      SparkEntry.allDefs.find(_.name == "j10_q15_top_supplier").get
        .run(spark, sfDir).explain()
      println("=== d13 substring-dedup plan (round 5) ===")
      SparkEntry.allDefs.find(_.name == "d13_substring_dedup").get
        .run(spark, sfDir).explain()
      println("=== d14 tf-idf cosine plan (round 5) ===")
      SparkEntry.allDefs.find(_.name == "d14_tfidf_cosine").get
        .run(spark, sfDir).explain()
      println("=== t11 edit-distance plan (round 5) ===")
      SparkEntry.allDefs.find(_.name == "t11_edit_distance").get
        .run(spark, sfDir).explain()
      spark.stop(); return
    }

    if (sys.env.contains("SPARK_GRAFT_D7")) {
      import graft.operators.Dedup
      val d7 = SparkEntry.allDefs.find(_.name == "d7_dedup_clusters").get
      t("d7 full COLD")(d7.run(spark, sfDir).write.mode("overwrite").format("noop").save())
      spark.catalog.clearCache()
      t("d7 full WARM")(d7.run(spark, sfDir).write.mode("overwrite").format("noop").save())
      spark.catalog.clearCache()
      val d = Tables.documents(spark, sfDir)
      val sh = Dedup.shingles(d).cache()
      val pairs = Dedup.exactJaccard(sh, Dedup.lshCandidates(Dedup.minhashSignature(sh)))
        .filter(col("jac") >= 0.7).select("a_id", "b_id")
      t("pairs build+count")(pairs.count())
      t("connectedComponents")(
        Dedup.connectedComponents(d.select("doc_id"), pairs).count())
      spark.stop(); return
    }

    val d3 = SparkEntry.allDefs.find(_.name == "d3_minhash_lsh").get
    t("d3 full COLD")(d3.run(spark, sfDir).write.mode("overwrite").format("noop").save())
    spark.catalog.clearCache()
    t("d3 full WARM")(d3.run(spark, sfDir).write.mode("overwrite").format("noop").save())
    spark.catalog.clearCache()

    val d = Tables.documents(spark, sfDir)
    t("docs count")(d.count())
    val sh = Dedup.shingles(d)
    t("shingles count")(sh.count())
    val shc = sh.cache()
    t("shingles cache count")(shc.count())
    val sig = Dedup.minhashSignature(shc)
    t("signatures count")(sig.count())
    val cand = Dedup.lshCandidates(sig)
    t("candidates count")(cand.count())
    val jac = Dedup.exactJaccard(shc, cand)
    t("exact jaccard count")(jac.count())
    t("full d3 second pass")(
      Dedup.exactJaccard(shc, Dedup.lshCandidates(Dedup.minhashSignature(shc)))
        .filter(col("jac") >= 0.7).count())
    spark.stop()
  }
}
