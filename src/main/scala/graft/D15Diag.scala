package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the d15 probe path (not driver contract). */
object D15Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-d15diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d15] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    import graft.operators.{Dedup, SigIndex, TxLog}
    import graft.sources.Tables

    // warm JVM/codegen on the tiny sf first, like Bench does
    val d = SparkEntry.allDefs.find(_.name == "d15_incremental_neardup").get
    t("warm sf0.001 full")(d.run(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").format("noop").save())
    spark.catalog.clearCache()

    (1 to 3).foreach { rep =>
      t(s"rep$rep full d15")(d.run(spark, sfDir)
        .write.mode("overwrite").format("noop").save())
      spark.catalog.clearCache()
    }

    // now phase it
    val docs = Tables.documents(spark, sfDir)
    val neu = docs.filter(col("doc_id") % 5 === 0)
    val idx = t("pathFor+isFresh") {
      val m = SigIndex.getClass.getDeclaredMethod("pathFor", classOf[String])
      m.setAccessible(true)
      m.invoke(SigIndex, sfDir).asInstanceOf[String]
    }
    t("indexedCount")(println("  n=" + SigIndex.indexedCount(idx)))
    val nsh = t("nsh shingles+cache")(Dedup.shingles(neu).cache())
    t("nsh count")(println("  nsh=" + nsh.count()))
    val nbands = t("nbands minhash+bands") {
      val nb = Dedup.signatureBands(Dedup.minhashSignature(nsh)).cache()
      println("  nbands=" + nb.count()); nb
    }
    val v = t("currentVersion")(TxLog.currentVersion(s"$idx/t"))
    val bandScan = t("bands read plan")(SigIndex.bands(spark, idx))
    t("bands count")(println("  bands=" + bandScan.count()))
    val cand = t("cand join+distinct") {
      val c = bandScan.select(col("band"), col("bh"), col("doc_id").as("old_id"))
        .join(broadcast(nbands.select(col("band"), col("bh"),
          col("doc_id").as("new_id"))), Seq("band", "bh"))
        .select("old_id", "new_id").distinct().cache()
      println("  cand=" + c.count()); c
    }
    val posts = t("postings read")(SigIndex.postings(spark, idx))
    val oldSh = t("postings semijoin") {
      val o = posts.join(broadcast(cand.select(col("old_id").as("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
      println("  oldSh=" + o.count()); o
    }
    t("exactJaccard write") {
      val both = oldSh.unionByName(nsh)
      val pairs = Dedup.exactJaccard(both,
          cand.select(col("old_id").as("a_id"), col("new_id").as("b_id")))
        .filter(col("jac") >= Dedup.Tau)
      pairs.write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
