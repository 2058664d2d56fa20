package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the d17 lifecycle (not driver contract). */
object D17Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-d17diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d17] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    import graft.operators.{SigIndex, TxLog}
    import graft.sources.Tables

    val d = SparkEntry.allDefs.find(_.name == "d17_index_follows_feed").get
    t("warm sf0.001 full")(d.run(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").format("noop").save())
    spark.catalog.clearCache()
    t("rep1 full d17")(d.run(spark, sfDir)
      .write.mode("overwrite").format("noop").save())
    spark.catalog.clearCache()

    // phased replica of runFollowLifecycle
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val tag = System.nanoTime()
    val corpusRoot = s"/root/repo/target/d17diag-corpus-$tag"
    val idx = s"/root/repo/target/d17diag-index-$tag"
    t("init corpus")(TxLog.init(spark, corpusRoot,
      docs.filter(col("doc_id") % 3 === 0).repartition(4)))
    t("buildFrom")(SigIndex.buildFrom(spark, corpusRoot, idx))
    t("appendOnce b1")(TxLog.appendOnce(spark, corpusRoot, "b1",
      docs.filter(col("doc_id") % 3 === 1)))
    t("deleteMoR")(TxLog.deleteMoR(spark, corpusRoot, col("doc_id") % 7 === 0))
    t("updateMoR")(TxLog.updateMoR(spark, corpusRoot, col("doc_id") % 11 === 1,
      Seq("text" -> concat(col("text"), lit(" EDITED")))))
    t("compact")(TxLog.compact(spark, corpusRoot, targetFiles = 4))
    // sync phases. The feed-read cost is measured on a DIAGNOSTIC
    // readChanges (same range sync will fold); the fold itself runs as
    // production code — SigIndex.sync → foldFeed → ONE atomic
    // TxLog.replaceKeysMoR commit (the r16 shape: DV-forget touched keys
    // + append restatements in the same manifest) — so the "sync" phase
    // here times exactly what d17 executes, feed read included again.
    val from = 1L
    val to = TxLog.currentVersion(corpusRoot)
    val feed = t("readChanges plan (diag)")(
      TxLog.readChanges(spark, corpusRoot, from, to).cache())
    t("feed materialize (diag)")(println("  feed=" + feed.count()))
    feed.unpersist()
    t("sync (atomic fold, prod path)")(SigIndex.sync(spark, idx, corpusRoot))
    t("probe+write")(SigIndex.probe(spark, idx,
        docs.filter(col("doc_id") % 3 === 2))
      .orderBy("old_id", "new_id")
      .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
