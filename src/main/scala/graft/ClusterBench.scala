package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-clustering scaling certificate: the nightly layout pass
  * must cost O(the day's files), never O(table). A FIXED 100k-row tail
  * (the "day's batch") is appended to key-clustered tables of growing
  * size (1M → 4M → 16M rows) and folded with
  * [[graft.operators.TxLog.clusterIncremental]]:
  *
  *  - fold bytes/wall must stay FLAT at the tail's size as the table
  *    grows 16× (every sorted-generation file carries by reference);
  *  - the full [[graft.operators.TxLog.cluster]] rewrite of the same
  *    tables (the "major compaction") grows linearly — the contrast is
  *    the certificate, exactly MERGE_BENCH's shape;
  *  - cross-generation pruning stays live: a second-dimension band
  *    predicate keeps ≤ half the files after the fold (recorded).
  *
  * Single-shot walls; run on a quiet host, adjudicate outliers by
  * re-run. scripts/run_cluster_bench.sh. */
object ClusterBench {

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/CLUSTER_BENCH_r14.json")
    val sizes = args.lift(1).map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(1000000L, 4000000L, 16000000L))
    val tailRows = 100000L
    val rowsPerFile = 250000L
    val spark = SparkSession.builder()
      .appName("graft-cluster-bench").master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TxLog

    def frame(a: Long, b: Long): org.apache.spark.sql.DataFrame =
      spark.range(a, b).toDF("id")
        .select(col("id"), (col("id") % 97).as("m"),
          concat(
            md5(col("id").cast("string").cast("binary")),
            md5((col("id") + 1).cast("string").cast("binary")),
            md5((col("id") + 2).cast("string").cast("binary"))).as("payload"))

    def bytesUnder(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      walk(new java.io.File(dir))
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", v)

    val perSize = sizes.map { n =>
      val root = s"/root/repo/target/cluster-bench-$n-${System.nanoTime()}"
      val nFiles = math.max(2L, n / rowsPerFile).toInt
      TxLog.init(spark, root, frame(0L, n).repartition(nFiles, col("id")))
      // establish the sorted baseline (this is the "major compaction"
      // each nightly fold is measured against)
      val (_, fullSec) = timed(
        TxLog.cluster(spark, root, Seq("id", "m"), targetFiles = nFiles))
      // the day's batch lands and folds
      TxLog.appendOnce(spark, root, "tail",
        frame(100000000L, 100000000L + tailRows))
      val genFiles = TxLog.snapshot(root).get.entries.size
      val bytes0 = bytesUnder(s"$root/data")
      val (_, foldSec) = timed(
        TxLog.clusterIncremental(spark, root, Seq("id", "m"), targetFiles = 2))
      val foldBytes = bytesUnder(s"$root/data") - bytes0
      val after = TxLog.snapshot(root).get
      // cross-generation pruning: the second dimension still skips
      val (kept, total) = {
        val (k, t) = TxLog.pruneEntries(spark, after, "m < 5")
        (k.size, t)
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val line = s"""{"rows":$n,"files":$genFiles,""" +
        s""""full_cluster_sec":${fmt(fullSec)},""" +
        s""""fold_sec":${fmt(foldSec)},"fold_bytes":$foldBytes,""" +
        s""""band_kept":$kept,"band_total":$total}"""
      println(s"[cluster-bench] $line")
      line
    }

    // ---- GENERATION POLICY: repeated nightly folds on ONE table,
    // through the maxGenerations promotion. Certifies (a) skipping
    // quality — the files a second-dimension band probe keeps — stays
    // bounded as sorted generations accumulate, and (b) the fold that
    // would exceed the bound promotes to the full rewrite (the automated
    // LSM major compaction) and resets the generation count to 1.
    val genSection = {
      val n = 2000000L
      val maxGen = 4
      val root = s"/root/repo/target/cluster-bench-gen-${System.nanoTime()}"
      TxLog.init(spark, root, frame(0L, n).repartition(8, col("id")))
      def generations: Int = TxLog.snapshot(root).get.entries.iterator
        .filter(_.path.startsWith("data/c-z"))
        .map(_.path.split('/')(1)).toSet.size
      // try/finally: a fold failure must not strand the multi-million-row
      // bench table under target/ (it accumulates across failed runs)
      val folds =
        try (1 to 6).map { k =>
          if (k > 1) TxLog.appendOnce(spark, root, s"tail-$k",
            frame(200000000L + k * tailRows, 200000000L + (k + 1) * tailRows))
          val (_, sec) = timed(TxLog.clusterIncremental(spark, root,
            Seq("id", "m"), targetFiles = 4, maxGenerations = maxGen))
          val (kept, total) = {
            val (kk, t) = TxLog.pruneEntries(spark,
              TxLog.snapshot(root).get, "m < 5")
            (kk.size, t)
          }
          val line = s"""{"fold":$k,"generations":$generations,""" +
            s""""fold_sec":${fmt(sec)},"band_kept":$kept,"band_total":$total}"""
          println(s"[cluster-bench] $line")
          line
        }
        finally org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(root))
      s""""generation_policy":{"rows":$n,"max_generations":$maxGen,""" +
        s""""folds":[${folds.mkString(",")}]}"""
    }

    val json =
      s"""{"metric":"cluster_bench","tail_rows":$tailRows,""" +
        s""""rows_per_file":$rowsPerFile,""" +
        s""""sizes":[${perSize.mkString(",")}],$genSection}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
