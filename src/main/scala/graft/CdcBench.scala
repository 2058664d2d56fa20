package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Change-feed cost certification for the round-13 attribution markers.
  * The SAME scattered targeted UPDATE (matched rows in every file,
  * unprunable predicate, ~0.1% of the table) runs on two identical
  * copy-on-write tables — one plain (`cdc_full` coarse attribution, zero
  * extra bytes at commit) and one with `change_feed=true` (exact
  * commit-time change files) — measuring:
  *
  *  - WRITE side: wall time and extra bytes of the change files (the
  *    claim: O(changed rows), a rounding error next to the COW rewrite
  *    itself);
  *  - READ side: `readChanges` over the update version — coarse re-reads
  *    the rewritten files (O(rewrite)), precise reads the change files
  *    only (O(changed rows)) — wall time and row counts for both;
  *  - MAINTENANCE invisibility: a compact lands, and the feed over its
  *    version returns zero rows in manifest-resolution time.
  *
  * min-of-REPS on read timings (noisy host); write timings single-shot
  * (they commit versions). Run standalone: scripts/run_cdc_bench.sh. */
object CdcBench {

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/CDC_BENCH_r13.json")
    val nRows = args.lift(1).map(_.toLong).getOrElse(2L * 1000 * 1000)
    val nFiles = 32
    val reps = 3
    val spark = SparkSession.builder()
      .appName("graft-cdc-bench").master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TxLog

    def fixture: org.apache.spark.sql.DataFrame =
      spark.range(nRows).toDF("id")
        .withColumn("k", col("id") % 9973)
        .withColumn("payload", concat(
          md5(col("id").cast("string").cast("binary")),
          md5((col("id") + 1).cast("string").cast("binary")),
          md5((col("id") + 2).cast("string").cast("binary")),
          md5((col("id") + 3).cast("string").cast("binary")),
          md5((col("id") + 4).cast("string").cast("binary")),
          md5((col("id") + 5).cast("string").cast("binary"))))
        .repartitionByRange(nFiles, col("id"))

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
    def minOf(reps: Int)(f: => Unit): Double =
      (1 to reps).map(_ => timed(f)._2).min

    val cond = col("id") % 1024 === 0
    val assign = Seq("payload" -> concat(lit("U:"), col("payload")))

    val plainRoot = s"/root/repo/target/cdc-bench-plain-${System.nanoTime()}"
    val feedRoot = s"/root/repo/target/cdc-bench-feed-${System.nanoTime()}"
    TxLog.init(spark, plainRoot, fixture)
    TxLog.init(spark, feedRoot, fixture)  // v1
    TxLog.setProperties(feedRoot, Map("change_feed" -> "true")) // v2
    val nMatched = TxLog.read(spark, plainRoot).filter(cond).count()
    val tableBytes = bytesUnder(s"$plainRoot/data")

    // WRITE: same COW update, without / with change files
    val plainBytes0 = bytesUnder(s"$plainRoot/data")
    val (_, plainSec) = timed(TxLog.updateWhere(spark, plainRoot, cond, assign))
    val plainDelta = bytesUnder(s"$plainRoot/data") - plainBytes0
    val feedBytes0 = bytesUnder(s"$feedRoot/data")
    val (_, feedSec) = timed(TxLog.updateWhere(spark, feedRoot, cond, assign))
    val feedDelta = bytesUnder(s"$feedRoot/data") - feedBytes0
    val cdcBytes = Option(new java.io.File(s"$feedRoot/data").listFiles())
      .getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("cdc-"))
      .map(d => bytesUnder(d.getAbsolutePath)).sum

    // READ: the feed over the update version — coarse vs precise
    def feedCount(root: String, from: Long, to: Long): Long =
      TxLog.readChanges(spark, root, from, to).count()
    val coarseRows = feedCount(plainRoot, 1L, 2L)
    val preciseRows = feedCount(feedRoot, 2L, 3L)
    val coarseSec = minOf(reps)(feedCount(plainRoot, 1L, 2L))
    val preciseSec = minOf(reps)(feedCount(feedRoot, 2L, 3L))

    // MAINTENANCE: compact is invisible to the feed, at manifest cost
    val vBefore = TxLog.currentVersion(feedRoot)
    TxLog.compact(spark, feedRoot, targetFiles = 8)
    val vAfter = TxLog.currentVersion(feedRoot)
    val noopRows = feedCount(feedRoot, vBefore, vAfter)
    val noopSec = minOf(reps)(feedCount(feedRoot, vBefore, vAfter))

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", v)
    val json =
      s"""{"metric":"cdc_bench","rows":$nRows,"files":$nFiles,""" +
        s""""matched_rows":$nMatched,"table_bytes":$tableBytes,""" +
        s""""update_plain_sec":${fmt(plainSec)},"update_plain_extra_bytes":$plainDelta,""" +
        s""""update_feed_sec":${fmt(feedSec)},"update_feed_extra_bytes":$feedDelta,""" +
        s""""change_file_bytes":$cdcBytes,""" +
        s""""feed_coarse_rows":$coarseRows,"feed_coarse_sec":${fmt(coarseSec)},""" +
        s""""feed_precise_rows":$preciseRows,"feed_precise_sec":${fmt(preciseSec)},""" +
        s""""feed_over_compact_rows":$noopRows,"feed_over_compact_sec":${fmt(noopSec)}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(plainRoot))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(feedRoot))
    spark.stop()
  }
}
