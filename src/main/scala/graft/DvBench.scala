package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deletion-vector cost certification: the SAME scattered targeted
  * delete (victims in every file, footer stats cannot prune the
  * predicate) executed copy-on-write vs merge-on-read on two identical
  * tables, measuring wall time and BYTES WRITTEN under the table root —
  * the claim under test is "a MoR delete writes O(deleted rows), a COW
  * delete rewrites O(candidate file bytes)". Also measures the read-side
  * rent: a full-scan aggregate before the delete, with live vectors
  * (broadcast anti-join), and after the OPTIMIZE purge. min-of-REPS for
  * every timing (this host has noisy episodes).
  *
  * Run standalone (no sbt lock): scripts/run_dv_bench.sh. */
object DvBench {

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/DV_BENCH_r12.json")
    val nRows = args.lift(1).map(_.toLong).getOrElse(2L * 1000 * 1000)
    val nFiles = 32
    val reps = 3
    val spark = SparkSession.builder()
      .appName("graft-dv-bench").master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TxLog

    def fixture: org.apache.spark.sql.DataFrame =
      spark.range(nRows).toDF("id")
        .withColumn("k", col("id") % 9973)
        // ~200B deterministic payload per row
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

    // the victim predicate: one row per 1024 ids — lands in EVERY file,
    // unprunable by footer stats (modulo), ~0.1% of the table
    val victim = col("id") % 1024 === 0

    val cowRoot = s"/root/repo/target/dv-bench-cow-${System.nanoTime()}"
    val morRoot = s"/root/repo/target/dv-bench-mor-${System.nanoTime()}"
    TxLog.init(spark, cowRoot, fixture)
    TxLog.init(spark, morRoot, fixture)
    val nVictims = TxLog.read(spark, cowRoot).filter(victim).count()
    def scanAgg(root: String): Long =
      TxLog.read(spark, root).agg(sum(col("k") * length(col("payload"))))
        .head().getLong(0)

    val scanPre = minOf(reps)(scanAgg(morRoot))

    val cowBytes0 = bytesUnder(s"$cowRoot/data")
    val (_, cowSec) = timed(TxLog.delete(spark, cowRoot, victim))
    val cowBytes = bytesUnder(s"$cowRoot/data") - cowBytes0

    val morBytes0 = bytesUnder(s"$morRoot/data")
    val (_, morSec) = timed(TxLog.deleteMoR(spark, morRoot, victim))
    val morBytes = bytesUnder(s"$morRoot/data") - morBytes0

    // identical survivors, or the comparison is meaningless
    require(TxLog.read(spark, cowRoot).count() ==
      TxLog.read(spark, morRoot).count(), "COW and MoR diverged")

    val scanMor = minOf(reps)(scanAgg(morRoot))
    val (_, purgeSec) = timed(TxLog.compact(spark, morRoot, nFiles))
    val scanPurged = minOf(reps)(scanAgg(morRoot))
    require(scanAgg(morRoot) == scanAgg(cowRoot), "purge changed the rows")

    val json =
      s"""{"bench":"dv","rows":$nRows,"files":$nFiles,"victims":$nVictims,
         |"cow_delete_sec":${f"$cowSec%.3f"},"cow_bytes_written":$cowBytes,
         |"mor_delete_sec":${f"$morSec%.3f"},"mor_bytes_written":$morBytes,
         |"bytes_ratio":${f"${cowBytes.toDouble / math.max(morBytes, 1)}%.1f"},
         |"scan_pre_sec":${f"$scanPre%.3f"},"scan_with_dv_sec":${f"$scanMor%.3f"},
         |"purge_sec":${f"$purgeSec%.3f"},"scan_purged_sec":${f"$scanPurged%.3f"},
         |"reps":$reps,"timing":"min-of-reps for scans, single-shot for commits"}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(s"[dv-bench] $json")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cowRoot))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(morRoot))
    spark.stop()
  }
}
