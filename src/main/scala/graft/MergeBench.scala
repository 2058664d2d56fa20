package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MERGE scaling certificate: partial-merge rewrite cost must track the
  * TOUCHED KEY RANGE, not the table size. The same merge — updates over
  * a fixed absolute key range [0, 50k) plus a handful of inserts just
  * below it — runs against growing tables (0.5M → 8M rows) built two
  * ways with a FIXED rows-per-file (so file size is constant and file
  * count grows with the table):
  *
  *  - KEY-CLUSTERED (repartitionByRange on the key): footer stats give
  *    disjoint per-file key ranges, the stats-pruned partial merge
  *    rewrites only the file(s) covering [0, 50k) — rewrite bytes and
  *    wall stay FLAT as the table grows; everything else carries by
  *    reference. This is "a day's batch into a key-clustered 100 TB
  *    table costs a day's files".
  *  - UNCLUSTERED (hash repartition): every file spans the whole key
  *    domain, nothing prunes, the merge is a whole-table COW rewrite —
  *    bytes and wall grow linearly. The contrast is the certificate.
  *
  * Also certifies the round-14 CAS-loss REBASE: the same clustered merge
  * raced against (a) a DISJOINT interleaved append — the loser rebases,
  * staging exactly once more than the uncontended run (the interloper's
  * own stage) and never re-running the merge job — and (b) an
  * OVERLAPPING append — a genuine conflict, detected, recomputed
  * (one extra staging). Walls + thread-local stage counts recorded.
  * The `append_race` section is the stage-once twin for plain appends:
  * a multi-file append raced by an interleaved small append republishes
  * its already-staged files (stages = its own 1 + the interloper's 1),
  * never re-running the batch write job.
  *
  * Single-shot walls (each merge commits a version); run on a quiet
  * host, adjudicate outliers by re-run. scripts/run_merge_bench.sh. */
object MergeBench {

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/MERGE_BENCH_r14.json")
    val sizes = args.lift(1).map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(500000L, 2000000L, 8000000L))
    val rowsPerFile = 250000L
    val spark = SparkSession.builder()
      .appName("graft-merge-bench").master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TxLog

    def fixture(n: Long, clustered: Boolean): org.apache.spark.sql.DataFrame = {
      val nFiles = math.max(2L, n / rowsPerFile).toInt
      val base = spark.range(n).toDF("id")
        .withColumn("payload", concat(
          md5(col("id").cast("string").cast("binary")),
          md5((col("id") + 1).cast("string").cast("binary")),
          md5((col("id") + 2).cast("string").cast("binary"))))
      if (clustered) base.repartitionByRange(nFiles, col("id"))
      else base.repartition(nFiles, col("id"))
    }

    // the touched work is CONSTANT across table sizes: update keys
    // [0, 50k), insert keys [-100, 0) — the whole source key range is
    // [-100, 50000), so a key-clustered file holding only higher ids
    // provably holds no match
    def source(): org.apache.spark.sql.DataFrame =
      spark.range(50000L).toDF("id")
        .withColumn("payload", lit("UPDATED"))
        .unionByName(spark.range(-100L, 0L).toDF("id")
          .withColumn("payload", lit("INSERTED")))

    def runMerge(root: String): Long =
      TxLog.mergeInto(spark, root, source(), "id",
        matched = Seq(TxLog.MergeClause(None,
          TxLog.MergeUpdate(Seq("payload" -> col("src.payload"))))),
        notMatched = Seq(TxLog.MergeClause(None, TxLog.MergeInsert)))

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

    def one(n: Long, clustered: Boolean): String = {
      val tag = if (clustered) "clu" else "unc"
      val root = s"/root/repo/target/merge-bench-$tag-$n-${System.nanoTime()}"
      TxLog.init(spark, root, fixture(n, clustered))
      val before = TxLog.snapshot(root).get
      val bytes0 = bytesUnder(s"$root/data")
      val (_, sec) = timed(runMerge(root))
      val after = TxLog.snapshot(root).get
      val rewrittenBytes = bytesUnder(s"$root/data") - bytes0
      val beforeIds = before.entries.map(e => (e.path, e.size)).toSet
      val carried = after.entries.count(e => beforeIds((e.path, e.size)))
      val rewritten = before.entries.size - carried
      val tableBytes = bytes0
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      s"""{"rows":$n,"files":${before.entries.size},""" +
        s""""table_bytes":$tableBytes,"merge_sec":${fmt(sec)},""" +
        s""""rewritten_files":$rewritten,"carried_files":$carried,""" +
        s""""rewritten_bytes":$rewrittenBytes}"""
    }

    val perSize = sizes.map { n =>
      val c = one(n, clustered = true)
      val u = one(n, clustered = false)
      println(s"[merge-bench] rows=$n clustered=$c unclustered=$u")
      s"""{"clustered":$c,"unclustered":$u}"""
    }

    // CAS-loss economics at the mid size, clustered: uncontended vs
    // raced-by-disjoint-append (rebase: no merge job re-run) vs
    // raced-by-overlapping-append (genuine conflict: recompute)
    val nR = sizes(sizes.size / 2)
    def racedMerge(kind: String): (Double, Long) = {
      val root = s"/root/repo/target/merge-bench-race-$kind-${System.nanoTime()}"
      TxLog.init(spark, root, fixture(nR, clustered = true))
      kind match {
        case "none" => TxLog.testRacePublishHook = None
        case "disjoint" => TxLog.testRacePublishHook = Some { r =>
          TxLog.appendOnce(spark, r, "interleaved",
            spark.range(9000000L, 9010000L).toDF("id")
              .withColumn("payload", lit("RACE")))
        }
        case "overlap" => TxLog.testRacePublishHook = Some { r =>
          TxLog.appendOnce(spark, r, "interleaved",
            spark.range(10L, 20L).toDF("id")
              .withColumn("payload", lit("RACE")))
        }
      }
      TxLog.dataStages.set(0L)
      val (_, sec) = timed(runMerge(root))
      val stages = TxLog.dataStages.get.longValue
      TxLog.testRacePublishHook = None
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      (sec, stages)
    }
    val (plainSec, plainStages) = racedMerge("none")
    val (rebaseSec, rebaseStages) = racedMerge("disjoint")
    val (recomputeSec, recomputeStages) = racedMerge("overlap")

    // Append CAS-loss economics (the stage-once retry): a 2M-row append
    // raced by an interleaved small append must cost ≈ its uncontended
    // wall plus the interloper's own staging — the loser republishes its
    // already-written files, never re-running the batch write job
    def racedAppend(raced: Boolean): (Double, Long) = {
      val tag = if (raced) "raced" else "plain"
      val root = s"/root/repo/target/append-race-$tag-${System.nanoTime()}"
      TxLog.init(spark, root, fixture(nR, clustered = true))
      TxLog.testRacePublishHook =
        if (!raced) None
        else Some { r =>
          TxLog.appendOnce(spark, r, "interloper",
            spark.range(9000000L, 9000010L).toDF("id")
              .withColumn("payload", lit("RACE")))
        }
      TxLog.dataStages.set(0L)
      val batch = spark.range(10000000L, 10000000L + nR).toDF("id")
        .withColumn("payload", concat(
          md5(col("id").cast("string").cast("binary")),
          md5((col("id") + 1).cast("string").cast("binary")),
          md5((col("id") + 2).cast("string").cast("binary"))))
        .repartition(math.max(2L, nR / rowsPerFile).toInt, col("id"))
      val (_, sec) = timed(TxLog.appendOnce(spark, root, "big", batch))
      val stages = TxLog.dataStages.get.longValue
      TxLog.testRacePublishHook = None
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      (sec, stages)
    }
    val (appPlainSec, appPlainStages) = racedAppend(raced = false)
    val (appRebaseSec, appRebaseStages) = racedAppend(raced = true)

    val json =
      s"""{"metric":"merge_bench","rows_per_file":$rowsPerFile,""" +
        s""""touched_keys":50100,"sizes":[${perSize.mkString(",")}],""" +
        s""""race":{"rows":$nR,""" +
        s""""uncontended_sec":${fmt(plainSec)},"uncontended_stages":$plainStages,""" +
        s""""rebase_sec":${fmt(rebaseSec)},"rebase_stages":$rebaseStages,""" +
        s""""recompute_sec":${fmt(recomputeSec)},"recompute_stages":$recomputeStages},""" +
        s""""append_race":{"rows":$nR,""" +
        s""""uncontended_sec":${fmt(appPlainSec)},"uncontended_stages":$appPlainStages,""" +
        s""""rebase_sec":${fmt(appRebaseSec)},"rebase_stages":$appRebaseStages}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
