package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Certification of the checkpointed, delta-encoded transaction log at
  * REAL commit counts — the "week of 30-second micro-batches" scenario
  * the streaming sink advertises (TxLog.appendOnceMonotone): a synthetic
  * append stream of cheap one-row batches drives the log to 10⁴ commits
  * while sampling, every `SampleEvery` commits,
  *
  *   - snapshot-RESOLUTION latency (currentVersion + snapshot): must stay
  *     FLAT — the checkpoint pointer + ≤CheckpointInterval delta parses,
  *     never a walk of the whole log;
  *   - manifest parses + directory listings per resolution (the
  *     thread-local instrumentation TxLogSpec pins at small scale);
  *   - the sampled commit's own manifest bytes: O(batch), flat;
  *   - cumulative `_txlog` bytes: LINEAR in commits (each manifest is
  *     constant-size) — vs the quadratic cost of the round-9 full-list
  *     encoding, reported alongside as `fulllist_bytes_est`.
  *
  * Run standalone (no sbt lock): compiled classes + /opt/spark/jars on
  * the classpath; writes one JSON document to the output path (default
  * TXLOG_BENCH_r10.json). Spark staging dominates wall time per commit;
  * the curve of interest is metadata cost, which this isolates. */
object TxLogBench {

  private val SampleEvery = 250

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/TXLOG_BENCH_r10.json")
    val nCommits = args.lift(1).map(_.toInt).getOrElse(10000)
    // maintenance cadence (0 = none): every M commits run the production
    // upkeep — compact + pruneHistory + vacuum. The pure-append run shows
    // the log's unmaintained asymptotics (flat per-commit manifests, but
    // snapshot checkpoints that grow with the ever-growing FILE count);
    // the maintained run shows the steady state a real table lives in,
    // where file count and retained history are bounded and so is the log.
    val maintainEvery = args.lift(2).map(_.toInt).getOrElse(0)
    val keepLast = 200
    val spark = SparkSession.builder()
      .appName("graft-txlog-bench").master("local[4]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.TxLog

    val root = s"/root/repo/target/txlog-bench-${System.nanoTime()}"
    val t0 = System.nanoTime()
    TxLog.init(spark, root, Seq((0L, "v0")).toDF("id", "s"))

    def manifestBytes(v: Long): Long =
      java.nio.file.Files.size(
        java.nio.file.Paths.get(root, "_txlog", f"v-$v%020d"))
    def logBytes(): Long =
      Option(new java.io.File(s"$root/_txlog").listFiles())
        .getOrElse(Array.empty).filter(_.isFile).map(_.length()).sum

    final case class Sample(commit: Long, resolveMs: Double, parses: Long,
      listings: Long, manifestBytes: Long, cumLogBytes: Long, commitMs: Double)
    val samples = scala.collection.mutable.ArrayBuffer.empty[Sample]

    (1 to nCommits).foreach { k =>
      val tC = System.nanoTime()
      val ok = TxLog.appendOnceMonotone(spark, root, "b", k.toLong,
        Seq((k.toLong, s"v$k")).toDF("id", "s").coalesce(1))
      require(ok, s"commit $k no-opped unexpectedly")
      val commitMs = (System.nanoTime() - tC) / 1e6
      if (maintainEvery > 0 && k % maintainEvery == 0) {
        val tM = System.nanoTime()
        TxLog.compact(spark, root, targetFiles = 8)
        TxLog.pruneHistory(root, keepLast = keepLast)
        TxLog.vacuum(root, graceMs = 0L)
        println(f"[txlog-bench] maintenance at v=$k%5d took " +
          f"${(System.nanoTime() - tM) / 1e9}%.1fs")
      }
      if (k % SampleEvery == 0 || k == 1 || k == nCommits) {
        // median-of-5 resolution latency, with parse/listing counters on
        // the middle rep (deterministic: every rep does identical work)
        var parses = 0L; var listings = 0L; var ver = 0L
        val reps = (1 to 5).map { r =>
          TxLog.manifestParses.set(0L); TxLog.logListings.set(0L)
          val t = System.nanoTime()
          val snap = TxLog.snapshot(root).get
          // maintenance commits (compact) advance the version past the
          // append count; the log must never LOSE a commit
          require(snap.version >= k.toLong + 1, s"v=${snap.version} at k=$k")
          ver = snap.version
          val ms = (System.nanoTime() - t) / 1e6
          if (r == 3) { parses = TxLog.manifestParses.get; listings = TxLog.logListings.get }
          ms
        }.sorted
        samples += Sample(ver, reps(2), parses,
          listings, manifestBytes(ver), logBytes(), commitMs)
        val s = samples.last
        println(f"[txlog-bench] v=${s.commit}%5d resolve=${s.resolveMs}%7.2fms " +
          f"parses=${s.parses}%2d listings=${s.listings}%2d " +
          f"manifest=${s.manifestBytes}%5dB log=${s.cumLogBytes / 1024}%7dKiB " +
          f"commit=${s.commitMs}%7.1fms")
      }
    }

    val totalSec = (System.nanoTime() - t0) / 1e9
    // what the round-9 full-list encoding would have cost: version k's
    // manifest re-lists ~k file lines of ~100 bytes each
    val perLine = 100L
    val fullListEst = (1L to nCommits.toLong).map(_ * perLine).sum
    val first = samples.take(4)
    val last = samples.takeRight(4)
    def med(xs: scala.collection.Seq[Double]): Double =
      xs.toSeq.sorted.apply(xs.size / 2)
    val json = {
      val curve = samples.map(s =>
        s"""{"v":${s.commit},"resolve_ms":${f"${s.resolveMs}%.2f"},"parses":${s.parses},""" +
        s""""listings":${s.listings},"manifest_bytes":${s.manifestBytes},""" +
        s""""log_bytes":${s.cumLogBytes},"commit_ms":${f"${s.commitMs}%.1f"}}""")
        .mkString("[", ",", "]")
      s"""{"bench":"txlog_10k_commits","commits":$nCommits,
         |"maintain_every":$maintainEvery,
         |"resolve_ms_first":${f"${med(first.map(_.resolveMs))}%.2f"},
         |"resolve_ms_last":${f"${med(last.map(_.resolveMs))}%.2f"},
         |"parses_first":${first.map(_.parses).max},
         |"parses_last":${last.map(_.parses).max},
         |"manifest_bytes_first":${first.map(_.manifestBytes).max},
         |"manifest_bytes_last":${last.map(_.manifestBytes).max},
         |"log_bytes_total":${samples.last.cumLogBytes},
         |"fulllist_bytes_est":$fullListEst,
         |"wall_sec":${f"$totalSec%.1f"},
         |"curve":$curve}""".stripMargin.replace("\n", "")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    println(s"[txlog-bench] wrote $out in ${f"$totalSec%.1f"}s")
    spark.stop()
  }
}
