package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CPU-parallel repartition for "cheap bytes, expensive rows" stages.
  *
  * `df.repartition(col)` leaves the partition count to
  * spark.sql.shuffle.partitions and — crucially — marks the exchange as
  * AQE-coalescable: when the shuffled BYTES are small (a few MB of
  * documents or packed vectors), AQE merges the output down to 1-2
  * partitions, and a downstream per-row stage that is CPU-bound (per-gram
  * md5, per-vector distance kernels) serializes onto 1-2 cores. Measured
  * on t7_winnowing at sf0.1: 3.1 s coalesced vs 0.9 s spread.
  *
  * Pinning an explicit count makes the exchange non-coalescable and
  * keeps every core busy. The count is `max(2 × defaultParallelism,
  * leaf bytes / 64 MB)` — see [[parts]]: it scales with the cluster
  * (defaultParallelism on a 1000-executor cluster is the real core
  * count, not a hardcoded 64) AND with the data (a 100 TB input derives
  * its count from its own size instead of freezing at the core count).
  */
object Par {
  /** Conf keys for the bytes-derived partition count (r18, optimization
    * brief item 4): per-partition byte target and a hard ceiling on the
    * derived count. The local defaults (64 MB, 2^18) keep sandbox plans
    * byte-for-byte identical — every sandbox input is MBs, so the CPU
    * floor always wins — while a warehouse-scale input drives the count
    * from its own size through the SAME code path. */
  private val TargetBytesKey = "spark.graft.parts.targetBytes"
  private val MaxPartsKey = "spark.graft.parts.max"

  /** Scale-adaptive, AQE-proof partition count:
    * `max(2 × defaultParallelism, leafBytes / targetBytes)`.
    *
    * The CPU floor keeps cheap-bytes/expensive-rows stages (per-gram
    * md5, per-vector kernels) on every core — disk bytes CANNOT see
    * per-row CPU cost (t7's 600 KB of dictionary-packed docs cost 3.1 s
    * when AQE coalesced them onto 2 tasks, 0.9 s spread), which is why
    * the floor never adapts DOWN. The bytes term takes over when the
    * input outgrows `2 × cores × 64 MB` — at 100 TB the count tracks
    * data size instead of freezing at the core count.
    *
    * Bytes are the sum of the ANALYZED plan's LEAF relation sizes,
    * deliberately NOT the frame's own sizeInBytes and NOT the optimized
    * plan's leaves: without CBO a join's estimate is the PRODUCT of its
    * children, so any post-join frame reports petabytes at megabyte
    * scale — and the optimized plan re-imports that garbage through
    * cache substitution (an unmaterialized InMemoryRelation is a leaf
    * whose stats INHERIT its child's join-product estimate; measured:
    * g2's ordinal exchange hit the 2^18 cap and ran 250 s at sf0.1).
    * The analyzed plan's leaves are the raw scans — deterministic,
    * cache-proof, and at worst an UNDER-estimate for fan-out plans,
    * which degrades to the CPU floor, exactly the r17 behavior. Leaves
    * that report the defaultSizeInBytes sentinel are skipped rather
    * than poisoning the sum. */
  private def parts(df: DataFrame): Int = {
    val s = df.sparkSession
    val cpu = 2 * s.sparkContext.defaultParallelism
    val target = s.conf.get(TargetBytesKey, (64L << 20).toString).toLong
    val cap = s.conf.get(MaxPartsKey, (1 << 18).toString).toInt
    val unknown = BigInt(Long.MaxValue) / 2
    val bytes = df.queryExecution.analyzed.collectLeaves()
      .map(_.stats.sizeInBytes).filter(_ < unknown).sum
    math.max(cpu, (bytes / target).min(BigInt(cap)).toInt)
  }

  def spread(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(parts(df), keys: _*)

  /** Materialization fence under a deterministic final ORDER BY.
    *
    * A global sort's range exchange SAMPLES its child to compute the
    * partition bounds — a separate job that re-executes the child's full
    * lineage down to the nearest exchange / cached relation. When the
    * operators between that boundary and the sort are expensive (a
    * 32-lag window pass, a percentile-buffer merge) the sampling pass
    * silently re-runs them, doubling the query (measured on w12_ema: two
    * 15-task, ~1.3 s window stages reading the same 18 MB exchange; on
    * a11: the percentile final-merge twice). Interposing one hash
    * exchange on the (small) pre-sort result gives the sampler a
    * materialized shuffle to read instead. Only worth it when the fenced
    * frame is orders of magnitude cheaper to re-shuffle than its lineage
    * is to re-run — grouped/filtered outputs, not raw scans.
    *
    * ROUND-ROBIN on purpose, not keyed: a keyed fence whose (keys,
    * count) happen to match the child's existing hash partitioning is
    * planned away as redundant — exactly what happened when w12's
    * window exchange moved to the same spread count, silently bringing
    * the double window pass back. RoundRobinPartitioning is never
    * satisfied by a child, so the fence always materializes; row
    * placement is deterministic (sortBeforeRepartition), and the final
    * sort fully determines output order — every fenced query sorts on
    * key columns its grouping/dedup made unique. The `keys` parameter
    * is kept for call-site documentation of that sort key. */
  def sortFence(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(parts(df))

  /** The partition count [[rangeWithOffsets]] range-partitions into —
    * exposed so downstream per-`__pid` exchanges can pin the SAME count
    * (more buckets than distinct pids is waste; fewer serializes).
    * Callers pass the SAME frame to both sites, so the bytes-derived
    * count agrees by construction (same plan → same leaves → same sum). */
  def prefixParts(df: DataFrame): Int = parts(df)

  /** Distributed exclusive-prefix machinery shared by
    * Curation.packSequences and Windows.globalOrdinal: range-repartition
    * `df` on `order`, attach the partition id, and compute each
    * partition's BASE OFFSET (exclusive prefix of per-partition
    * sum(weight); weight = lit(1) gives row-count offsets).
    *
    * The partitioned frame is CACHED, and the cache is LOAD-BEARING, not
    * a perf nicety: repartitionByRange samples its boundaries with an
    * RDD-id-seeded RNG, so each independent execution of the exchange can
    * place rows differently — the offsets (computed in one job) would
    * then contradict the partition contents the caller's job sees.
    * (Sharing the exchange inside one plan does not save this either:
    * column pruning gives the counts branch a narrower scan, the
    * canonical forms diverge, and exchange reuse does not fire — both
    * failure modes were observed as non-dense ordinals in WindowSpec.)
    * Pinning ONE materialization is the correctness contract. The cached
    * handle is the RETURNED frame: harness paths are freed by the
    * per-query clearCache; long-lived callers should unpersist it once
    * their derived results are materialized.
    *
    * @return (partitioned CACHED frame with `__pid`, tiny offsets frame
    *         (`__pid`, `__off`)) */
  def rangeWithOffsets(df: DataFrame, order: Seq[Column], weight: Column)
      : (DataFrame, DataFrame) = {
    val s = df.sparkSession
    val parts = prefixParts(df)
    val p = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    val totals = p.groupBy("__pid").agg(sum(weight).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) =>
      (pid, acc + tot)
    }.tail.zip(totals).map { case ((pid, cumIncl), (_, tot)) => (pid, cumIncl - tot) }
    (p, s.createDataFrame(offsets.toSeq).toDF("__pid", "__off"))
  }

  /** [[rangeWithOffsets]] plus an exclusive prefix-MAX of `value` per
    * partition, from ONE combined per-partition aggregation pass (the
    * separate max pass Windows.globalRunningMax first shipped doubled
    * the whole-input jobs). Returns (cached partitioned frame with
    * `__pid`, tiny frame (`__pid`, `__off`, `__premax`)); `__premax` is
    * Long.MinValue for the first partition. Same cache contract as
    * rangeWithOffsets. */
  def rangeWithOffsetsAndMax(df: DataFrame, order: Seq[Column], weight: Column,
      value: Column): (DataFrame, DataFrame) = {
    val s = df.sparkSession
    val parts = prefixParts(df)
    val p = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    val totals = p.groupBy("__pid").agg(sum(weight).as("s"), max(value).as("m"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val offs = totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1)
    val premax = totals.map(_._3).scanLeft(Long.MinValue)(math.max).dropRight(1)
    val rows = totals.map(_._1).zip(offs).zip(premax)
      .map { case ((pid, off), pm) => (pid, off, pm) }
    (p, s.createDataFrame(rows.toSeq).toDF("__pid", "__off", "__premax"))
  }
}
