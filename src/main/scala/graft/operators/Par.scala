package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

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
  * Pinning an explicit count (2× the cluster's core count) makes the
  * exchange non-coalescable and keeps every core busy; it scales with the
  * cluster (defaultParallelism on a 1000-executor cluster is the real
  * core count, not a hardcoded 64).
  */
object Par {
  def spread(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(2 * df.sparkSession.sparkContext.defaultParallelism, keys: _*)
}
