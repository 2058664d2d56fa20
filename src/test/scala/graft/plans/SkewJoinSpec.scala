package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join handling: a manufactured hot key must make AQE split the
  * oversized partition at runtime (OptimizeSkewedJoin), with identical
  * results — the runtime complement to the static salting helper
  * (Joins.saltedJoin, BucketingSpec). At 100 TB AQE's split is the first
  * line of defense; salting remains for aggregations and the cases AQE
  * can't touch (e.g. bucketed scans with no shuffle to re-plan). */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed shuffle-join partition at runtime") {
    import spark.implicits._
    // left: 200k rows, 95% on one key; right: small but above the
    // broadcast threshold we pin, so the join must shuffle
    val left = spark.range(0, 200000)
      .select(when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 100)
        .as("k"), col("id").as("v"))
    val right = spark.range(0, 100).select(col("id").as("k"), (col("id") * 10).as("w"))

    def run(aqeSkew: Boolean): (Long, Long, String) = withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> aqeSkew.toString,
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = left.join(right, "k").select(sum($"v" + $"w").as("ck"), count(lit(1)).as("n"))
      val row = j.collect()(0)
      (row.getLong(0), row.getLong(1),
        j.queryExecution.executedPlan.toString)
    }

    val (ckOn, nOn, planOn) = run(aqeSkew = true)
    val (ckOff, nOff, _) = run(aqeSkew = false)
    // identical results either way…
    assert((ckOn, nOn) === ((ckOff, nOff)))
    // …and the skew handler actually fired (AQE marks the join skew=true)
    assert(planOn.contains("skew=true"), s"no skew split in plan:\n$planOn")
  }
}
