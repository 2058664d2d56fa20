package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: building a DataFrame from a custom
  * LogicalPlan needs `Dataset.ofRows`, which Spark scopes to its own
  * package — the standard extension-library pattern (Delta, Sedona, etc.
  * ship the same shim) is one forwarding object inside
  * `org.apache.spark.sql`. Nothing else in the engine lives outside
  * `graft.*`. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-tag a BATCH DataFrame as a STREAMING one — what a DSv1
    * streaming `Source.getBatch` must hand MicroBatchExecution (it
    * asserts `isStreaming` on the returned frame). The rows still
    * compute distributed from the batch plan's RDD lineage; nothing
    * materializes on the driver. The FileStreamSource/Delta shape. */
  def asStreaming(df: DataFrame): DataFrame = {
    val classic = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** Parse a SQL expression string to a catalyst Expression (Spark 4's
    * Column wraps a lazily-converted ColumnNode, so going through the
    * parser is the reliable way to obtain a transformable tree). */
  def parseExpression(spark: SparkSession, sql: String): org.apache.spark.sql.catalyst.expressions.Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parseExpression(sql)

  /** The catalyst Expression behind a classic Column (unresolved tree —
    * what stats-based pruning pattern-matches on). */
  def expression(spark: SparkSession, c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  /** A parquet relation over a PRE-LISTED file set — (absolute path,
    * length) pairs a transaction-log manifest already knows — with ZERO
    * filesystem calls at plan time. The stock explicit-path reader
    * re-stats every path through InMemoryFileIndex (and above the
    * parallel-discovery threshold launches a distributed listing job):
    * O(files) metadata I/O per query that a 10⁵-file table pays in
    * minutes and an index probe pays in seconds. This is the Delta/
    * Iceberg read shape — the log is the file index. */
  /** `sizeHint`: an OVERRIDE for the relation's plan-time size estimate
    * (bytes). Without it the estimate is the summed COMPRESSED file
    * lengths — what every file-source relation reports — which can
    * overstate the in-memory footprint of a dim whose exact analyzed
    * row count is known (the transaction log's ANALYZE stats). The hint
    * feeds `FileIndex.sizeInBytes`, so Spark's own join planning
    * (broadcast threshold, AQE initial plan) consumes it with no custom
    * rule — the Delta `TahoeFileIndex` stats shape. */
  def manifestParquetRelation(spark: SparkSession,
      files: Seq[(String, Long)],
      schema: org.apache.spark.sql.types.StructType,
      judge: Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => Int => Boolean = _ => _ => true,
      sizeHint: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.execution.datasources._
    import org.apache.hadoop.fs.{FileStatus, Path}
    val statuses = files.map { case (p, len) =>
      // mtime 0 is safe: nothing consults it (no FileStatusCache — the
      // index is immutable by construction, manifests reference
      // immutable staged files)
      new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, new Path(p))
    }.toArray
    val index = new FileIndex {
      override def rootPaths: Seq[Path] = Seq.empty
      // AUTOMATIC data skipping (the Delta TahoeFileIndex shape): the
      // physical scan hands its pushed-down filters here at planning,
      // and `judge` — fed by the transaction log's per-file footer
      // statistics, keyed by the SAME index as `files` — drops every
      // file that cannot contain a matching row. No opt-in API needed:
      // any .filter over a txlog read skips, including spark.sql text.
      // An empty filter set (or a keep-all judge) lists everything.
      override def listFiles(
          partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
          dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
          : Seq[PartitionDirectory] = {
        val filters = partitionFilters ++ dataFilters
        val kept =
          if (filters.isEmpty) statuses
          else {
            val keep = judge(filters)
            statuses.zipWithIndex.collect { case (st, i) if keep(i) => st }
          }
        Seq(PartitionDirectory(org.apache.spark.sql.catalyst.InternalRow.empty,
          kept))
      }
      override def inputFiles: Array[String] = files.map(_._1).toArray
      override def refresh(): Unit = ()
      override def sizeInBytes: Long = sizeHint.getOrElse(files.map(_._2).sum)
      override def partitionSchema: org.apache.spark.sql.types.StructType =
        new org.apache.spark.sql.types.StructType()
    }
    val rel = HadoopFsRelation(index,
      partitionSchema = new org.apache.spark.sql.types.StructType(),
      dataSchema = schema, bucketSpec = None,
      fileFormat = new parquet.ParquetFileFormat(),
      options = Map.empty)(spark)
    ofRows(spark, LogicalRelation(rel, isStreaming = false))
  }
}
