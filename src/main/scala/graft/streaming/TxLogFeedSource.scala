package graft.streaming

import graft.operators.TxLog
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** STRUCTURED STREAMING SOURCE over a transaction-log table — the read
  * half of the streaming story ([[TxLog.streamingSink]] is the write
  * half): `spark.readStream.format("graft.streaming.TxLogFeedProvider")
  * .option("root", …).load()` turns the table itself into a stream, the
  * Delta `readStream` shape. A feed consumer (an index sync, a derived
  * table) becomes a continuously running query instead of a manually
  * polled `readChanges` loop.
  *
  * OFFSETS ARE MANIFEST VERSIONS. Each micro-batch delivers the rows of
  * versions `(start, end]` — resolved by [[TxLog.readChanges]] (mode
  * `changes`, the default: row-level insert/delete events tagged
  * `_change_type` + `_commit_version`) or [[TxLog.readAppended]] (mode
  * `appends`: net new rows only, for append-shaped consumers). Versions
  * are dense under the publish CAS and manifests are immutable, so a
  * batch replayed from the query checkpoint after a crash re-reads
  * exactly the same rows — end-to-end exactly-once when the sink side
  * dedups by batchId (foreachBatch + [[TxLog.appendOnceMonotone]], or
  * [[graft.operators.SigIndex.syncStream]]'s version high-water).
  * Change attribution is inherited from readChanges: maintenance
  * rewrites (`cdc_noop`) contribute nothing, opted-in COW DML reads its
  * commit-time change files, overwrites attribute from the manifest
  * diff — the stream never stalls on a rewrite.
  *
  * `startingVersion` (default: the table's current version at stream
  * start, i.e. only NEW commits flow) anchors the first batch;
  * `startingTimestamp` (exclusive with it) resolves the anchor through
  * the manifests' exact commit-time headers instead.
  * RETENTION: the range a restarted query re-reads must still be
  * retained — run [[TxLog.pruneHistory]] behind the slowest consumer's
  * checkpoint, the standard CDC-retention trade.
  *
  * SCHEMA is fixed at stream start (the Structured Streaming contract).
  * A column rename/drop committed mid-stream makes the next batch's
  * select fail loudly — restart the query against the new logical
  * schema, exactly the [[TxLog.streamingSink]] contract on the write
  * side. At 100 TB this source moves only each batch's CHANGED rows
  * (O(feed), never O(table)): the per-version cost model is
  * readChanges' — appended files read once, MoR deletes read exactly
  * the victim positions. */
class TxLogFeedProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "txlog-feed"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), TxLogFeedSource.schemaFor(
      sqlContext.sparkSession, TxLogFeedSource.opts(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new TxLogFeedSource(sqlContext.sparkSession,
      TxLogFeedSource.opts(parameters))
}

private[streaming] object TxLogFeedSource {
  final case class Opts(root: String, mode: String,
      startingVersion: Option[Long], maxVersionsPerBatch: Option[Long])

  /** DataFrameReader options are caller-cased: normalize keys once. */
  def opts(parameters: Map[String, String]): Opts = {
    val p = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val root = p.getOrElse("root",
      throw new IllegalArgumentException(
        "txlog-feed: option 'root' (table path) is required"))
    val mode = p.getOrElse("mode", "changes")
    require(mode == "changes" || mode == "appends",
      s"txlog-feed: mode must be changes|appends, got $mode")
    val maxV = p.get("maxversionsperbatch").map(_.toLong)
    maxV.foreach(n => require(n >= 1,
      s"txlog-feed: maxVersionsPerBatch must be >= 1, got $n"))
    val sv = p.get("startingversion").map(_.toLong)
    // startingTimestamp resolves through the manifests' exact `t` commit
    // headers (versionAt): the stream starts AFTER the newest version
    // published at-or-before the timestamp — its changes are already
    // reflected in state a consumer bootstrapped "as of" that time
    val st = p.get("startingtimestamp").map(_.toLong)
    require(sv.isEmpty || st.isEmpty,
      "txlog-feed: startingVersion and startingTimestamp are exclusive")
    val anchor = sv.orElse(st.map(ts =>
      graft.operators.TxLog.versionAt(root, ts).getOrElse(
        throw new IllegalArgumentException(
          s"txlog-feed: no version published at or before $ts in $root"))))
    Opts(root, mode, anchor, maxV)
  }

  /** The stream's fixed schema: the table's CURRENT logical schema,
    * plus the change-feed meta columns in `changes` mode. */
  def schemaFor(spark: SparkSession, o: Opts): StructType = {
    val base = TxLog.read(spark, o.root).schema
    if (o.mode == "appends") base
    else base.add("_change_type", StringType).add("_commit_version", LongType)
  }
}

class TxLogFeedSource(spark: SparkSession, o: TxLogFeedSource.Opts)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  // the first batch's floor: an explicit startingVersion, or the version
  // current at stream START (only new commits flow) — resolved ONCE so a
  // slow first trigger can't move the anchor
  private val start0: Long =
    o.startingVersion.getOrElse(TxLog.currentVersion(o.root))

  override val schema: StructType = TxLogFeedSource.schemaFor(spark, o)

  private def versionOf(x: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    x match {
      case l: LongOffset => l.offset
      // a checkpoint-recovered offset arrives serialized; LongOffset.json
      // is the bare number
      case other => other.json.trim.toLong
    }

  // ADMISSION CONTROL (the FileStreamSource pattern): `latestOffset`
  // replaces getOffset as the engine's next-end oracle, which lets the
  // source (a) rate-limit a backlog into bounded micro-batches
  // (`maxVersionsPerBatch` — a consumer restarted a week behind folds
  // the week version-range by version-range instead of as one giant
  // batch) and (b) support Trigger.AvailableNow EXACTLY: the available
  // ceiling is pinned once at prepare time, the query drains to it in
  // rate-limited steps and stops — no single-batch fallback.
  @volatile private var availableCeiling: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableCeiling = Some(TxLog.currentVersion(o.root))

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val from = Option(start).map(versionOf).getOrElse(start0)
    val avail = availableCeiling.getOrElse(TxLog.currentVersion(o.root))
    val end = o.maxVersionsPerBatch match {
      case Some(n) if avail - from > n => from + n
      case _ => avail
    }
    if (end <= from) null else LongOffset(end)
  }

  override def getOffset: Option[Offset] = {
    // kept for the plain v1 path; with SupportsAdmissionControl the
    // engine drives latestOffset instead
    Option(latestOffset(null,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()))
      .map(v => LongOffset(versionOf(v)))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(start0)
    val to = versionOf(end)
    val batch =
      if (o.mode == "appends") TxLog.readAppended(spark, o.root, from, to)
      else TxLog.readChanges(spark, o.root, from, to)
    // align to the declared schema (feed frames union by name and may
    // reorder), then re-tag as a streaming frame — a v1 Source must hand
    // MicroBatchExecution an isStreaming plan; the rows still compute
    // distributed from the batch plan's RDD, nothing materializes here
    org.apache.spark.sql.graftbridge.Bridge.asStreaming(
      batch.select(schema.fieldNames.map(col).toSeq: _*))
  }

  override def stop(): Unit = ()
}
