package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Keyed upsert (MERGE) into a parquet directory — the crawl-batch merge
  * shape (S-family extension, completing the maintenance-sink trio with
  * s5 compaction and s6 schema evolution): re-crawled documents replace
  * their previous version by key, never-seen documents insert, everything
  * else survives untouched.
  *
  * Plain parquet has no transaction log, so merge-on-read is not
  * available; the honest contract is copy-on-write. [[upsert]] does it
  * as ONE anti-join + union — the current table keeps every row whose key
  * the batch does not claim, the batch contributes all of its rows — and
  * swaps directories atomically (the s5 discipline: readers see the old
  * complete table or the new one, never a mix).
  *
  * Scale shape: the anti-join is a keyed shuffle join (batch side
  * broadcastable when small), but copy-on-write REWRITES what it reads —
  * so the unit of rewrite must shrink from table to partition.
  * [[upsertPartitioned]] does exactly that: group the batch by its
  * partition value, and per TOUCHED partition run the same
  * anti-join+union+swap against just that directory. Partitions the
  * batch doesn't touch are never read, never written — at 100 TB an
  * upsert of one day's crawl costs one day's partition, not the table.
  * (A transactional log — Delta/Iceberg — would buy merge-on-read and
  * concurrent writers; no such jars ship in this container, and the
  * copy-on-write form is the correct parquet-only baseline.)
  */
object Upsert {

  final case class UpsertStats(rowsBefore: Long, rowsAfter: Long, batch: Long)

  /** Last-write-wins keyed merge of `batch` into the parquet dir. The
    * batch must carry the table's full schema and at most one row per
    * key (the caller's dedup policy — d10's keep-best — runs upstream). */
  def upsert(spark: SparkSession, dir: String, batch: DataFrame, key: String): UpsertStats = {
    // roll back any torn swap FIRST: a dir left mid-crash (moved to .old,
    // replacement never moved in) must not be mistaken for brand-new
    Compaction.recoverSwap(dir)
    // brand-new target (a partition no batch has touched before): plain
    // atomic create — the daily-crawl case MUST mint partitions, not throw
    if (!new java.io.File(dir).exists()) {
      val tmp = dir + ".upsert-tmp"
      batch.write.mode("overwrite").parquet(tmp)
      Files.move(Paths.get(tmp), Paths.get(dir), StandardCopyOption.ATOMIC_MOVE)
      spark.catalog.refreshByPath(dir)
      val n = spark.read.parquet(dir).count()
      return UpsertStats(0L, n, n)
    }
    val current = spark.read.parquet(dir)
    val nBefore = current.count() // parquet count: footer metadata, no data scan
    val b = batch.cache() // the batch plan runs once, not once per consumer
    try {
      val nBatch = b.count()
      Compaction.swapInPlace(spark, dir, "upsert") { tmp =>
        current.join(b.select(key), Seq(key), "left_anti")
          .unionByName(b)
          .write.mode("overwrite").parquet(tmp)
      }
      UpsertStats(nBefore, spark.read.parquet(dir).count(), nBatch)
    } finally b.unpersist()
  }

  /** Partition-scoped copy-on-write: only partitions the batch touches
    * are read and rewritten. `partCol` is the hive partition column; the
    * batch's distinct partition values (bounded by the batch, not the
    * table) decide the touched set. */
  def upsertPartitioned(spark: SparkSession, root: String, batch: DataFrame,
      key: String, partCol: String): Seq[(String, UpsertStats)] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    // bounded: one row per touched partition. Values are kept RAW for the
    // slice filter but HIVE-ESCAPED for the directory name — a value
    // Spark's partitioned writer would escape (space, '/', '%') must land
    // in the same escaped directory a partitioned reader lists. NULL and
    // EMPTY-STRING values both map to the hive default partition (Spark's
    // getPartitionPathString treats `value == null || value.isEmpty`
    // identically), so neither NPEs nor mints a divergent `part=` dir.
    val touched = batch.select(partCol).distinct().collect()
      .map(r => Option(r.get(0)).map(_.toString).filter(_.nonEmpty))
      .toSeq.distinct.sortBy(_.getOrElse(""))
    val stats = touched.map { pvOpt =>
      val dirName = pvOpt.map(ExternalCatalogUtils.escapePathName)
        .getOrElse(ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
      val dir = s"$root/$partCol=$dirName"
      val slice = pvOpt
        .map(pv => batch.filter(col(partCol) === pv))
        .getOrElse(batch.filter(col(partCol).isNull || col(partCol) === ""))
        .drop(partCol)
      pvOpt.getOrElse(dirName) -> upsert(spark, dir, slice, key)
    }
    // plans cached over the ROOT reference the swapped files too
    spark.catalog.refreshByPath(root)
    stats
  }

  /** Targeted delete — the right-to-be-forgotten shape: drop every row
    * matching `victim` and rewrite (same copy-on-write + atomic swap +
    * cache-invalidation discipline as [[upsert]]; at scale the caller
    * scopes it per partition exactly like [[upsertPartitioned]]). Returns
    * (rowsBefore, rowsAfter). */
  def delete(spark: SparkSession, dir: String, victim: org.apache.spark.sql.Column): (Long, Long) = {
    Compaction.recoverSwap(dir)
    val current = spark.read.parquet(dir)
    val nBefore = current.count()
    Compaction.swapInPlace(spark, dir, "delete") { tmp =>
      current.filter(!victim).write.mode("overwrite").parquet(tmp)
    }
    (nBefore, spark.read.parquet(dir).count())
  }

  /** Per-query staged copy of documents(doc_id, text) for s7/s8. */
  private def ensureFixture(s: SparkSession, dir: String, tag: String): String = synchronized {
    val out = s"/root/repo/target/$tag-fixture-${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    // always restage: the query mutates the table, and a rerun must start clean
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    Tables.documents(s, dir).select("doc_id", "text")
      .coalesce(4).write.mode("overwrite").parquet(out)
    out
  }

  val defs: Seq[QueryDef] = Seq(
    // S7: merge semantics under the differential gate. The batch updates
    // every doc_id ≡ 0 (mod 10) to md5(text) and inserts 50 brand-new
    // docs (ids +1,000,000, text = md5(doc_id)); the oracle states the
    // merged table directly from the original documents — update rows via
    // CASE, inserts via UNION — so the hash match certifies replace,
    // insert, AND survive-untouched in one row set.
    QueryDef("s7_upsert",
      """WITH merged AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 10 = 0 THEN md5(text) ELSE text END AS text
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, md5(CAST(doc_id AS VARCHAR))
        |  FROM documents WHERE doc_id < 50)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum((doc_id + 1) * octet_length(encode(text))) AS BIGINT) AS ck,
        |       CAST(sum(CASE WHEN doc_id >= 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted
        |FROM merged""".stripMargin) { (s, dir) =>
      val fixture = ensureFixture(s, dir, "upsert")
      val docs = Tables.documents(s, dir)
      val updates = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("text"))
      val inserts = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          md5(col("doc_id").cast("string").cast("binary")).as("text"))
      upsert(s, fixture, updates.unionByName(inserts), "doc_id")
      s.read.parquet(fixture)
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum((col("doc_id") + 1) * length(col("text").cast("binary"))).cast("long").as("ck"),
          sum(when(col("doc_id") >= 1000000L, 1L).otherwise(0L)).cast("long").as("n_inserted"))
    },

    // S8: targeted delete under the differential gate — every doc_id ≡ 0
    // (mod 13) is forgotten; the oracle states the surviving table
    // directly, so the hash match certifies the victims are gone AND
    // every survivor's payload is byte-identical.
    QueryDef("s8_delete",
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum((doc_id + 1) * octet_length(encode(text))) AS BIGINT) AS ck,
        |       CAST(sum(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_victims_left
        |FROM documents WHERE doc_id % 13 <> 0""".stripMargin) { (s, dir) =>
      val fixture = ensureFixture(s, dir, "delete")
      delete(s, fixture, col("doc_id") % 13 === 0)
      s.read.parquet(fixture)
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum((col("doc_id") + 1) * length(col("text").cast("binary"))).cast("long").as("ck"),
          sum(when(col("doc_id") % 13 === 0, 1L).otherwise(0L)).cast("long").as("n_victims_left"))
    }
  )
}
