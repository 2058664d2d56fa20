package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The snapshot-isolation contract of the versioned-manifest log:
  * old-or-new-never-a-mix for readers concurrent with writers (with NO
  * refreshByPath anywhere), exactly-one-CAS-winner per version, pinned
  * time travel, effectively-once folds safe under concurrent folders,
  * and vacuum sweeping only unreachable data. */
class TxLogSpec extends SparkSpec {

  private def freshRoot(tag: String) =
    s"/root/repo/target/txlog-$tag-${System.nanoTime()}"

  private def docs = Tables.documents(spark, sf).select("doc_id", "text")

  test("init/read roundtrip and version pinning (time travel)") {
    val root = freshRoot("pin")
    val v1 = TxLog.init(spark, root, docs)
    assert(v1 === 1L)
    val n = docs.count()
    assert(TxLog.read(spark, root).count() === n)

    // pin v1's PLAN before any further commit...
    val pinned = TxLog.read(spark, root, 1L)

    val v2 = TxLog.delete(spark, root, col("doc_id") % 2 === 0)
    assert(v2 === 2L)
    // ...new readers see v2, the pinned plan still evaluates to v1 —
    // no refreshByPath, no cache fiddling, purely immutable files
    assert(TxLog.read(spark, root).count() === docs.filter(col("doc_id") % 2 =!= 0).count())
    assert(pinned.count() === n)
    assert(TxLog.read(spark, root, 1L).count() === n)
    assert(TxLog.currentVersion(root) === 2L)
  }

  test("upsert merges by key transactionally") {
    val root = freshRoot("upsert")
    TxLog.init(spark, root, docs)
    val batch = docs.filter(col("doc_id") < 10)
      .withColumn("text", lit("REPLACED"))
      .unionByName(spark.range(1).select(lit(999999L).as("doc_id"), lit("NEW").as("text")))
    val v = TxLog.upsert(spark, root, batch, "doc_id")
    assert(v === 2L)
    val after = TxLog.read(spark, root)
    val expected = docs.filter(col("doc_id") >= 10).unionByName(batch)
    assert(after.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(after).count() === 0)
  }

  test("exactly one CAS winner per version; loser's data is vacuum-able") {
    val root = freshRoot("cas")
    TxLog.init(spark, root, docs.limit(100))
    val snap = TxLog.snapshot(root).get
    // writer A wins version 2
    TxLog.commitOverwrite(spark, root, docs.limit(50), snap.version, "winner")
    // writer B, still holding the stale snapshot, must fail having
    // published nothing — and its staged files must be unreachable
    val e = intercept[java.util.ConcurrentModificationException] {
      TxLog.commitOverwrite(spark, root, docs.limit(10), snap.version, "loser")
    }
    assert(e.getMessage.contains("stale"))
    assert(TxLog.read(spark, root).count() === 50)
    assert(TxLog.snapshot(root).get.notes === Set("winner"))
    // loser staged one orphan data dir; winner+v1 dirs stay referenced
    assert(TxLog.vacuum(root) === 1)
    assert(TxLog.read(spark, root).count() === 50)
    assert(TxLog.read(spark, root, 1L).count() === 100)
  }

  test("reader concurrent with a storm of commits sees one version, never a mix") {
    val root = freshRoot("race")
    // every version's rows all carry that version's tag: a mixed read
    // would surface as >1 distinct tag or a count/tag mismatch
    def tagged(tag: Long) = spark.range(200).select(
      col("id").as("doc_id"), lit(tag).as("tag"))
    TxLog.init(spark, root, tagged(1))
    @volatile var writerDone = false
    val writer = new Thread(() => {
      try (2 to 12).foreach { k =>
        TxLog.withRetry(root) { snapOpt =>
          Some(TxLog.commitOverwrite(spark, root, tagged(k), snapOpt.get.version))
        }
      } finally writerDone = true
    })
    writer.start()
    var reads = 0
    try {
      while (!writerDone) {
        val rows = TxLog.read(spark, root).select("tag").distinct().collect()
        assert(rows.length === 1, s"mixed snapshot: ${rows.mkString(",")}")
        reads += 1
      }
    } finally writer.join()
    assert(reads > 0)
    assert(TxLog.read(spark, root).select("tag").head.getLong(0) === 12L)
    assert(TxLog.currentVersion(root) === 12L)
  }

  test("foldOnce is effectively-once, including under concurrent folders") {
    val root = freshRoot("fold")
    def foldBatch(tag: String, rows: Long): Boolean =
      TxLog.foldOnce(spark, root, tag, {
        case None => spark.range(rows).select(col("id").as("v"))
        case Some(cur) => cur.unionByName(spark.range(rows).select(col("id").as("v")))
      })
    assert(foldBatch("b0", 10))
    assert(!foldBatch("b0", 10)) // replay no-op
    assert(TxLog.read(spark, root).count() === 10)

    // two DIFFERENT tags folded from racing threads: CAS loser retries
    // against fresh state — both batches land exactly once
    val t1 = new Thread(() => assert(foldBatch("b1", 5)))
    val t2 = new Thread(() => assert(foldBatch("b2", 7)))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(TxLog.read(spark, root).count() === 22)
    assert(TxLog.snapshot(root).get.notes === Set("b0", "b1", "b2"))
  }

  test("compact packs files; pruneHistory + vacuum release old versions") {
    val root = freshRoot("compact")
    TxLog.init(spark, root, docs.limit(64).repartition(16))
    val dataDirs = () => Option(new java.io.File(s"$root/data").listFiles())
      .getOrElse(Array.empty).count(_.isDirectory)
    assert(TxLog.snapshot(root).get.files.size === 16)
    TxLog.compact(spark, root, 2)
    assert(TxLog.snapshot(root).get.files.size <= 2)
    assert(TxLog.read(spark, root).count() === 64)
    // v1's 16-file dir survives (still pinnable) until history is pruned
    assert(dataDirs() === 2)
    TxLog.pruneHistory(root, keepLast = 1)
    assert(TxLog.vacuum(root) === 1)
    assert(dataDirs() === 1)
    assert(TxLog.read(spark, root).count() === 64)
    assert(intercept[IllegalStateException](
      TxLog.read(spark, root, 1L)).getMessage.contains("no committed version"))
  }
}
