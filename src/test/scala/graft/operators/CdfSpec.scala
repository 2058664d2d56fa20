package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Row-level change feed ([[TxLog.readChanges]]): inserts from appends,
  * deletes from deletion-vector position diffs and pure-remove commits,
  * resurrections from dv shrinks (restore), loud refusal on
  * rewrite-shaped commits — all resolved from manifests + sidecars, no
  * CDC files written at commit time. */
class CdfSpec extends SparkSpec {

  private def freshRoot(tag: String) =
    s"/root/repo/target/cdf-$tag-${System.nanoTime()}"

  private def docs = Tables.documents(spark, sf).select("doc_id", "text")

  test("append-only range: every appended row surfaces as an insert") {
    val root = freshRoot("append")
    import spark.implicits._
    TxLog.init(spark, root, docs)
    val b1 = Seq((2000001L, "x"), (2000002L, "y")).toDF("doc_id", "text")
    TxLog.appendOnce(spark, root, "b1", b1)
    val b2 = Seq((2000003L, "z")).toDF("doc_id", "text")
    TxLog.appendOnce(spark, root, "b2", b2)
    val feed = TxLog.readChanges(spark, root, 1L)
    assert(feed.filter(col("_change_type") =!= "insert").count() === 0L)
    assert(feed.filter(col("_commit_version") === 2L).count() === 2L)
    assert(feed.filter(col("_commit_version") === 3L).count() === 1L)
    assert(feed.select("doc_id").collect().map(_.getLong(0)).sorted ===
      Array(2000001L, 2000002L, 2000003L))
  }

  test("MoR delete: exactly the victim ROWS surface as deletes") {
    val root = freshRoot("delete")
    TxLog.init(spark, root, docs.repartition(4))
    TxLog.deleteMoR(spark, root, col("doc_id") % 7 === 0)
    val feed = TxLog.readChanges(spark, root, 1L)
    val want = docs.filter(col("doc_id") % 7 === 0)
    assert(feed.filter(col("_change_type") === "delete").count() === want.count())
    assert(feed.filter(col("_change_type") === "insert").count() === 0L)
    // the deleted PAYLOAD is byte-exact, not just counted
    assert(feed.agg(sum((col("doc_id") + 1) *
        length(col("text").cast("binary")))).head().getLong(0) ===
      want.agg(sum((col("doc_id") + 1) *
        length(col("text").cast("binary")))).head().getLong(0))
    assert(feed.select("_commit_version").distinct().head().getLong(0) === 2L)
  }

  test("mixed range: appends then a delete hitting both vintages") {
    val root = freshRoot("mixed")
    import spark.implicits._
    TxLog.init(spark, root, docs)
    val ins = docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    TxLog.appendOnce(spark, root, "b1", ins)
    TxLog.deleteMoR(spark, root, col("doc_id") % 13 === 0)
    val feed = TxLog.readChanges(spark, root, 1L).cache()
    try {
      val inserts = feed.filter(col("_change_type") === "insert")
      val deletes = feed.filter(col("_change_type") === "delete")
      assert(inserts.count() === ins.count())
      // victims come from BOTH the original files and the appended one
      val all = docs.unionByName(ins)
      assert(deletes.count() === all.filter(col("doc_id") % 13 === 0).count())
      assert(deletes.filter(col("doc_id") >= 1000000L).count() ===
        ins.filter(col("doc_id") % 13 === 0).count())
    } finally feed.unpersist()
  }

  test("full-file MoR drop surfaces the file's live rows as deletes") {
    val root = freshRoot("drop")
    import spark.implicits._
    TxLog.init(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1))
    TxLog.appendOnce(spark, root, "b1",
      Seq((3L, "c")).toDF("id", "s").coalesce(1))
    // delete the whole appended file: its entry DROPS (pure remove)
    TxLog.deleteMoR(spark, root, col("id") === 3L)
    val feed = TxLog.readChanges(spark, root, 2L)
    assert(feed.filter(col("_change_type") === "delete")
      .select("id").head().getLong(0) === 3L)
    assert(feed.count() === 1L)
  }

  test("restore across a MoR delete surfaces resurrected rows as inserts") {
    val root = freshRoot("restore")
    TxLog.init(spark, root, docs.repartition(4))
    TxLog.deleteMoR(spark, root, col("doc_id") % 11 === 0)
    TxLog.restore(spark, root, 1L)
    val feed = TxLog.readChanges(spark, root, 2L)
    val want = docs.filter(col("doc_id") % 11 === 0)
    assert(feed.filter(col("_change_type") === "insert").count() === want.count())
    assert(feed.filter(col("_change_type") === "delete").count() === 0L)
    // and the whole range nets out: delete at v2, resurrect at v3
    val whole = TxLog.readChanges(spark, root, 1L)
    assert(whole.filter(col("_change_type") === "delete").count() === want.count())
    assert(whole.filter(col("_change_type") === "insert").count() === want.count())
  }

  test("rewrite-shaped commits refuse loudly; metadata-only commits are silent") {
    val root = freshRoot("refuse")
    TxLog.init(spark, root, docs.repartition(4))
    TxLog.setProperties(root, Map("owner" -> "cdf-test"))
    assert(TxLog.readChanges(spark, root, 1L).count() === 0L)
    TxLog.updateWhere(spark, root, col("doc_id") % 10 === 0,
      Seq("text" -> lit("UPDATED")))
    val ex = intercept[IllegalArgumentException] {
      TxLog.readChanges(spark, root, 1L).count()
    }
    assert(ex.getMessage.contains("rewrote data files"))
    // a sub-range BEFORE the rewrite still reads
    assert(TxLog.readChanges(spark, root, 1L, 2L).count() === 0L)
  }

  test("column mapping: the feed speaks logical names across a rename") {
    val root = freshRoot("mapping")
    import spark.implicits._
    TxLog.init(spark, root, docs)
    TxLog.renameColumn(spark, root, "text", "body")
    TxLog.appendOnce(spark, root, "b1",
      Seq((3000001L, "new")).toDF("doc_id", "body"))
    TxLog.deleteMoR(spark, root, col("doc_id") === 3000001L)
    val feed = TxLog.readChanges(spark, root, 2L)
    assert(feed.columns.contains("body") && !feed.columns.contains("text"))
    assert(feed.filter(col("_change_type") === "insert")
      .select("body").head().getString(0) === "new")
    assert(feed.filter(col("_change_type") === "delete")
      .select("body").head().getString(0) === "new")
  }

  test("empty range returns a schema-correct empty feed") {
    val root = freshRoot("empty")
    TxLog.init(spark, root, docs)
    val feed = TxLog.readChanges(spark, root, 1L, 1L)
    assert(feed.count() === 0L)
    assert(feed.columns.contains("_change_type") &&
      feed.columns.contains("_commit_version"))
  }
}
