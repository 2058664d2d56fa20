package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Persisted incremental near-dedup index: append must equal rebuild,
  * overlapping appends must be rejected atomically, and a batch sharing
  * no buckets with the corpus must probe to empty (and cheaply). */
class SigIndexSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("append == rebuild: folding a batch in matches indexing everything at once") {
    val b1 = docs.filter(col("doc_id") % 3 === 0)
    val b2 = docs.filter(col("doc_id") % 3 === 1)
    val probeBatch = docs.filter(col("doc_id") % 3 === 2)
    val incDir = s"/root/repo/target/sigidx-inc-${System.nanoTime()}"
    val fullDir = s"/root/repo/target/sigidx-full-${System.nanoTime()}"
    SigIndex.build(b1, incDir)
    SigIndex.append(b2, incDir)
    SigIndex.build(b1.unionByName(b2), fullDir)
    val inc = SigIndex.probe(spark, incDir, probeBatch)
      .orderBy("old_id", "new_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val full = SigIndex.probe(spark, fullDir, probeBatch)
      .orderBy("old_id", "new_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(inc.toSeq === full.toSeq)
    assert(inc.nonEmpty, "fixture must exercise cross-batch near-dups")
  }

  test("append with overlapping doc_ids is rejected before any write") {
    val b1 = docs.filter(col("doc_id") < 50)
    val dir = s"/root/repo/target/sigidx-ovl-${System.nanoTime()}"
    SigIndex.build(b1, dir)
    val metaBefore = spark.read.parquet(s"$dir/meta").collect()(0).getLong(0)
    intercept[IllegalArgumentException] {
      SigIndex.append(docs.filter(col("doc_id") < 10), dir)
    }
    assert(spark.read.parquet(s"$dir/meta").collect()(0).getLong(0) === metaBefore,
      "failed append must not have advanced the meta count")
  }

  test("a batch sharing no shingles with the corpus probes to empty") {
    import spark.implicits._
    val dir = s"/root/repo/target/sigidx-disj-${System.nanoTime()}"
    SigIndex.build(docs.filter(col("doc_id") < 100), dir)
    val alien = Seq((100000L, (1 to 20).map(i => s"alien$i").mkString(" ")))
      .toDF("doc_id", "text")
    assert(SigIndex.probe(spark, dir, alien).count() === 0)
  }
}
