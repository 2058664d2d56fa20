package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Cross-PROCESS writer contract for the persisted indexes: optimistic
  * claims over atomic file creation. The in-process buildLock cannot see
  * a second driver, so these tests drive [[IndexCommit]] directly to
  * simulate the interleavings two JVMs can produce — the claim primitive
  * is pure filesystem state, identical across processes. */
class IndexCommitSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("claim is single-winner: a stale writer is rejected before writing") {
    val base = "/root/repo/target/graft-ivfidx-test/commit-race"
    IvfIndex.buildIvf(emb.filter(col("vec_id") % 2 === 0), base)
    assert(IndexCommit.version(base) === 1L)

    // two writers read the same version; the claim race has ONE winner
    val v = IndexCommit.version(base)
    assert(IndexCommit.claim(base, v) === v + 1)
    intercept[java.util.ConcurrentModificationException] {
      IndexCommit.claim(base, v) // writer B, stale read
    }
    IndexCommit.finalizeCommit(base, v + 1)
    assert(IndexCommit.version(base) === v + 1)
    assert(IndexCommit.unfinalized(base).isEmpty)
  }

  test("forced stale-meta race through the public API: loser rejected, retry lands, append≡rebuild") {
    val base = "/root/repo/target/graft-ivfidx-test/commit-stale"
    val third = (r: Int) => emb.filter(col("vec_id") % 3 === r)
    IvfIndex.buildIvf(third(0), base)

    // writer B snapshots version BEFORE writer A commits — the stale read
    val staleV = IndexCommit.version(base)
    IvfIndex.appendIvf(third(1), base) // writer A wins
    // writer B's front half (claim with the stale version) must lose
    // atomically, before any data write
    val listsAfterA = spark.read.parquet(s"$base/lists").count()
    intercept[java.util.ConcurrentModificationException] {
      IndexCommit.claim(base, staleV)
    }
    assert(spark.read.parquet(s"$base/lists").count() === listsAfterA)

    // B retries against the fresh state and lands
    IvfIndex.appendIvf(third(2), base)

    // append ≡ rebuild: the twice-appended index holds exactly the full
    // corpus assigned against the ORIGINAL centroids
    val cs = spark.read.parquet(s"$base/centroids")
    val want = Similarity.assignTo(emb, cs, Similarity.AssignR)
      .select("vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = spark.read.parquet(s"$base/lists")
      .select(col("vec_id"), col("list_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(spark.read.parquet(s"$base/meta").collect()(0).getLong(0) === emb.count())
    assert(IndexCommit.version(base) === 3L)
  }

  test("a crashed writer's unfinalized claim blocks appends until rebuild") {
    val base = "/root/repo/target/graft-ivfidx-test/commit-crash"
    IvfIndex.buildIvf(emb.filter(col("vec_id") % 2 === 0), base)
    // writer claims, then dies before finalize (partial data possible)
    IndexCommit.claim(base, IndexCommit.version(base))
    assert(IndexCommit.unfinalized(base).nonEmpty)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.appendIvf(emb.filter(col("vec_id") % 2 =!= 0), base)
    }
    assert(e.getMessage.contains("rebuild"))
    // the policy lever: a full rebuild clears the orphaned claim
    IvfIndex.buildIvf(emb.filter(col("vec_id") % 2 === 0), base)
    assert(IndexCommit.unfinalized(base).isEmpty)
    IvfIndex.appendIvf(emb.filter(col("vec_id") % 2 =!= 0), base)
    assert(spark.read.parquet(s"$base/meta").collect()(0).getLong(0) === emb.count())
  }

  test("janitor: a staged crashed append rolls back to the committed state") {
    val base = "/root/repo/target/graft-ivfidx-test/commit-janitor"
    val half = emb.filter(col("vec_id") % 2 === 0)
    IvfIndex.buildIvf(half, base)
    val listsBefore = spark.read.parquet(s"$base/lists")
      .select("vec_id", "list_id").collect().map(_.toString).sorted.toSeq
    val metaBefore = spark.read.parquet(s"$base/meta").collect()(0).getLong(0)

    // simulate a writer that claims, stages, appends real data files into
    // lists (including a brand-new partition dir) — then dies pre-finalize
    val v = IndexCommit.claim(base, IndexCommit.version(base))
    IndexCommit.stage(base, v, Seq("lists", "meta"))
    spark.range(3).select(lit(999999L).as("vec_id"))
      .write.mode("append").parquet(s"$base/lists/list_id=424242")
    assert(IndexCommit.unfinalized(base).nonEmpty)
    intercept[IllegalArgumentException] {
      IvfIndex.appendIvf(emb.filter(col("vec_id") % 2 =!= 0), base)
    }

    // the janitor deletes exactly the batch's files and retires the claim
    val cleaned = IvfIndex.recoverIvf(spark, base)
    assert(cleaned === Some(v))
    assert(IndexCommit.unfinalized(base).isEmpty)
    assert(!new java.io.File(s"$base/lists/list_id=424242").exists,
      "batch-introduced partition dir must be removed")
    val listsAfter = spark.read.parquet(s"$base/lists")
      .select("vec_id", "list_id").collect().map(_.toString).sorted.toSeq
    assert(listsAfter === listsBefore)
    assert(spark.read.parquet(s"$base/meta").collect()(0).getLong(0) === metaBefore)

    // and the index accepts appends again, landing on the correct state
    IvfIndex.appendIvf(emb.filter(col("vec_id") % 2 =!= 0), base)
    assert(spark.read.parquet(s"$base/meta").collect()(0).getLong(0) === emb.count())
  }

  test("janitor: a pre-manifest legacy claim is left for the rebuild lever") {
    val base = "/root/repo/target/graft-ivfidx-test/commit-legacy"
    IvfIndex.buildIvf(emb.filter(col("vec_id") % 2 === 0), base)
    IndexCommit.claim(base, IndexCommit.version(base)) // no stage() — legacy
    assert(IvfIndex.recoverIvf(spark, base).isEmpty)
    assert(IndexCommit.unfinalized(base).nonEmpty, "claim must survive")
    IvfIndex.buildIvf(emb, base) // rebuild remains the unblock path
    assert(IndexCommit.unfinalized(base).isEmpty)
  }

  test("janitor: healthy index is a no-op; SigIndex crash mid-meta re-derives the count") {
    val base = "/root/repo/target/graft-ivfidx-test/commit-sigjanitor"
    val docs = Tables.documents(spark, sf)
    SigIndex.build(docs.filter(col("doc_id") % 5 =!= 0), base)
    assert(SigIndex.recover(spark, base).isEmpty) // nothing to clean

    val metaBefore = spark.read.parquet(s"$base/meta").collect()(0).getAs[Long]("n")
    // crash DURING the meta overwrite: claim+stage, then clobber meta the
    // way a dying overwrite does (old files deleted, nothing valid yet)
    val v = IndexCommit.claim(base, IndexCommit.version(base))
    IndexCommit.stage(base, v, Seq("postings", "bands", "meta"))
    val metaDir = new java.io.File(s"$base/meta")
    metaDir.listFiles().foreach(_.delete())
    assert(SigIndex.recover(spark, base) === Some(v))
    val metaAfter = spark.read.parquet(s"$base/meta").collect()(0).getAs[Long]("n")
    assert(metaAfter === metaBefore,
      "re-derived count must equal the committed corpus (every doc shingles here)")
    // appends unblocked and correct
    SigIndex.append(docs.filter(col("doc_id") % 5 === 0), base)
    assert(spark.read.parquet(s"$base/meta").collect()(0).getAs[Long]("n")
      === docs.count())
  }

  test("janitor crash window: an orphan manifest without its marker is inert") {
    val base = "/root/repo/target/graft-ivfidx-test/commit-orphan"
    IvfIndex.buildIvf(emb.filter(col("vec_id") % 2 === 0), base)
    // simulate cleanPartial dying between its two deletes (marker first):
    // a .staged file remains with no commit marker
    val orphan = java.nio.file.Paths.get(base, "commits", "commit-99.staged")
    java.nio.file.Files.write(orphan, java.util.Arrays.asList("roots\tlists"))
    assert(IndexCommit.unfinalized(base).isEmpty, "no marker => no unfinalized claim")
    assert(IvfIndex.recoverIvf(spark, base).isEmpty)
    // appends proceed normally, and a future claim of the same version
    // would truncate-overwrite the orphan via stage()
    IvfIndex.appendIvf(emb.filter(col("vec_id") % 2 =!= 0), base)
    assert(spark.read.parquet(s"$base/meta").collect()(0).getLong(0) === emb.count())
  }

  test("SigIndex.append runs the same protocol") {
    val base = "/root/repo/target/graft-ivfidx-test/commit-sig"
    val docs = Tables.documents(spark, sf)
    SigIndex.build(docs.filter(col("doc_id") % 5 =!= 0), base)
    assert(IndexCommit.version(base) === 1L)
    SigIndex.append(docs.filter(col("doc_id") % 5 === 0), base)
    assert(IndexCommit.version(base) === 2L)
    assert(IndexCommit.unfinalized(base).isEmpty)
    // a stale claim (concurrent second driver) is rejected
    intercept[java.util.ConcurrentModificationException] {
      IndexCommit.claim(base, 1L)
    }
  }
}
