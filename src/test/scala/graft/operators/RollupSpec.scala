package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Incremental rollup-store contract: mergeability (fold order cannot
  * matter), effectively-once replays, and fold ≡ recompute — the parts
  * the s9 oracle hash certifies only for one fixed fold sequence. */
class RollupSpec extends SparkSpec {

  private def freshStore(tag: String): String = {
    val p = s"/root/repo/target/graft-maint-test/$tag"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    p
  }

  private def snapshot(store: String): Set[String] =
    spark.read.parquet(store).collect().map(_.toString).toSet

  test("fold order cannot matter: three permutations land the identical store") {
    val ev = Tables.events(spark, sf)
    def slice(r: Int) = ev.filter(expr("ts_us div 86400000000") % 3 === r)
    val stores = Seq(Seq(0, 1, 2), Seq(2, 0, 1), Seq(1, 2, 0)).zipWithIndex.map {
      case (order, i) =>
        val st = freshStore(s"order-$i")
        order.foreach(r => Rollup.fold(spark, st, slice(r), s"slice-$r"))
        snapshot(st)
    }
    assert(stores(0).nonEmpty)
    assert(stores(0) === stores(1))
    assert(stores(1) === stores(2))
  }

  test("fold == recompute, and a replayed tag is a no-op that changes nothing") {
    val ev = Tables.events(spark, sf)
    val st = freshStore("replay")
    def slice(r: Int) = ev.filter(expr("ts_us div 86400000000") % 3 === r)
    (0 to 2).foreach(r => assert(Rollup.fold(spark, st, slice(r), s"slice-$r")))
    val before = snapshot(st)
    // replays of every tag: all rejected, store byte-identical
    (0 to 2).foreach(r => assert(!Rollup.fold(spark, st, slice(r), s"slice-$r")))
    assert(snapshot(st) === before)
    // fold ≡ recompute: the store equals one-shot aggregation of everything
    val direct = Rollup.grain(ev).collect().map(_.toString).toSet
    assert(before === direct)
  }

  test("tag set commits atomically with the swap: no double-count window") {
    val ev = Tables.events(spark, sf)
    val st = freshStore("atomic-tag")
    def slice(r: Int) = ev.filter(expr("ts_us div 86400000000") % 3 === r)
    Rollup.fold(spark, st, slice(0), "slice-0")
    // the committed store must already carry its tag INSIDE the data dir
    assert(Rollup.foldedTags(st) === Set("slice-0"))
    Rollup.fold(spark, st, slice(1), "slice-1")
    assert(Rollup.foldedTags(st) === Set("slice-0", "slice-1"))
    // a replay straight after the swap (the old post-swap marker window)
    // is refused by the in-store tag set alone
    assert(!Rollup.fold(spark, st, slice(1), "slice-1"))
    val direct = Rollup.grain(ev.filter(expr("ts_us div 86400000000") % 3 =!= 2))
      .collect().map(_.toString).toSet
    assert(snapshot(st) === direct)
  }

  test("a torn swap recovers on the next fold (crash between the two moves)") {
    val ev = Tables.events(spark, sf)
    val st = freshStore("torn")
    def slice(r: Int) = ev.filter(expr("ts_us div 86400000000") % 3 === r)
    Rollup.fold(spark, st, slice(0), "slice-0")
    // simulate swapInPlace dying after moving live → .old but before
    // moving the replacement in: the live dir is missing, .old holds data
    java.nio.file.Files.move(java.nio.file.Paths.get(st),
      java.nio.file.Paths.get(st + ".rollup-old"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    assert(!new java.io.File(st).exists)
    // next fold must first roll the store back, then land the new batch
    assert(Rollup.fold(spark, st, slice(1), "slice-1"))
    val want = Rollup.grain(ev.filter(expr("ts_us div 86400000000") % 3 =!= 2))
      .collect().map(_.toString).toSet
    assert(snapshot(st) === want)
  }
}
