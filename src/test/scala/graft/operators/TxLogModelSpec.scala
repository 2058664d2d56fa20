package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based test of the transaction log: a SEEDED random sequence of
  * table operations runs against both the real TxLog table and a trivial
  * in-memory reference model (a Map plus its version history), and the
  * table must equal the model after EVERY operation — including time
  * travel back to every retained version at the end. The ops compose in
  * orders no hand-written scenario covers (restore after upsert after
  * delete after compact...), which is exactly where a commit-log bug
  * would hide. Seeds are fixed: failures reproduce, the suite never
  * flakes. */
class TxLogModelSpec extends SparkSpec {

  import spark.implicits._

  private def freshRoot(tag: String) =
    s"/root/repo/target/txlog-model-$tag-${System.nanoTime()}"

  /** The reference model: key -> value, with full version history. */
  private final class Model {
    var history: Vector[Map[Long, String]] = Vector.empty // index v-1
    def current: Map[Long, String] = history.last
    def commit(m: Map[Long, String]): Unit = history = history :+ m
    def version: Long = history.size.toLong
  }

  private def toDf(m: Map[Long, String]) =
    m.toSeq.toDF("id", "s")

  private def tableState(root: String, v: Long = -1L): Map[Long, String] =
    TxLog.read(spark, root, v).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def runSequence(seed: Long, ops: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val root = freshRoot(s"s$seed")
    val model = new Model
    def kv(n: Int): Map[Long, String] =
      (0 until n).map(_ => rnd.nextInt(40).toLong -> s"v${rnd.nextInt(1000)}").toMap

    // init
    val init = kv(8) + (1L -> "seed") // never empty
    TxLog.init(spark, root, toDf(init))
    model.commit(init)

    var monotoneId = -1L
    (1 to ops).foreach { i =>
      val opKind = rnd.nextInt(7)
      opKind match {
        case 0 => // keyed upsert
          val batch = kv(1 + rnd.nextInt(6))
          TxLog.upsert(spark, root, toDf(batch), "id")
          model.commit(model.current ++ batch)
        case 1 => // predicate delete (never empties the table: keep key 1)
          val m = 2 + rnd.nextInt(5)
          TxLog.delete(spark, root, col("id") % m === 0 && col("id") =!= 1L)
          model.commit(model.current.filter { case (k, _) => k % m != 0 || k == 1L })
        case 2 => // targeted update, assignments against the original row
          val m = 2 + rnd.nextInt(4)
          TxLog.updateWhere(spark, root, col("id") % m === 1,
            Seq("s" -> concat(lit("u"), col("s"))))
          model.commit(model.current.map { case (k, v) =>
            k -> (if (k % m == 1) s"u$v" else v)
          })
        case 3 => // monotone append with fresh keys (append must not collide)
          monotoneId += 1
          val fresh = (0 to rnd.nextInt(3))
            .map(j => (1000L + monotoneId * 10 + j) -> s"m$monotoneId").toMap
          assert(TxLog.appendOnceMonotone(spark, root, "mb", monotoneId, toDf(fresh)))
          // a replay must no-op and must NOT create a version
          val vAfter = TxLog.currentVersion(root)
          assert(!TxLog.appendOnceMonotone(spark, root, "mb", monotoneId, toDf(fresh)))
          assert(TxLog.currentVersion(root) === vAfter)
          model.commit(model.current ++ fresh)
        case 4 => // compact: content-preserving; commits a version only when fragmented
          val before = TxLog.currentVersion(root)
          val after = TxLog.compact(spark, root, 2)
          if (after != before) model.commit(model.current)
        case 5 => // metadata-only restore to a random RETAINED version
          val target = 1L + rnd.nextInt(model.version.toInt).toLong
          TxLog.restore(spark, root, target)
          model.commit(model.history((target - 1).toInt))
        case 6 => // overwrite commit (schema-stable here; content replaced)
          val fresh = kv(4 + rnd.nextInt(4)) + (1L -> "seed")
          TxLog.commitOverwrite(spark, root, toDf(fresh),
            expected = TxLog.currentVersion(root))
          model.commit(fresh)
      }
      assert(TxLog.currentVersion(root) === model.version,
        s"seed=$seed op#$i kind=$opKind: version diverged")
      assert(tableState(root) === model.current,
        s"seed=$seed op#$i kind=$opKind: content diverged from model")
    }

    // time travel: EVERY retained version still equals its model state
    (1L to model.version).foreach { v =>
      assert(tableState(root, v) === model.history((v - 1).toInt),
        s"seed=$seed: version $v diverged under time travel")
    }

    // maintenance epilogue: prune + ungraced vacuum, latest still intact
    TxLog.pruneHistory(root, keepLast = 2)
    TxLog.vacuum(root, graceMs = 0L)
    assert(tableState(root) === model.current,
      s"seed=$seed: content diverged after prune+vacuum")
    assert(tableState(root, model.version - 1) ===
      model.history(model.version.toInt - 2),
      s"seed=$seed: retained previous version diverged after prune+vacuum")
  }

  test("seeded op sequences: table == model after every op, every version, and maintenance") {
    runSequence(seed = 41L, ops = 14)
    runSequence(seed = 1337L, ops = 14)
  }
}
