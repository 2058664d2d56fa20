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

  /** One modeled version: the keyed contents plus the LOGICAL name of
    * the value column (exercising column mapping composed with every
    * other op). */
  private final case class MState(data: Map[Long, String], valueCol: String)

  /** The reference model: key -> value, with full version history. */
  private final class Model {
    var history: Vector[MState] = Vector.empty // index v-1
    def current: MState = history.last
    def commit(m: MState): Unit = history = history :+ m
    def version: Long = history.size.toLong
  }

  private def toDf(m: Map[Long, String], valueCol: String) =
    m.toSeq.toDF("id", valueCol)

  private def tableState(root: String, v: Long = -1L): MState = {
    val df = TxLog.read(spark, root, v)
    MState(df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap,
      df.columns(1))
  }

  private def runSequence(seed: Long, ops: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val root = freshRoot(s"s$seed")
    val model = new Model
    def kv(n: Int): Map[Long, String] =
      (0 until n).map(_ => rnd.nextInt(40).toLong -> s"v${rnd.nextInt(1000)}").toMap

    // init
    val init = kv(8) + (1L -> "seed") // never empty
    TxLog.init(spark, root, toDf(init, "s"))
    model.commit(MState(init, "s"))

    var monotoneId = -1L
    (1 to ops).foreach { i =>
      val opKind = rnd.nextInt(8)
      val cur = model.current
      opKind match {
        case 0 => // keyed upsert — a full rewrite: materializes the logical name
          val batch = kv(1 + rnd.nextInt(6))
          TxLog.upsert(spark, root, toDf(batch, cur.valueCol), "id")
          model.commit(MState(cur.data ++ batch, cur.valueCol))
        case 1 => // predicate delete (never empties the table: keep key 1)
          val m = 2 + rnd.nextInt(5)
          TxLog.delete(spark, root, col("id") % m === 0 && col("id") =!= 1L)
          model.commit(MState(
            cur.data.filter { case (k, _) => k % m != 0 || k == 1L },
            cur.valueCol))
        case 2 => // targeted update, assignments against the original row
          val m = 2 + rnd.nextInt(4)
          TxLog.updateWhere(spark, root, col("id") % m === 1,
            Seq(cur.valueCol -> concat(lit("u"), col(cur.valueCol))))
          model.commit(MState(cur.data.map { case (k, v) =>
            k -> (if (k % m == 1) s"u$v" else v)
          }, cur.valueCol))
        case 3 => // monotone append with fresh keys (append must not collide)
          monotoneId += 1
          val fresh = (0 to rnd.nextInt(3))
            .map(j => (1000L + monotoneId * 10 + j) -> s"m$monotoneId").toMap
          assert(TxLog.appendOnceMonotone(spark, root, "mb", monotoneId,
            toDf(fresh, cur.valueCol)))
          // a replay must no-op and must NOT create a version
          val vAfter = TxLog.currentVersion(root)
          assert(!TxLog.appendOnceMonotone(spark, root, "mb", monotoneId,
            toDf(fresh, cur.valueCol)))
          assert(TxLog.currentVersion(root) === vAfter)
          model.commit(MState(cur.data ++ fresh, cur.valueCol))
        case 4 => // compact: content-preserving; commits a version only when fragmented
          val before = TxLog.currentVersion(root)
          val after = TxLog.compact(spark, root, 2)
          if (after != before) model.commit(cur)
        case 5 => // metadata-only restore to a random RETAINED version
          val target = 1L + rnd.nextInt(model.version.toInt).toLong
          TxLog.restore(spark, root, target)
          model.commit(model.history((target - 1).toInt))
        case 6 => // overwrite commit (schema-stable here; content replaced)
          val fresh = kv(4 + rnd.nextInt(4)) + (1L -> "seed")
          TxLog.commitOverwrite(spark, root, toDf(fresh, cur.valueCol),
            expected = TxLog.currentVersion(root))
          model.commit(MState(fresh, cur.valueCol))
        case 7 => // metadata-only rename (column mapping), s <-> t flip
          val next = if (cur.valueCol == "s") "t" else "s"
          TxLog.renameColumn(spark, root, cur.valueCol, next)
          model.commit(MState(cur.data, next))
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
