package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Dev-only per-stage profiler (not driver contract): runs named registered
  * queries through the noop sink with a listener recording every completed
  * stage's wall time, task count, and shuffle/input volumes — the guide-§1
  * "where does the time actually go" empirical loop, without the Spark UI
  * (disabled in this sandbox's harness runs).
  *
  * Usage: runMain graft.StageDiag <name> [<name> ...]
  *   env SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *   SPARK_GRAFT_DIAG_REPS (default 2; stages printed for the LAST rep so
  *   codegen/JIT warmup does not pollute the read).
  */
object StageDiag {
  private case class St(id: Int, name: String, ms: Long, tasks: Int,
    inputMb: Double, shReadMb: Double, shWriteMb: Double, spillMb: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_DIAG_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stagediag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s)
          .getOrElse(-1L)
        stages.synchronized {
          stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(90), ms,
            i.numTasks,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6)
        }
      }
    })

    val qs = SparkEntry.queries ++
      SparkEntry.benchOnlyDefs.map(d => d.name -> d.run).toMap
    for (name <- args) {
      qs.get(name) match {
        case None => println(s"(unknown query: $name)")
        case Some(run) =>
          // warm at the smallest sf (codegen cache), like Bench
          try run(spark, "/root/testdata/sf0.001")
            .write.mode("overwrite").format("noop").save()
          catch { case _: Throwable => () }
          spark.catalog.clearCache()
          var wall = 0.0
          for (rep <- 1 to reps) {
            stages.synchronized(stages.clear())
            val t0 = System.nanoTime()
            run(spark, sfDir).write.mode("overwrite").format("noop").save()
            wall = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache()
            println(f"[diag] $name rep$rep wall=$wall%.3f s")
          }
          val snap = stages.synchronized(stages.toVector)
          val total = snap.map(_.ms).sum / 1e3
          println(f"[diag] $name stages=${snap.size} stage-ms-sum=$total%.3f s (last rep)")
          println(f"[diag] ${"id"}%4s ${"ms"}%7s ${"tasks"}%5s ${"inMB"}%8s " +
            f"${"shRdMB"}%8s ${"shWrMB"}%8s ${"spill"}%6s  name")
          snap.sortBy(-_.ms).take(25).foreach { s =>
            println(f"[diag] ${s.id}%4d ${s.ms}%7d ${s.tasks}%5d ${s.inputMb}%8.1f " +
              f"${s.shReadMb}%8.1f ${s.shWriteMb}%8.1f ${s.spillMb}%6.1f  ${s.name}")
          }
      }
    }
    spark.stop()
  }
}
