package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper (not part of the driver contract): prints the
  * physical plan of each named registered query against a testdata dir —
  * the source of the PLANS.md audit sections.
  *
  * Usage: runMain graft.Explain <name> [<name> ...]
  * (env SPARK_GRAFT_SF_DIR overrides the default sf0.01 dir)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    for (name <- args) {
      println(s"\n## $name\n")
      qs.get(name) match {
        case Some(run) => println(run(spark, sfDir).queryExecution.executedPlan.toString)
        case None => println(s"(unknown query: $name)")
      }
    }
    spark.stop()
  }
}
