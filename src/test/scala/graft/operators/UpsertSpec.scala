package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Keyed copy-on-write merge: replace, insert, survive; partition-scoped
  * rewrites touch only the batch's partitions. Expectations are built
  * from the immutable source table, never from reads of the mutated path
  * (whose cached plans the operator deliberately invalidates). */
class UpsertSpec extends SparkSpec {

  private def src = Tables.documents(spark, sf).select("doc_id", "text", "lang")

  test("upsert replaces by key, inserts new keys, leaves the rest untouched") {
    val dir = s"/root/repo/target/upsert-test-${System.nanoTime()}"
    src.coalesce(2).write.parquet(dir)
    val n = src.count()
    val batch = src.filter(col("doc_id") < 10)
      .withColumn("text", lit("REPLACED"))
      .unionByName(src.limit(1)
        .select(lit(999999L).as("doc_id"), lit("NEW").as("text"), lit("en").as("lang")))

    val stats = Upsert.upsert(spark, dir, batch, "doc_id")
    assert(stats.rowsBefore === n)
    assert(stats.rowsAfter === n + 1)

    val after = spark.read.parquet(dir)
    val expected = src.filter(col("doc_id") >= 10).unionByName(batch)
    assert(after.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(after).count() === 0)
    assert(after.select("doc_id").distinct().count() === after.count())
    assert(!new java.io.File(dir + ".upsert-tmp").exists())
    assert(!new java.io.File(dir + ".upsert-old").exists())
  }

  test("delete removes exactly the victims, survivors byte-identical") {
    val dir = s"/root/repo/target/delete-test-${System.nanoTime()}"
    src.coalesce(2).write.parquet(dir)
    val victim = col("doc_id") % 5 === 0
    val nVictims = src.filter(victim).count()
    assert(nVictims > 0)

    val (before, after) = Upsert.delete(spark, dir, victim)
    assert(before === src.count())
    assert(after === before - nVictims)

    val got = spark.read.parquet(dir)
    assert(got.filter(victim).count() === 0)
    val want = src.filter(!victim)
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    assert(!new java.io.File(dir + ".delete-tmp").exists())
    assert(!new java.io.File(dir + ".delete-old").exists())
  }

  test("upsert into a never-seen partition mints it instead of throwing") {
    val root = s"/root/repo/target/upsert-new-${System.nanoTime()}"
    src.filter(col("lang") =!= src.select("lang").head().getString(0))
      .write.partitionBy("lang").parquet(root)
    val fresh = src.select("lang").head().getString(0) // partition NOT in root
    assert(!new java.io.File(s"$root/lang=$fresh").exists())
    val batch = src.filter(col("lang") === fresh).limit(5)
    val nBatch = batch.count()
    val stats = Upsert.upsertPartitioned(spark, root, batch, "doc_id", "lang")
    assert(stats === Seq(fresh -> Upsert.UpsertStats(0L, nBatch, nBatch)))
    assert(spark.read.parquet(s"$root/lang=$fresh").count() === nBatch)
  }

  test("partition-scoped upsert rewrites ONLY touched partitions") {
    val root = s"/root/repo/target/upsert-part-${System.nanoTime()}"
    src.write.partitionBy("lang").parquet(root)
    val langs = new java.io.File(root).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("lang="))
      .map(_.getName.stripPrefix("lang=")).sorted
    assert(langs.length >= 2)
    val (touch, keep) = (langs.head, langs.last)
    val keepDir = s"$root/lang=$keep"
    val keepFiles = new java.io.File(keepDir).listFiles()
      .map(f => f.getName -> f.lastModified).toMap

    val hit = col("lang") === touch && col("doc_id") % 7 === 0
    val batch = src.filter(hit).withColumn("text", lit("PATCHED"))
    val nBatch = batch.count()
    assert(nBatch > 0)
    val stats = Upsert.upsertPartitioned(spark, root, batch, "doc_id", "lang")
    assert(stats.map(_._1) === Seq(touch))

    // untouched partition: same files, same mtimes — provably not rewritten
    val keepAfter = new java.io.File(keepDir).listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    assert(keepAfter === keepFiles)

    val after = spark.read.parquet(root).select("doc_id", "text", "lang")
    val expected = src.withColumn("text", when(hit, "PATCHED").otherwise(col("text")))
    assert(after.count() === src.count())
    assert(after.filter(col("text") === "PATCHED").count() === nBatch)
    assert(after.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(after).count() === 0)
  }

  test("hive-escaped and NULL partition values reuse the writer's directories") {
    val root = s"/root/repo/target/upsert-esc-${System.nanoTime()}"
    import spark.implicits._
    // partition values a partitioned writer escapes (space is literal in
    // hive naming, '/' and '%' are not) plus a NULL (hive default partition)
    val base = Seq((1L, "a", "a/b"), (2L, "b", "p%q"), (3L, "c", null))
      .toDF("doc_id", "text", "lang")
    base.write.partitionBy("lang").parquet(root)
    val dirsBefore = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirsBefore.exists(_ != "lang=a/b")) // sanity: writer escaped

    val batch = Seq((1L, "A2", "a/b"), (4L, "d", "p%q"), (5L, "e", null))
      .toDF("doc_id", "text", "lang")
    Upsert.upsertPartitioned(spark, root, batch, "doc_id", "lang")

    // no divergent unescaped sibling directories were minted
    val dirsAfter = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirsAfter === dirsBefore)

    // the standard partitioned reader sees the merged table
    val after = spark.read.parquet(root)
    assert(after.count() === 5)
    assert(after.filter(col("doc_id") === 1).select("text").head().getString(0) === "A2")
    assert(after.filter(col("lang").isNull).select("doc_id").collect()
      .map(_.getLong(0)).toSet === Set(3L, 5L))
  }

  test("empty-string partition values merge into the hive default partition") {
    val root = s"/root/repo/target/upsert-empty-${System.nanoTime()}"
    import spark.implicits._
    // Spark's partitioned writer stores BOTH null and "" under
    // __HIVE_DEFAULT_PARTITION__ (and reads them back as null)
    val base = Seq((1L, "a", ""), (2L, "b", "x")).toDF("doc_id", "text", "lang")
    base.write.partitionBy("lang").parquet(root)
    val dirsBefore = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirsBefore.contains("lang=__HIVE_DEFAULT_PARTITION__"))

    // batch carries one "" and one NULL value: both must route to the
    // default partition (as ONE touched partition), never mint "lang="
    val batch = Seq((1L, "A2", ""), (3L, "c", null)).toDF("doc_id", "text", "lang")
    val stats = Upsert.upsertPartitioned(spark, root, batch, "doc_id", "lang")
    assert(stats.map(_._1) === Seq("__HIVE_DEFAULT_PARTITION__"))
    val dirsAfter = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirsAfter === dirsBefore)

    val after = spark.read.parquet(root)
    assert(after.count() === 3)
    assert(after.filter(col("doc_id") === 1).select("text").head().getString(0) === "A2")
    assert(after.filter(col("lang").isNull).select("doc_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 3L))
  }
}
