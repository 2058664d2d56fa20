package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Evolve-on-read semantics at row granularity (s6's fixture). */
class SchemaEvolutionSpec extends SparkSpec {

  test("merged-schema scan: old generation NULL, new generation carries values") {
    val fixture = SchemaEvolution.ensureFixture(spark, sf)
    val df = spark.read.option("mergeSchema", "true").parquet(fixture)
    assert(df.columns.toSet === Set("doc_id", "text", "lang"))
    // generation 1 (doc_id < 250): lang must be NULL — not a default value
    assert(df.filter(col("doc_id") < 250 && col("lang").isNotNull).count() === 0)
    // generation 2: lang survives byte-for-byte from the source table
    val want = Tables.documents(spark, sf)
      .filter(col("doc_id") >= 250).select("doc_id", "lang")
    val got = df.filter(col("doc_id") >= 250).select("doc_id", "lang")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    // no generation lost any rows
    assert(df.count() === Tables.documents(spark, sf).count())
  }
}
