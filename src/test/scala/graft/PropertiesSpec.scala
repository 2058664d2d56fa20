package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic properties (SURVEY §5.2 item 3) — the property-based layer the
  * reference's exact-float == checks could never express. Generators drive
  * thresholds/frames; each property is a law the operators must satisfy on
  * the real data regardless of parameter. */
class PropertiesSpec extends SparkSpec {

  private lazy val li = Tables.lineitem(spark, sf).cache()

  /** Deterministic ScalaCheck sampling (no scalatestplus bridge in the
    * offline cache): n values per generator from fixed seeds — Spark jobs
    * are expensive, so few-but-reproducible beats many-and-flaky. */
  private def samples[T](g: Gen[T], n: Int = 5): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong * 7919)))

  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    samples(ga).foreach(f)

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    samples(ga).zip(samples(gb)).foreach { case (a, b) => f(a, b) }

  test("filter(p) then filter(q) ≡ filter(p ∧ q), and both ⊆ filter(p)") {
    forAll(Gen.choose(1.0, 50.0), Gen.choose(0.0, 0.1)) { (qty, disc) =>
      val p = Filters.Pred("l_quantity", Filters.Ge, qty)
      val q = Filters.Pred("l_discount", Filters.Ge, disc)
      val chained = li.filter(p.toColumn).filter(q.toColumn).count()
      val conj = Filters.filterRows(li, p, q).count()
      val pOnly = Filters.filterRows(li, p).count()
      assert(chained === conj)
      assert(conj <= pOnly)
    }
  }

  test("complementary predicates partition the table for any threshold") {
    forAll(Gen.choose(1.0, 50.0)) { t =>
      val ge = Filters.filterRows(li, Filters.Pred("l_quantity", Filters.Ge, t)).count()
      val lt = Filters.filterRows(li, Filters.Pred("l_quantity", Filters.Lt, t)).count()
      assert(ge + lt === li.count())
    }
  }

  test("rolling min ≤ rolling avg ≤ rolling max pointwise, for any window width") {
    forAll(Gen.choose(1, 20)) { w =>
      val spec = Windows.rolling(Seq(col("l_suppkey")),
        Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_extendedprice")), 0, w - 1)
      val bad = li.select(
        min("l_extendedprice").over(spec).as("lo"),
        avg("l_extendedprice").over(spec).as("mid"),
        max("l_extendedprice").over(spec).as("hi"))
        .filter(col("lo") > col("mid") + 1e-9 || col("mid") > col("hi") + 1e-9)
        .count()
      assert(bad === 0L)
    }
  }

  test("grouped sums re-aggregate to the global sum (any grouping key)") {
    forAll(Gen.oneOf("l_returnflag", "l_linestatus", "l_suppkey")) { key =>
      val global = li.agg(sum(col("l_quantity").cast("long"))).collect()(0).getLong(0)
      val regrouped = li.groupBy(col(key)).agg(sum(col("l_quantity").cast("long")).as("s"))
        .agg(sum("s")).collect()(0).getLong(0)
      assert(global === regrouped)
    }
  }

  test("jaccard is symmetric, bounded, and 1 iff identical shingle sets") {
    val docs = Tables.documents(spark, sf)
    val sh = Dedup.shingles(docs).cache()
    val a = sh.select(col("doc_id").as("a_id"), col("g"))
    val b = sh.select(col("doc_id").as("b_id"), col("g"))
    val pairs = a.join(b, Seq("g")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val jac = Dedup.exactJaccard(sh, pairs).cache()
    val bad = jac.filter(col("jac") < 0 || col("jac") > 1).count()
    assert(bad === 0)
    // self-jaccard (via duplicated docs) is exactly 1
    val self = Dedup.exactJaccard(sh,
      sh.select(col("doc_id").as("a_id")).distinct().limit(5)
        .withColumn("b_id", col("a_id")))
    assert(self.filter(col("jac") =!= 1.0).count() === 0)
  }

  test("dedup survivor selection is idempotent (dedup(dedup(x)) == dedup(x))") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val key = md5(col("text").cast("binary"))
    val once = Dedup.keepFirstBy(docs, key)
    val twice = Dedup.keepFirstBy(once, key)
    assert(twice.exceptAll(once).count() === 0)
    assert(once.exceptAll(twice).count() === 0)
  }

  test("dfCapped with a cap above the max df is the identity") {
    val sh = Dedup.shingles(graft.sources.Tables.documents(spark, sf)).cache()
    val maxDf = sh.groupBy("g").count().agg(max("count")).collect()(0).getLong(0)
    val capped = Dedup.dfCapped(sh, maxDf.toInt)
    assert(capped.count() === sh.count())
    sh.unpersist()
  }

  test("containment dominates jaccard for every shared-shingle pair (C >= J)") {
    // c/min(na,nb) >= c/(na+nb-c) holds because na+nb-c >= max(na,nb);
    // the implementation must not break the algebra (e.g. by computing
    // the measures over different capped frames)
    val d6 = Dedup.defs.find(_.name == "d6_ngram_jaccard").get.run(spark, sf)
      .select(col("a_id"), col("b_id"), col("jaccard"))
    val d11 = Dedup.defs.find(_.name == "d11_containment").get.run(spark, sf)
      .select(col("a_id"), col("b_id"), col("containment"))
    // every pair d6 emits at rounded jaccard >= 0.81 must be in d11
    // (UNROUNDED containment threshold 0.8) with containment >= jaccard.
    // The 0.81 margin keeps the comparison off the rounding boundary: a
    // true J in [0.7999995, 0.8) rounds to 0.800000 in d6's output but
    // fails d11's unrounded >= 0.8 cut — correct behavior, spurious
    // failure at a 0.8 filter.
    val joined = d6.filter(col("jaccard") >= 0.81)
      .join(d11, Seq("a_id", "b_id"), "left")
    assert(joined.filter(col("containment").isNull).count() === 0,
      "high-jaccard pair missing from containment output")
    assert(joined.filter(col("containment") < col("jaccard")).count() === 0,
      "containment must dominate jaccard")
  }

  test("weighted MA lies between the rolling min and max of its own frame (any series)") {
    // w10's trailing 10-row weighted mean must sit inside the frame's
    // value envelope pointwise — a convexity law that holds for ANY
    // positive weighting, so it catches weight/denominator bugs without
    // re-deriving the exact constants. Computed in ONE pass over the same
    // window spec (no self-join: (suppkey, orderkey, linenumber) is NOT
    // unique in this synthetic data, so a key join would pair wrong rows)
    // and asserted as exact integers: den·lo ≤ num ≤ den·hi.
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"), col("l_extendedprice"))
    val wSpec = org.apache.spark.sql.expressions.Window
      .partitionBy("l_suppkey").orderBy(order: _*)
    val frame = Windows.rolling(Seq(col("l_suppkey")), order, -9, 0)
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val lagCols = (0 until 10).map { k =>
      (10 - k, if (k == 0) cents else lag(cents, k).over(wSpec))
    }
    val num = lagCols.map { case (wt, c) => coalesce(c, lit(0L)) * wt }.reduce(_ + _)
    val den = lagCols.map { case (wt, c) =>
      when(c.isNotNull, wt.toLong).otherwise(0L)
    }.reduce(_ + _)
    val bad = li.select(num.as("num"), den.as("den"),
        min(cents).over(frame).as("lo"), max(cents).over(frame).as("hi"))
      .filter(col("num") < col("den") * col("lo") ||
        col("num") > col("den") * col("hi"))
    assert(bad.count() === 0)
  }

  test("mode frequency dominates every other value's frequency in its group") {
    val mode = SparkEntry.queries("a13_exact_mode")(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"), col("freq"))
    val counts = li.groupBy(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long")).agg(count(lit(1)).as("n"))
      .groupBy("l_returnflag", "l_linestatus").agg(max("n").as("max_n"))
    val bad = mode.join(counts, Seq("l_returnflag", "l_linestatus"))
      .filter(col("freq") =!= col("max_n"))
    assert(bad.count() === 0)
  }

  test("topK(k) is a prefix of topK(k') for k < k'") {
    forAll(Gen.choose(1, 50)) { k =>
      val order = Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      val small = li.orderBy(order: _*).limit(k)
        .select("l_orderkey", "l_linenumber").collect().toSeq
      val big = li.orderBy(order: _*).limit(k + 10)
        .select("l_orderkey", "l_linenumber").collect().toSeq
      assert(big.take(k) === small)
    }
  }
}
