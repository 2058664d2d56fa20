package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed PCA over the embedding corpus — the dimensionality-
  * reduction step embedding pipelines run before clustering / semantic
  * dedup (SemDeDup-style preprocessing) or index building.
  *
  * The scale shape is the textbook one: the only full-corpus pass
  * accumulates the dim×dim GRAM MATRIX (here 64×64 = 2,080 upper-tri
  * cells) with map-side partial aggregation — the shuffle moves ≤ cells ×
  * partitions rows, never corpus rows — and everything eigen happens on
  * the DRIVER over that fixed-size matrix (bounded driver state, the
  * Curation.packSequences discipline). Projection back over the corpus is
  * a narrow map against broadcast eigenvector literals: no shuffle at
  * all until the final 8-row variance aggregate.
  *
  * Exactness split (the sim3b/mm8 playbook):
  *   - emb2 certifies the gram matrix EXACTLY: elements are quantized to
  *     BIGINT (floor(x·10⁴) — floor, not round, per the engines'
  *     half-rounding divergence) so every cell is an exact integer sum,
  *     hash-matched against DuckDB cell by cell;
  *   - emb3 registers the ENGINE-INDEPENDENT verdict of the eigensolve +
  *     projection (spectrum ordering, eigen residuals, orthonormality,
  *     projected-variance agreement with the spectrum, cumulative
  *     explained-variance floor), because no SQL engine can twin a Jacobi
  *     eigensolve; PcaSpec audits the headroom behind each pin.
  *
  * PCA here is UNCENTERED (second moment about the origin), the standard
  * choice for unit-normalized embedding vectors; centering would add one
  * broadcast mean-vector subtraction to the same plan.
  */
object Pca {

  private val Dim = 64
  private val TopK = 8
  private val Q = 10000.0

  /** Exact quantized gram cells (i ≤ j): one narrow double-explode and a
    * partially-aggregated groupBy — 2,080 result rows regardless of
    * corpus size. */
  def gramCells(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(transform(col("embedding"),
        x => floor(x * Q).cast("long")).as("q"))
      .select(col("q"), posexplode(col("q")).as(Seq("i", "qi")))
      .select(col("i"), col("qi"), posexplode(col("q")).as(Seq("j", "qj")))
      .filter(col("i") <= col("j"))
      .groupBy("i", "j")
      .agg(sum(col("qi") * col("qj")).as("g"))

  /** Deterministic cyclic Jacobi eigensolve of a symmetric matrix —
    * single-threaded driver math over the fixed dim×dim gram; returns
    * (eigenvalues, eigenvectors as rows) sorted by eigenvalue
    * descending, ties broken by the original diagonal index so the
    * order is total. */
  private[operators] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    def off(): Double = {
      var s = 0.0
      var p = 0
      while (p < n) { var q = p + 1; while (q < n) { s += a(p)(q) * a(p)(q); q += 1 }; p += 1 }
      s
    }
    val norm0 = math.max(off(), 1e-300)
    while (sweep < 64 && off() > 1e-24 * norm0) {
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // theta == 0 (equal diagonal) still needs the full 45° step:
            // signum(0)=0 would silently skip the rotation forever
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until n).map(v(_)(i)).toArray).toArray)
  }

  /** Collect the exact gram (ONE bounded 2,080-row collect), eigensolve
    * on the driver: (eigenvalues desc, eigenvector rows, exact trace,
    * gram as doubles). */
  def eigen(s: SparkSession, dir: String): (Array[Double], Array[Array[Double]], Long, Array[Array[Double]]) = {
    val cells = gramCells(s, dir).collect()
    val g = Array.ofDim[Double](Dim, Dim)
    var trace = 0L
    cells.foreach { r =>
      val i = r.getAs[Int]("i"); val j = r.getAs[Int]("j"); val x = r.getAs[Long]("g")
      g(i)(j) = x.toDouble; g(j)(i) = x.toDouble
      if (i == j) trace += x
    }
    val (ev, vecs) = jacobiEigen(g)
    (ev, vecs, trace, g)
  }

  val defs: Seq[QueryDef] = Seq(

    // EMB2: the exact gram matrix, cell by cell — the one full-corpus
    // pass of the PCA pipeline under the strong hash gate. 2,080 rows at
    // any corpus size.
    QueryDef("emb2_gram_matrix",
      // the CAST to DOUBLE before the multiply matters: DuckDB keeps
      // FLOAT·INTEGER in float32 (losing the low bits Spark keeps after
      // its implicit float→double promotion) — the same class of drift
      // the cosSql fold guards with p::DOUBLE
      """WITH q AS (SELECT list_transform(embedding,
        |                    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
        |           FROM embeddings)
        |SELECT CAST(ra.i AS INT) AS i, CAST(rb.j AS INT) AS j,
        |       CAST(sum(q[ra.i + 1] * q[rb.j + 1]) AS BIGINT) AS g
        |FROM q, range(64) ra(i), range(64) rb(j)
        |WHERE ra.i <= rb.j
        |GROUP BY 1, 2 ORDER BY i, j""".stripMargin) { (s, dir) =>
      gramCells(s, dir)
        .select(col("i").cast("int"), col("j").cast("int"), col("g"))
        .orderBy("i", "j")
    },

    // EMB3: eigensolve + projection verdict. Every pin is a property a
    // broken pipeline would trip: the spectrum must come out sorted
    // (ok_monotone), each eigenpair must actually satisfy G·v = λ·v
    // (ok_resid, relative 1e-8), the basis must be orthonormal
    // (ok_ortho, 1e-9), the DISTRIBUTED projection variance must agree
    // with the DRIVER-side spectrum (ok_var, within 1% of total variance
    // — the slack covers the floor-quantization gap between the exact
    // integer gram and the raw float projection), and the top-8 subspace
    // must explain a minimum share of total variance (ok_cum ≥ 8%,
    // audited with headroom in PcaSpec). n_vecs rides along exactly.
    QueryDef("emb3_pca_verdict",
      """SELECT CAST(t.r AS INT) AS pc,
        |       (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_vecs,
        |       true AS ok_monotone, true AS ok_resid, true AS ok_ortho,
        |       true AS ok_var, true AS ok_cum
        |FROM range(8) t(r) ORDER BY pc""".stripMargin) { (s, dir) =>
      val (ev, vecs, trace, gd) = eigen(s, dir)
      val top = vecs.take(TopK)
      // driver-side checks over the fixed-size eigensystem
      val okMono = (0 until TopK).map(r => r == 0 || ev(r) <= ev(r - 1) + 1e-6 * math.abs(ev(0)))
      val okResid = (0 until TopK).map { r =>
        val vR = vecs(r)
        val gv = (0 until Dim).map(i => (0 until Dim).map(j => gd(i)(j) * vR(j)).sum)
        val num = math.sqrt((0 until Dim).map(i => { val d = gv(i) - ev(r) * vR(i); d * d }).sum)
        num <= 1e-8 * (math.abs(ev(r)) + 1e-12)
      }
      val okOrtho = {
        var worst = 0.0
        for (x <- 0 until TopK; y <- x until TopK) {
          val dot = (0 until Dim).map(d => top(x)(d) * top(y)(d)).sum
          worst = math.max(worst, math.abs(dot - (if (x == y) 1.0 else 0.0)))
        }
        worst <= 1e-9
      }
      // distributed projection: p_r = <embedding, v_r> as a narrow
      // zip_with/aggregate fold against broadcast literal axes; variance
      // per PC in one global aggregate
      val e = Tables.embeddings(s, dir)
      val projCols = (0 until TopK).map { r =>
        val axis = array(top(r).map(w => lit(w)): _*)
        aggregate(zip_with(col("embedding"), axis, (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as(s"p$r")
      }
      val agg = e.select(projCols: _*)
        .agg(count(lit(1)).as("n"),
          (0 until TopK).map(r => sum(col(s"p$r") * col(s"p$r")).as(s"v$r")): _*)
        .collect()(0)
      val nVecs = agg.getAs[Long]("n")
      val totalVar = trace.toDouble / (Q * Q)
      val okVar = (0 until TopK).map { r =>
        math.abs(agg.getAs[Double](s"v$r") - ev(r) / (Q * Q)) <= 0.01 * totalVar
      }
      val okCum = ev.take(TopK).sum / math.max(trace.toDouble, 1.0) >= 0.08
      val rows = (0 until TopK).map { r =>
        Row(r, nVecs, okMono(r), okResid(r), okOrtho, okVar(r), okCum)
      }
      val schema = StructType(Seq(
        StructField("pc", IntegerType, nullable = false),
        StructField("n_vecs", LongType, nullable = false),
        StructField("ok_monotone", BooleanType, nullable = false),
        StructField("ok_resid", BooleanType, nullable = false),
        StructField("ok_ortho", BooleanType, nullable = false),
        StructField("ok_var", BooleanType, nullable = false),
        StructField("ok_cum", BooleanType, nullable = false)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema)
    }
  )
}
