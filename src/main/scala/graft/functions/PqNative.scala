package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd kernels for the vector-quantization tier
  * (graft.operators.{Similarity, Quantization}).
  *
  * The pure-DataFrame formulations of centroid assignment and PQ encoding
  * are K-way broadcast joins plus grouped argmin aggregates: correct, but
  * they inflate n rows to n·K (or n·M·K) rows, pay two shuffles, and
  * evaluate the inner distance as an interpreted higher-order fold. Each
  * kernel here fuses the whole candidate scan into ONE loop over a
  * FLATTENED codebook array (row-major, index arithmetic instead of
  * nested ArrayData), so quantization becomes a narrow per-row map that
  * stays inside WholeStageCodegen — no join, no shuffle, no per-element
  * virtual calls. The codebook column is attached to every row via a
  * one-row broadcast join, so the pipeline stays lazy and distributed.
  *
  * Numeric contract: accumulation order matches the DataFrame-algebra
  * forms (elements left to right, floats widened to double), and ties
  * resolve to the LOWEST candidate id (strict `>` / `<` keeps the first
  * winner) — PqNativeSpec pins each kernel against its algebraic twin.
  */
object PqNative {

  /** argmax_c cosine(vec, cents[c]) over a flat row-major centroid array
    * (k = cents.length / vec.length). Returns the winning index as INT;
    * ties keep the lowest index. */
  case class NearestCentroid(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "nearest_centroid"

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<double>), " +
            s"got ${l.simpleString} and ${r.simpleString}")
      }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val cs = b.asInstanceOf[ArrayData]
      val dim = v.numElements()
      val k = cs.numElements() / dim
      var vn = 0.0
      var i = 0
      while (i < dim) { val x = v.getFloat(i).toDouble; vn += x * x; i += 1 }
      var best = -1; var bestSim = Double.NegativeInfinity
      var c = 0
      while (c < k) {
        var dot = 0.0; var cn = 0.0
        var d = 0
        while (d < dim) {
          val x = v.getFloat(d).toDouble
          val y = cs.getDouble(c * dim + d)
          dot += x * y; cn += y * y; d += 1
        }
        val sim = dot / (math.sqrt(vn) * math.sqrt(cn))
        if (sim > bestSim) { bestSim = sim; best = c }
        c += 1
      }
      best
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val dim = ctx.freshName("dim"); val k = ctx.freshName("k")
        val vn = ctx.freshName("vn"); val best = ctx.freshName("best")
        val bestSim = ctx.freshName("bestSim"); val c = ctx.freshName("c")
        val dot = ctx.freshName("dot"); val cn = ctx.freshName("cn")
        val d = ctx.freshName("d"); val x = ctx.freshName("x")
        val y = ctx.freshName("y"); val sim = ctx.freshName("sim")
        s"""
           |int $dim = $a.numElements();
           |int $k = $b.numElements() / $dim;
           |double $vn = 0.0;
           |for (int $d = 0; $d < $dim; $d++) {
           |  double $x = (double) $a.getFloat($d); $vn += $x * $x;
           |}
           |int $best = -1; double $bestSim = Double.NEGATIVE_INFINITY;
           |for (int $c = 0; $c < $k; $c++) {
           |  double $dot = 0.0; double $cn = 0.0;
           |  for (int $d = 0; $d < $dim; $d++) {
           |    double $x = (double) $a.getFloat($d);
           |    double $y = $b.getDouble($c * $dim + $d);
           |    $dot += $x * $y; $cn += $y * $y;
           |  }
           |  double $sim = $dot / (java.lang.Math.sqrt($vn) * java.lang.Math.sqrt($cn));
           |  if ($sim > $bestSim) { $bestSim = $sim; $best = $c; }
           |}
           |${ev.value} = $best;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Top-`r` centroid indices by cosine over the same flat row-major
    * centroid array as [[NearestCentroid]], in rank order (element 0 ==
    * nearest_centroid; ties keep the lowest index at every rank). One
    * fused pass with an r-slot insertion buffer — r is a small constant
    * (the IVF multi-assignment replication factor), so the buffer is
    * register-sized. Returns min(r, k) indices. Args:
    * (vec array<float>, cents array<double>, r INT). */
  case class TopCentroids(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "top_centroids"

    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (ArrayType(FloatType, _), ArrayType(DoubleType, _), IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<double>, int), got $t")
      }

    override def nullSafeEval(a: Any, b: Any, rv: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val cs = b.asInstanceOf[ArrayData]
      val dim = v.numElements()
      val k = cs.numElements() / dim
      val r = math.min(rv.asInstanceOf[Int], k)
      var vn = 0.0
      var i = 0
      while (i < dim) { val x = v.getFloat(i).toDouble; vn += x * x; i += 1 }
      val bs = Array.fill(r)(Double.NegativeInfinity)
      val bi = new Array[Int](r)
      var c = 0
      while (c < k) {
        var dot = 0.0; var cn = 0.0
        var d = 0
        while (d < dim) {
          val x = v.getFloat(d).toDouble
          val y = cs.getDouble(c * dim + d)
          dot += x * y; cn += y * y; d += 1
        }
        val sim = dot / (math.sqrt(vn) * math.sqrt(cn))
        var p = r
        while (p > 0 && sim > bs(p - 1)) p -= 1
        if (p < r) {
          var j = r - 1
          while (j > p) { bs(j) = bs(j - 1); bi(j) = bi(j - 1); j -= 1 }
          bs(p) = sim; bi(p) = c
        }
        c += 1
      }
      new GenericArrayData(bi)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b, rv) => {
        val dim = ctx.freshName("dim"); val k = ctx.freshName("k")
        val r = ctx.freshName("r"); val vn = ctx.freshName("vn")
        val bs = ctx.freshName("bs"); val bi = ctx.freshName("bi")
        val c = ctx.freshName("c"); val dot = ctx.freshName("dot")
        val cn = ctx.freshName("cn"); val d = ctx.freshName("d")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        val sim = ctx.freshName("sim"); val p = ctx.freshName("p")
        val j = ctx.freshName("j")
        s"""
           |int $dim = $a.numElements();
           |int $k = $b.numElements() / $dim;
           |int $r = java.lang.Math.min($rv, $k);
           |double $vn = 0.0;
           |for (int $d = 0; $d < $dim; $d++) {
           |  double $x = (double) $a.getFloat($d); $vn += $x * $x;
           |}
           |double[] $bs = new double[$r];
           |int[] $bi = new int[$r];
           |java.util.Arrays.fill($bs, Double.NEGATIVE_INFINITY);
           |for (int $c = 0; $c < $k; $c++) {
           |  double $dot = 0.0; double $cn = 0.0;
           |  for (int $d = 0; $d < $dim; $d++) {
           |    double $x = (double) $a.getFloat($d);
           |    double $y = $b.getDouble($c * $dim + $d);
           |    $dot += $x * $y; $cn += $y * $y;
           |  }
           |  double $sim = $dot / (java.lang.Math.sqrt($vn) * java.lang.Math.sqrt($cn));
           |  int $p = $r;
           |  while ($p > 0 && $sim > $bs[$p - 1]) $p--;
           |  if ($p < $r) {
           |    for (int $j = $r - 1; $j > $p; $j--) { $bs[$j] = $bs[$j - 1]; $bi[$j] = $bi[$j - 1]; }
           |    $bs[$p] = $sim; $bi[$p] = $c;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bi);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(f: Expression,
        sec: Expression, t: Expression): Expression =
      copy(first = f, second = sec, third = t)
  }

  /** PQ-encode a (residual) vector against flat row-major codebooks
    * (books[(sub*k + c)*subDim + d]): per subspace, the L2-nearest entry's
    * 4-bit code, all M codes packed little-endian into one BIGINT. Ties
    * keep the lowest code. Args: (u array<double>, books array<double>,
    * m INT, k INT). subDim = u.length / m. */
  case class PqEncode(first: Expression, second: Expression,
      third: Expression, fourth: Expression) extends QuaternaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "pq_encode"

    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
            IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<double>, int, int), got $t")
      }

    override def nullSafeEval(a: Any, b: Any, mv: Any, kv: Any): Any = {
      val u = a.asInstanceOf[ArrayData]
      val books = b.asInstanceOf[ArrayData]
      val m = mv.asInstanceOf[Int]; val k = kv.asInstanceOf[Int]
      val subDim = u.numElements() / m
      var codes = 0L
      var s = 0
      while (s < m) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dist = 0.0
          var d = 0
          while (d < subDim) {
            val diff = u.getDouble(s * subDim + d) -
              books.getDouble((s * k + c) * subDim + d)
            dist += diff * diff; d += 1
          }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        codes |= best.toLong << (s * 4)
        s += 1
      }
      codes
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b, mv, kv) => {
        val subDim = ctx.freshName("subDim"); val codes = ctx.freshName("codes")
        val s = ctx.freshName("s"); val best = ctx.freshName("best")
        val bestD = ctx.freshName("bestD"); val c = ctx.freshName("c")
        val dist = ctx.freshName("dist"); val d = ctx.freshName("d")
        val diff = ctx.freshName("diff")
        s"""
           |int $subDim = $a.numElements() / $mv;
           |long $codes = 0L;
           |for (int $s = 0; $s < $mv; $s++) {
           |  int $best = 0; double $bestD = Double.MAX_VALUE;
           |  for (int $c = 0; $c < $kv; $c++) {
           |    double $dist = 0.0;
           |    for (int $d = 0; $d < $subDim; $d++) {
           |      double $diff = $a.getDouble($s * $subDim + $d)
           |        - $b.getDouble(($s * $kv + $c) * $subDim + $d);
           |      $dist += $diff * $diff;
           |    }
           |    if ($dist < $bestD) { $bestD = $dist; $best = $c; }
           |  }
           |  $codes |= ((long) $best) << ($s * 4);
           |}
           |${ev.value} = $codes;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(f: Expression, sec: Expression,
        t: Expression, fo: Expression): Expression =
      copy(first = f, second = sec, third = t, fourth = fo)
  }

  /** ADC score from packed codes: Σ_s table[s*k + code_s], table flat
    * row-major per (sub, code). Args: (codes BIGINT, table array<double>,
    * m INT, k INT). */
  case class PqAdc(first: Expression, second: Expression,
      third: Expression, fourth: Expression) extends QuaternaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc"

    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
        case (LongType, ArrayType(DoubleType, _), IntegerType, IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (bigint, array<double>, int, int), got $t")
      }

    override def nullSafeEval(a: Any, b: Any, mv: Any, kv: Any): Any = {
      val codes = a.asInstanceOf[Long]
      val table = b.asInstanceOf[ArrayData]
      val m = mv.asInstanceOf[Int]; val k = kv.asInstanceOf[Int]
      var acc = 0.0
      var s = 0
      while (s < m) {
        acc += table.getDouble(s * k + ((codes >> (s * 4)) & (k - 1)).toInt)
        s += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b, mv, kv) => {
        val acc = ctx.freshName("acc"); val s = ctx.freshName("s")
        s"""
           |double $acc = 0.0;
           |for (int $s = 0; $s < $mv; $s++) {
           |  $acc += $b.getDouble($s * $kv + (int) (($a >> ($s * 4)) & ($kv - 1)));
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(f: Expression, sec: Expression,
        t: Expression, fo: Expression): Expression =
      copy(first = f, second = sec, third = t, fourth = fo)
  }

  /** (identifier, info, builder) triples — consumed by both session-state
    * registration below and GraftExtensions.injectFunction. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq[(String, Class[_], Seq[Expression] => Expression)](
      ("nearest_centroid", classOf[NearestCentroid],
        cs => NearestCentroid(cs(0), cs(1))),
      ("top_centroids", classOf[TopCentroids],
        cs => TopCentroids(cs(0), cs(1), cs(2))),
      ("pq_encode", classOf[PqEncode],
        cs => PqEncode(cs(0), cs(1), cs(2), cs(3))),
      ("pq_adc", classOf[PqAdc],
        cs => PqAdc(cs(0), cs(1), cs(2), cs(3)))
    ).map { case (name, clazz, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)
    }

  /** Register all kernels into the session function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
