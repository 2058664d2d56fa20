package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, XxHash64Function}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** MinHash signature as ONE custom aggregate (the Catalyst tier between
  * scalar expressions and whole physical operators: a
  * TypedImperativeAggregate with an opaque typed buffer).
  *
  * `minhash_agg(g64, n)` folds a group's 64-bit shingle hashes into an
  * n-slot signature: slot i holds min over the group of
  * xxhash64(g64, i) — the same per-slot values as n separate
  * `min(xxhash64(col, lit(i)))` aggregate columns (MinHashAggSpec pins
  * slot-for-slot equality), but as a single aggregate:
  *
  *   - the buffer is exactly n longs per group at every stage (update,
  *     partial serialization, merge) — constant memory per document
  *     regardless of document size, the property the collect_list fold
  *     lacked;
  *   - partial aggregation applies (ObjectHashAggregate partial → shuffle
  *     of one n-long buffer per (group, partition) → final merge), same
  *     map-side-combine shape as built-in aggregates;
  *   - the plan carries ONE expression instead of an n-wide generated
  *     aggregate, so codegen size does not grow with n (the 64-column
  *     form generates 64 aggregate buffer fields and pays a
  *     noticeably larger janino compile on first run).
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT input, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // identical slot values to min(xxhash64(g64, lit(i))): Spark's
      // XxHash64 folds its children left to right, seeding each child's
      // hash with the previous result (seed 42)
      val h0 = XxHash64Function.hash(v, LongType, 42L)
      var i = 0
      while (i < numHashes) {
        val h = XxHash64Function.hash(i, IntegerType, h0)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numHashes)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numHashes)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** (identifier, info, builder) — consumed by both session-state
    * registration below and GraftExtensions.injectFunction. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("minhash_agg"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
      (cs: Seq[Expression]) => {
        val n = cs(1).eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"minhash_agg: n must be a literal int, got $other")
        }
        MinHashAgg(cs(0), n)
      })

  /** Register as `minhash_agg(col, n)` (n a literal int; idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      registration._1, registration._2, registration._3)
}
