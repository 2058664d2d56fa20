package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Catalyst extension surface (SURVEY §4.3 path (c): LogicalPlan rule
  * registered through SparkSessionExtensions — the mechanism a library
  * uses to teach Spark's optimizer new tricks without forking it).
  *
  * Injected rule: [[BucketizeRangeJoin]]. Spark plans a pure inequality
  * join (`point >= lo AND point < hi`, no equi-key) as a broadcast
  * nested-loop join — O(n·m) comparisons, the classic 100 TB cliff. The
  * rule rewrites the logical join into the bucketized form the
  * RangeJoin operator builds by hand (measured 65× on the bench): each
  * interval explodes to the fixed-width buckets it overlaps, the point
  * side maps to its bucket, and the join becomes hash-partitioned
  * equality on bucket id with the original predicate kept as the exact
  * filter. Same result set, shuffle-partitioned plan.
  *
  * Usage:
  *   spark.sql.extensions=graft.plans.GraftExtensions   (session config)
  * or for an existing session:
  *   spark.experimental.extraOptimizations ++= Seq(BucketizeRangeJoin)
  *
  * Bucket width: spark.graft.range.bucketWidth (default 1000.0) — set to
  * roughly the median interval width.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BucketizeRangeJoin)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    // native transaction-log relations: `FROM txlog.`<root>`` (plus
    // Spark's OWN `VERSION AS OF` / `TIMESTAMP AS OF` time-travel
    // syntax) resolves through TxLog's pinned-manifest read — plain
    // `spark.sql` on an extension-built session, no TxSql rewrite layer
    ext.injectResolutionRule(session => new TxLogRelationRule(session))
    // the native function library: a session built with these extensions
    // resolves cosine_native / minhash_agg / nearest_centroid / pq_encode
    // / pq_adc in SQL without any per-session register() call
    (graft.functions.CosineNative.registration +:
      graft.functions.MinHashAgg.registration +:
      graft.functions.PqNative.registrations)
      .foreach(ext.injectFunction)
  }
}

/** Analyzer rule resolving `txlog.`<root>`` table references to the
  * transaction log's pinned-manifest read ([[graft.operators.TxLog]]).
  * Spark's parser already understands the time-travel suffix — `FROM t
  * VERSION AS OF 3` / `TIMESTAMP AS OF <epochMs>` arrives here as a
  * [[org.apache.spark.sql.catalyst.analysis.RelationTimeTravel]] node —
  * so the rule only has to pin the version and splice in the analyzed
  * read plan: snapshot isolation, schema pin, partition re-attach and
  * column mapping all come from the one TxLog.read path (no second
  * implementation to diverge). SELECT-side only by design: DML statements
  * (DELETE/UPDATE/MERGE/...) parse to v2 commands that demand a V2
  * catalog table; they go through the statement frontend
  * ([[graft.operators.SqlSurface.TxSql]]) instead. */
class TxLogRelationRule(session: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
  import graft.operators.TxLog

  private def isTxLog(u: UnresolvedRelation): Boolean =
    u.multipartIdentifier.length == 2 &&
      u.multipartIdentifier.head.equalsIgnoreCase("txlog")

  private def readPlan(root: String, version: Long): LogicalPlan =
    TxLog.read(session, root, version).queryExecution.analyzed

  private def versionFor(root: String, ts: Option[Expression],
      ver: Option[String]): Long =
    ver.map(_.toLong).orElse(ts.map { e =>
      val epochMs = e match {
        case Literal(v: Long, LongType) => v
        case Literal(v: Int, _) => v.toLong
        case Literal(s, _) if s != null && s.toString.forall(_.isDigit) =>
          s.toString.toLong
        case other => throw new IllegalArgumentException(
          s"txlog TIMESTAMP AS OF expects an epoch-millis literal, got: $other")
      }
      TxLog.versionAt(root, epochMs).getOrElse(throw new IllegalArgumentException(
        s"txlog $root has no version published at or before $epochMs"))
    }).getOrElse(-1L)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case RelationTimeTravel(u: UnresolvedRelation, ts, ver) if isTxLog(u) =>
      val root = u.multipartIdentifier(1)
      readPlan(root, versionFor(root, ts, ver))
    case u: UnresolvedRelation if isTxLog(u) =>
      readPlan(u.multipartIdentifier(1), -1L)
  }
}

object BucketizeRangeJoin extends Rule[LogicalPlan] {

  private def width: Double =
    SQLConf.get.getConfString("spark.graft.range.bucketWidth", "1000.0").toDouble

  /** floor(e / width) as BIGINT. */
  private def bucketOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // conservative match: inner join whose ENTIRE condition is
    // p >= lo AND p < hi with p from one side and both bounds from the
    // other, all DoubleType. (After this fires the condition gains an
    // equality conjunct, so the rewrite can never re-match itself.)
    case j @ Join(left, right, Inner,
        Some(And(GreaterThanOrEqual(p, lo), LessThan(p2, hi))), hint)
        if p.semanticEquals(p2) &&
          Seq(p, lo, hi).forall(_.dataType == DoubleType) &&
          p.references.subsetOf(left.outputSet) &&
          lo.references.subsetOf(right.outputSet) &&
          hi.references.subsetOf(right.outputSet) &&
          p.deterministic && lo.deterministic && hi.deterministic =>
      val w = width
      // p's bucket on the probe side
      val pb = Alias(bucketOf(p, w), "__graft_pb")()
      val leftB = Project(left.output :+ pb, left)
      // interval side: degenerate ranges (hi <= lo) match nothing and
      // would make the bucket sequence descend — drop them first. The
      // upper bound uses floor(hi/w) directly: on an exact boundary that
      // only ADDS an empty candidate bucket (exclusive endpoint), which
      // the exact predicate below filters out.
      val guarded = Filter(And(And(IsNotNull(lo), IsNotNull(hi)),
        GreaterThan(hi, lo)), right)
      val bAttr = AttributeReference("__graft_b", LongType, nullable = false)()
      val gen = Generate(
        // Sequence is TimeZoneAware even for integral sequences — an empty
        // timeZoneId leaves the optimized plan UNRESOLVED and fails
        // Spark's rule-batch plan validation
        Explode(Sequence(bucketOf(lo, w), bucketOf(hi, w),
          Some(Literal(1L)), Some(SQLConf.get.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bAttr), child = guarded)
      val cond = And(EqualTo(pb.toAttribute, bAttr), j.condition.get)
      Project(j.output, Join(leftB, gen, Inner, Some(cond), hint))
  }
}
