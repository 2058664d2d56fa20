package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** File-level column statistics in the transaction-log manifest — the
  * Delta/Iceberg data-skipping core. Each staged parquet file's entry
  * carries (rows, and per top-level column: null count + typed min/max)
  * read from the file's OWN FOOTER at stage time: a metadata-only read,
  * never a second pass over the data. [[TxLog.readWhere]] then prunes
  * the manifest ENTRY LIST by interval logic before any relation is
  * built, so a selective predicate on a clustered column scans O(matching
  * files) — at 100 TB the difference between touching one day's files
  * and listing a million (partition pruning handles the partition
  * columns; THIS handles everything else a clustered layout orders by).
  *
  * Safety discipline (the only hard requirement of skipping): absence of
  * a statistic NEVER prunes — every degraded case (unsupported physical
  * type, NaN bounds, oversize or non-UTF-8-round-tripping strings,
  * unset parquet null counts, a column added after the file was written)
  * keeps the file, and the residual `.filter` evaluates the predicate
  * exactly on whatever survives. Cross-domain numeric comparisons widen
  * the literal's interval by ±1 so Spark's own lossy cast semantics
  * (long↔double near 2^53, decimal↔double) can never disagree with an
  * exact BigDecimal prune; timestamps only prune against timestamp
  * literals (never a bare long — Spark's long→timestamp cast is
  * SECONDS, footer micros, a 10⁶ unit trap), dates only against date
  * literals, strings compare by UTF-8 bytes exactly as UTF8String does.
  */
private[operators] object Stats {

  import TxLog.{ColStat, FileStats}

  // ------------------------------------------------------------------
  // Manifest encoding. One tab-field on the entry line:
  //   <rows>[/<nameEsc>:<kind>:<nulls>:<minEnc>:<maxEnc>]*
  // Hive path-escaping (the manifest's own value discipline) covers
  // every component: ':' '/' '=' tabs and newlines are all escaped, so
  // the separators are unambiguous. min/max prefix '=' marks presence
  // (distinguishing an absent bound from a genuine empty string).
  // ------------------------------------------------------------------

  private def esc(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(s)
  private def unesc(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(s)
  private def encOpt(v: Option[String]): String = v.map("=" + esc(_)).getOrElse("")
  private def decOpt(s: String): Option[String] =
    if (s.startsWith("=")) Some(unesc(s.drop(1))) else None

  def render(fs: FileStats): String =
    (fs.rows.toString +: fs.cols.toSeq.sortBy(_._1).map { case (n, c) =>
      s"${esc(n)}:${c.kind}:${c.nulls.map(_.toString).getOrElse("")}:" +
        s"${encOpt(c.min)}:${encOpt(c.max)}"
    }).mkString("/")

  def parse(s: String): Option[FileStats] = scala.util.Try {
    val comps = s.split("/", -1).toSeq
    val cols = comps.tail.map { c =>
      val f = c.split(":", 5)
      unesc(f(0)) -> ColStat(f(1).head,
        if (f(2).isEmpty) None else Some(f(2).toLong), decOpt(f(3)), decOpt(f(4)))
    }.toMap
    FileStats(comps.head.toLong, cols)
  }.toOption

  // ------------------------------------------------------------------
  // Footer extraction.
  // ------------------------------------------------------------------

  /** Max UTF-8 bytes for a recorded string bound — caps manifest entry
    * size on wide-text tables (a long `text` column records nulls only;
    * pruning on it is not a use case). */
  private val MaxStringBytes = 64

  /** Read one parquet file's footer into [[FileStats]]. Any column whose
    * physical/logical type is outside the supported prune domains — or
    * whose bounds fail the safety checks — degrades to a nulls-only stat
    * (kind 'n'); an unreadable footer degrades to no stats at all. */
  def fromFooter(file: java.io.File): Option[FileStats] = scala.util.Try {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.format.converter.ParquetMetadataConverter
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.setClassLoader(getClass.getClassLoader)
    val footer = ParquetFileReader.readFooter(conf,
      new org.apache.hadoop.fs.Path(file.toURI),
      ParquetMetadataConverter.NO_FILTER)
    val blocks = footer.getBlocks
    val rows = blocks.asScala.map(_.getRowCount).sum
    // per column: merge chunk statistics across row groups; any block
    // missing a piece degrades that piece for the whole file
    final case class Acc(kind: Char, var nulls: Option[Long],
        var lo: Option[Any], var hi: Option[Any], var ok: Boolean)
    val accs = scala.collection.mutable.LinkedHashMap.empty[String, Acc]
    blocks.asScala.foreach { b =>
      b.getColumns.asScala.foreach { cc =>
        val path = cc.getPath.toArray
        if (path.length == 1) {
          val name = path(0)
          val pt = cc.getPrimitiveType
          val ann = pt.getLogicalTypeAnnotation
          // (kind, decode-to-domain) for this physical column, or 'n'
          val kindAndConv: (Char, Any => Option[Any]) = pt.getPrimitiveTypeName match {
            case INT32 => ann match {
              case null => ('l', v => Some(BigDecimal(v.asInstanceOf[Int])))
              case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation if i.isSigned =>
                ('l', v => Some(BigDecimal(v.asInstanceOf[Int])))
              case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
                ('D', v => Some(v.asInstanceOf[Int].toLong))
              case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
                ('d', v => Some(BigDecimal(BigInt(v.asInstanceOf[Int]), d.getScale)))
              case _ => ('n', _ => None)
            }
            case INT64 => ann match {
              case null => ('l', v => Some(BigDecimal(v.asInstanceOf[Long])))
              case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation if i.isSigned =>
                ('l', v => Some(BigDecimal(v.asInstanceOf[Long])))
              case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
                  if t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS =>
                (if (t.isAdjustedToUTC) 't' else 'T',
                  v => Some(v.asInstanceOf[Long]))
              case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
                  if t.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS =>
                (if (t.isAdjustedToUTC) 't' else 'T',
                  v => Some(v.asInstanceOf[Long] * 1000L))
              case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
                ('d', v => Some(BigDecimal(BigInt(v.asInstanceOf[Long]), d.getScale)))
              case _ => ('n', _ => None)
            }
            case FLOAT => ('d', v => {
              val f = v.asInstanceOf[Float]
              if (f.isNaN) None else Some(BigDecimal(f.toDouble))
            })
            case DOUBLE => ('d', v => {
              val d = v.asInstanceOf[Double]
              if (d.isNaN) None else Some(BigDecimal(d))
            })
            case BOOLEAN => ('b', v => Some(v.asInstanceOf[Boolean]))
            case BINARY => ann match {
              case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation |
                   _: LogicalTypeAnnotation.EnumLogicalTypeAnnotation =>
                ('s', v => {
                  val bytes = v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
                  val str = new String(bytes, UTF_8)
                  // round-trip gate: a truncated/invalid UTF-8 bound that
                  // does not survive String decoding cannot be compared
                  // byte-exactly — drop it rather than risk a wrong prune
                  if (bytes.length <= MaxStringBytes &&
                      java.util.Arrays.equals(str.getBytes(UTF_8), bytes)) Some(str)
                  else None
                })
              case _ => ('n', _ => None)
            }
            case FIXED_LEN_BYTE_ARRAY => ann match {
              case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
                ('d', v => Some(BigDecimal(BigInt(
                  v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes),
                  d.getScale)))
              case _ => ('n', _ => None)
            }
            case _ => ('n', _ => None)
          }
          val (kind, conv) = kindAndConv
          val acc = accs.getOrElseUpdate(name,
            Acc(kind, Some(0L), None, None, ok = true))
          if (acc.kind != kind) acc.ok = false // mixed physical types: bail
          val st = cc.getStatistics
          if (st == null) { acc.ok = false; acc.nulls = None }
          else {
            // null counts: trusted only when every block sets them
            acc.nulls =
              if (st.isNumNullsSet) acc.nulls.map(_ + st.getNumNulls) else None
            // bounds: valid only if EVERY block has convertible min/max
            // (a block with no non-null values — or no stats at all —
            // degrades the file's bounds; slightly conservative, safe)
            if (acc.ok && st.hasNonNullValue) {
              (conv(st.genericGetMin), conv(st.genericGetMax)) match {
                case (Some(lo), Some(hi)) =>
                  acc.lo = Some(acc.lo.fold(lo)(p => minOf(kind, p, lo)))
                  acc.hi = Some(acc.hi.fold(hi)(p => maxOf(kind, p, hi)))
                case _ => acc.ok = false
              }
            } else acc.ok = false
          }
        }
      }
    }
    val cols = accs.map { case (name, a) =>
      if (a.ok && a.lo.isDefined)
        name -> ColStat(a.kind, a.nulls, a.lo.map(encodeVal(a.kind, _)),
          a.hi.map(encodeVal(a.kind, _)))
      else name -> ColStat('n', a.nulls, None, None)
    }.toMap
    FileStats(rows, cols)
  }.toOption

  private def minOf(kind: Char, a: Any, b: Any): Any =
    if (cmpDomain(kind, a, b) <= 0) a else b
  private def maxOf(kind: Char, a: Any, b: Any): Any =
    if (cmpDomain(kind, a, b) >= 0) a else b

  /** Compare two decoded domain values of the same kind. */
  private def cmpDomain(kind: Char, a: Any, b: Any): Int = kind match {
    case 'l' | 'd' => a.asInstanceOf[BigDecimal].compare(b.asInstanceOf[BigDecimal])
    case 'D' | 't' | 'T' => java.lang.Long.compare(
      a.asInstanceOf[Long], b.asInstanceOf[Long])
    case 's' => compareUtf8(a.asInstanceOf[String], b.asInstanceOf[String])
    case 'b' => java.lang.Boolean.compare(
      a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
  }

  /** UTF-8 unsigned-byte comparison — UTF8String's order (code-point
    * order), NOT java.lang.String's UTF-16 order, which disagrees above
    * the BMP. */
  private def compareUtf8(a: String, b: String): Int = {
    val x = a.getBytes(UTF_8); val y = b.getBytes(UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = java.lang.Integer.compare(x(i) & 0xFF, y(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  private def encodeVal(kind: Char, v: Any): String = kind match {
    case 'l' | 'd' => v.asInstanceOf[BigDecimal].bigDecimal.toString
    case 'D' | 't' | 'T' => v.asInstanceOf[Long].toString
    case 's' => v.asInstanceOf[String]
    case 'b' => v.toString
  }

  private def decodeVal(kind: Char, s: String): Any = kind match {
    case 'l' | 'd' => BigDecimal(new java.math.BigDecimal(s))
    case 'D' | 't' | 'T' => s.toLong
    case 's' => s
    case 'b' => s == "true"
  }

  import scala.jdk.CollectionConverters._

  /** Attach footer stats to freshly staged entries (parallel across
    * files — a local metadata read per file, bounded by footer size). */
  def attach(root: String, entries: Seq[TxLog.FileEntry]): Seq[TxLog.FileEntry] =
    entries.toVector.par2.map { e =>
      e.copy(stats = fromFooter(new java.io.File(s"$root/${e.path}")))
    }

  /** Tiny parallel-map shim (the parallel-collections module is not on
    * the classpath): java parallelStream over the vector. */
  private implicit final class Par2[A](private val v: Vector[A]) {
    def par2: ParOps[A] = new ParOps(v)
  }
  private final class ParOps[A](v: Vector[A]) {
    def map[B](f: A => B): Vector[B] = {
      val out = new java.util.concurrent.ConcurrentHashMap[Int, B]()
      java.util.stream.IntStream.range(0, v.size).parallel()
        .forEach(i => out.put(i, f(v(i))))
      Vector.tabulate(v.size)(out.get)
    }
  }

  // ------------------------------------------------------------------
  // Pruning: conjunct extraction + per-entry survival.
  // ------------------------------------------------------------------

  /** Column-DSL trees arrive as operator-NAMED UnresolvedFunctions
    * (Spark 4's Column builds `fn(">")`, not `GreaterThan` — only the
    * analyzer resolves them), so normalize those shapes into the typed
    * comparison nodes the recognizer matches. Purely for RECOGNITION:
    * execution always applies the caller's original predicate. */
  private def unwrap(e: Expression): Expression = e match {
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.size == 1 && !f.isDistinct =>
      val a = f.arguments.map(unwrap)
      (f.nameParts.head.toLowerCase, a) match {
        case (">", Seq(l, r)) => GreaterThan(l, r)
        case (">=", Seq(l, r)) => GreaterThanOrEqual(l, r)
        case ("<", Seq(l, r)) => LessThan(l, r)
        case ("<=", Seq(l, r)) => LessThanOrEqual(l, r)
        case ("=" | "==", Seq(l, r)) => EqualTo(l, r)
        case ("and", Seq(l, r)) => And(l, r)
        case ("in", l +: rest) if rest.nonEmpty => In(l, rest)
        case ("isnull", Seq(l)) => IsNull(l)
        case ("isnotnull", Seq(l)) => IsNotNull(l)
        case _ => e
      }
    case _ => e
  }

  /** Split an expression into its top-level AND conjuncts. */
  def splitConjuncts(e0: Expression): Seq[Expression] = unwrap(e0) match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** One recognized prunable conjunct: attribute name (last part,
    * matched case-insensitively), operator, literal(s). */
  private sealed trait Conj
  private final case class Cmp(name: String, op: String, lit: Literal) extends Conj
  private final case class InSet(name: String, lits: Seq[Literal]) extends Conj
  private final case class NullTest(name: String, isNull: Boolean) extends Conj

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.last)
    case a: AttributeReference => Some(a.name) // resolved (optimizer) trees
    case _ => None
  }

  private def recognize(e: Expression): Option[Conj] = e match {
    case EqualTo(a, l: Literal) => attrName(a).map(Cmp(_, "=", l))
    case EqualTo(l: Literal, a) => attrName(a).map(Cmp(_, "=", l))
    case GreaterThan(a, l: Literal) => attrName(a).map(Cmp(_, ">", l))
    case GreaterThan(l: Literal, a) => attrName(a).map(Cmp(_, "<", l))
    case GreaterThanOrEqual(a, l: Literal) => attrName(a).map(Cmp(_, ">=", l))
    case GreaterThanOrEqual(l: Literal, a) => attrName(a).map(Cmp(_, "<=", l))
    case LessThan(a, l: Literal) => attrName(a).map(Cmp(_, "<", l))
    case LessThan(l: Literal, a) => attrName(a).map(Cmp(_, ">", l))
    case LessThanOrEqual(a, l: Literal) => attrName(a).map(Cmp(_, "<=", l))
    case LessThanOrEqual(l: Literal, a) => attrName(a).map(Cmp(_, ">=", l))
    case In(a, lits) if lits.forall(_.isInstanceOf[Literal]) =>
      attrName(a).map(InSet(_, lits.map(_.asInstanceOf[Literal])))
    case IsNull(a) => attrName(a).map(NullTest(_, isNull = true))
    case IsNotNull(a) => attrName(a).map(NullTest(_, isNull = false))
    case _ => None
  }

  /** Convert a predicate literal into the column kind's compare domain,
    * with `exact = false` flagging cross-domain numeric comparisons that
    * must widen by ±1 (Spark compares them through lossy double casts;
    * an exact BigDecimal prune could disagree near 2^53). None = this
    * literal cannot prune this kind (including NULL literals — a
    * comparison to NULL matches nothing, but Spark's filter drops those
    * rows anyway and the conjunct shape is unusual; keep). */
  private def litToDomain(kind: Char, l: Literal): Option[(Any, Boolean)] = {
    if (l.value == null) return None
    val raw: Option[(Any, Boolean)] = (kind, l.dataType) match {
      case ('l', ByteType | ShortType | IntegerType | LongType) =>
        Some((BigDecimal(l.value.toString), true))
      case ('l', FloatType | DoubleType) =>
        val d = l.value.toString.toDouble
        if (d.isNaN || d.isInfinite) None else Some((BigDecimal(d), false))
      case ('l', _: DecimalType) =>
        Some((BigDecimal(l.value.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal), false))
      case ('d', ByteType | ShortType | IntegerType | LongType) =>
        Some((BigDecimal(l.value.toString), false))
      case ('d', FloatType | DoubleType) =>
        val d = l.value.toString.toDouble
        if (d.isNaN || d.isInfinite) None else Some((BigDecimal(d), false))
      case ('d', _: DecimalType) =>
        Some((BigDecimal(l.value.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal), false))
      case ('s', StringType) => Some((l.value.toString, true))
      case ('D', DateType) => Some((l.value.asInstanceOf[Int].toLong, true))
      case ('t', TimestampType) => Some((l.value.asInstanceOf[Long], true))
      case ('T', TimestampNTZType) => Some((l.value.asInstanceOf[Long], true))
      case ('b', BooleanType) => Some((l.value.asInstanceOf[Boolean], true))
      case _ => None
    }
    // Cross-domain numeric compares run through Spark's lossy double
    // cast, whose rounding error is half an ulp of the MAGNITUDE — ~1 at
    // 2^53 (what the ±1 widening covers) but ~512 at 2^62 and ~1024 near
    // Long.MaxValue. Beyond 2^53 a constant widening can wrongly prune a
    // file whose casted values would match (silent missing rows,
    // surviving delete victims), so such literals never prune at all.
    raw match {
      case Some((bd: BigDecimal, false)) if bd.abs >= InexactPruneCap => None
      case other => other
    }
  }

  /** 2^53 — the last magnitude at which a double is within ±1 of every
    * integer, i.e. the widest range where [[widenLo]]/[[widenHi]]'s ±1
    * covers the double-cast rounding error of an inexact compare. */
  private val InexactPruneCap = BigDecimal(2).pow(53)

  private def widenLo(kind: Char, v: Any): Any = kind match {
    case 'l' | 'd' => v.asInstanceOf[BigDecimal] - 1
    case _ => v
  }
  private def widenHi(kind: Char, v: Any): Any = kind match {
    case 'l' | 'd' => v.asInstanceOf[BigDecimal] + 1
    case _ => v
  }

  /** Could a file with stat `c` contain a row satisfying `name op lit`?
    * Absence of the needed bound keeps the file. */
  private def cmpSurvives(c: ColStat, op: String, l: Literal): Boolean =
    litToDomain(c.kind, l) match {
      case None => true
      case Some((v0, exact)) =>
        val (lo, hi) = if (exact) (v0, v0) else (widenLo(c.kind, v0), widenHi(c.kind, v0))
        def minV = c.min.map(decodeVal(c.kind, _))
        def maxV = c.max.map(decodeVal(c.kind, _))
        op match {
          case "=" => minV.forall(m => cmpDomain(c.kind, m, hi) <= 0) &&
            maxV.forall(m => cmpDomain(c.kind, m, lo) >= 0)
          case "<" => minV.forall(m => cmpDomain(c.kind, m, hi) < 0)
          case "<=" => minV.forall(m => cmpDomain(c.kind, m, hi) <= 0)
          case ">" => maxV.forall(m => cmpDomain(c.kind, m, lo) > 0)
          case ">=" => maxV.forall(m => cmpDomain(c.kind, m, lo) >= 0)
        }
    }

  /** Could the file described by (`rows`, `colOf`) contain a row
    * satisfying every conjunct? `colOf` resolves an attribute name to
    * its stat (physical-name lookup is the caller's job — partition
    * columns get synthetic point stats there). */
  def survives(rows: Option[Long], colOf: String => Option[ColStat],
      conjuncts: Seq[Expression]): Boolean =
    conjuncts.forall { e =>
      recognize(e) match {
        case None => true
        case Some(conj) =>
          val name = conj match {
            case Cmp(n, _, _) => n
            case InSet(n, _) => n
            case NullTest(n, _) => n
          }
          colOf(name) match {
            case None => true
            case Some(c) =>
              // a column that is entirely null cannot satisfy any
              // null-rejecting conjunct on it
              val allNull = (rows, c.nulls) match {
                case (Some(r), Some(n)) => r > 0 && n >= r
                case _ => false
              }
              conj match {
                case _: Cmp | _: InSet if allNull => false
                case Cmp(_, op, l) => cmpSurvives(c, op, l)
                case InSet(_, lits) => lits.exists(cmpSurvives(c, "=", _))
                case NullTest(_, true) => c.nulls.forall(_ > 0)
                case NullTest(_, false) => !allNull
              }
          }
      }
    }
}
