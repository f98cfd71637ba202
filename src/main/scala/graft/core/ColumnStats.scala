package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Per-file column statistics: min/max values for configured data columns,
  * collected once during the commit-stats job and persisted in each
  * [[WriteFileInfo]] — the manifest-resident equivalent of the reference's
  * column-stats metadata index (ref: hudi-common/.../metadata/
  * HoodieMetadataPayload.java COLUMN_STATS records + data skipping in
  * HoodieFileIndex.lookupCandidateFilesInMetadataTable,
  * hudi-spark-datasource/.../HoodieFileIndex.scala).
  *
  * Values are rendered to strings whose comparison semantics are recovered
  * TYPED at prune time (numbers through BigDecimal, strings through UTF-8
  * binary order — matching Spark's min/max ordering — timestamps through
  * epoch micros). Pruning is superset-sound: any file without stats for a
  * column, any unparseable value (NaN/Infinity), and any filter shape we
  * don't model keeps the file. Spark re-applies every filter above the
  * relation, so skipping here is a strict optimization.
  *
  * Granularity is the FILE SLICE: a slice is skipped only when NO file in
  * it (base or delta) can contain a matching value. Any output value of a
  * column is physically present in one of the slice's files, and tombstoned
  * rows only shrink the result — but HOW per-file ranges witness a
  * multi-column conjunction depends on the payload: whole-row-wins payloads
  * emit rows that exist whole in one file (per-file conjunction is sound),
  * while overwrite_non_defaults stitches columns across files (see
  * [[keepSlice]]'s `stitching` mode).
  */
object ColumnStats {

  /** Types whose min/max render to strings we can compare faithfully. */
  def supported(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case StringType | BooleanType | DateType | TimestampType => true
    case _ => false
  }

  /** Min/max aggregation expressions for one column, rendered for storage.
    * Timestamps go through `unix_micros` (ANSI-safe, exact at micro
    * precision); everything else through a plain string cast.
    */
  def statExprs(f: StructField): Seq[Column] = {
    def render(c: Column): Column = f.dataType match {
      case TimestampType => unix_micros(c).cast(StringType)
      case _             => c.cast(StringType)
    }
    Seq(render(min(col(f.name))), render(max(col(f.name))))
  }

  /** UTF-8 binary three-way compare — the ordering Spark's min/max on
    * strings uses (UTF8String), NOT java.lang.String's UTF-16 order.
    */
  def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private def toBigDec(v: Any): java.math.BigDecimal = v match {
    case b: Byte   => java.math.BigDecimal.valueOf(b.toLong)
    case s: Short  => java.math.BigDecimal.valueOf(s.toLong)
    case i: Int    => java.math.BigDecimal.valueOf(i.toLong)
    case l: Long   => java.math.BigDecimal.valueOf(l)
    case f: Float  => new java.math.BigDecimal(f.toString) // throws on NaN/Inf
    case d: Double => new java.math.BigDecimal(d.toString)
    case d: java.math.BigDecimal => d
    case d: scala.math.BigDecimal => d.bigDecimal
    case other => throw new IllegalArgumentException(s"not numeric: $other")
  }

  private def tsToMicros(v: Any): java.math.BigDecimal = v match {
    case t: java.sql.Timestamp =>
      // getTime carries millis; nanos carries the full sub-second part
      val millisFloor = t.getTime - (t.getTime % 1000 + 1000) % 1000
      new java.math.BigDecimal(millisFloor).movePointRight(3)
        .add(new java.math.BigDecimal(t.getNanos).movePointLeft(3))
    case i: java.time.Instant =>
      new java.math.BigDecimal(i.getEpochSecond).movePointRight(6)
        .add(java.math.BigDecimal.valueOf(i.getNano / 1000L))
    case other => throw new IllegalArgumentException(s"not a timestamp: $other")
  }

  /** Sign of (stat - v) under the column type's ordering; None when the
    * pair can't be compared faithfully (→ caller must not prune).
    */
  def compare(dt: DataType, stat: String, v: Any): Option[Int] =
    try {
      dt match {
        case StringType => v match {
          case s: String => Some(utf8Cmp(stat, s))
          case _         => None
        }
        case _: NumericType =>
          Some(new java.math.BigDecimal(stat).compareTo(toBigDec(v)))
        case BooleanType => v match {
          case b: Boolean => Some(stat.toBoolean.compareTo(b))
          case _          => None
        }
        case DateType =>
          // compare as epoch days: ISO strings sort chronologically only
          // inside years 0001-9999 (year 10000+ and negative years invert
          // a lexicographic compare), so parse both sides numerically
          val days = v match {
            case d: java.sql.Date       => d.toLocalDate.toEpochDay
            case d: java.time.LocalDate => d.toEpochDay
            case _                      => return None
          }
          Some(java.lang.Long.compare(
            java.time.LocalDate.parse(stat).toEpochDay, days))
        case TimestampType =>
          Some(new java.math.BigDecimal(stat).compareTo(tsToMicros(v)))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Resolves a filter attribute (logical name, analyzer-cased) to the
    * physical stats key and its data type; None = unknown column.
    */
  type Resolver = String => Option[(String, DataType)]

  /** True when file `f` might contain a row matching every filter. */
  def keepFile(filters: Seq[Filter], resolve: Resolver, f: WriteFileInfo): Boolean =
    filters.forall(keepOne(_, resolve, f))

  /** Slice-granular prune: keep the slice when ANY of its files might
    * contain a match (see the soundness note in the object doc).
    *
    * `stitching` = the payload can assemble one output row from COLUMNS of
    * different files in the slice (overwrite_non_defaults partial updates:
    * base {A=1,B=0} + delta {A=null,B=2} merges to {A=1,B=2}). Under
    * stitching the per-file conjunction is UNSOUND once deltas exist — for
    * `A=1 AND B=2` no single file witnesses both conjuncts, yet the merged
    * row matches. So with deltas + stitching each leaf predicate only needs
    * SOME file of the slice to satisfy it (And relaxes to independent
    * satisfiability — a superset — Or stays a union). Whole-row-wins
    * payloads and base-only slices keep the tighter per-file conjunction.
    */
  def keepSlice(
      filters: Seq[Filter], resolve: Resolver,
      stitching: Boolean = false): FileSlice => Boolean = {
    if (filters.isEmpty) return _ => true
    s => {
      val files = s.base.toSeq ++ s.deltas
      if (!stitching || s.deltas.isEmpty)
        files.exists(f => keepFile(filters, resolve, f))
      else
        filters.forall(keepAcross(_, resolve, files))
    }
  }

  /** Stitched-slice evaluation: And/Or recurse structurally, leaves need a
    * witness in SOME file. Sound because every column value of a stitched
    * output row is physically present in one of the slice's files.
    */
  private def keepAcross(
      flt: Filter, resolve: Resolver, files: Seq[WriteFileInfo]): Boolean =
    flt match {
      case And(l, r) => keepAcross(l, resolve, files) && keepAcross(r, resolve, files)
      case Or(l, r)  => keepAcross(l, resolve, files) || keepAcross(r, resolve, files)
      case leaf      => files.exists(f => keepOne(leaf, resolve, f))
    }

  private def statsOf(
      attr: String, resolve: Resolver, f: WriteFileInfo): Option[(DataType, String, String)] =
    for {
      (key, dt) <- resolve(attr)
      range <- f.colStats.get(key) if range.size == 2 && range.forall(_ != null)
    } yield (dt, range.head, range(1))

  private def nullsOf(attr: String, resolve: Resolver, f: WriteFileInfo): Option[Long] =
    resolve(attr).flatMap { case (key, _) => f.colNulls.get(key) }

  /** With no min/max recorded, a known all-null column still can't match
    * any value filter; anything else keeps the file.
    */
  private def noRangeKeep(attr: String, resolve: Resolver, f: WriteFileInfo): Boolean =
    !(f.records > 0 && nullsOf(attr, resolve, f).contains(f.records))

  private def mayContain(attr: String, v: Any, resolve: Resolver, f: WriteFileInfo): Boolean =
    statsOf(attr, resolve, f) match {
      case Some((dt, mn, mx)) =>
        (compare(dt, mn, v), compare(dt, mx, v)) match {
          case (Some(lo), Some(hi)) => lo <= 0 && hi >= 0
          case _                    => true
        }
      case None => noRangeKeep(attr, resolve, f)
    }

  /** `strict`: mx > v (for `>`); otherwise mx >= v (for `>=`). */
  private def upperMayPass(
      attr: String, v: Any, strict: Boolean, resolve: Resolver, f: WriteFileInfo): Boolean =
    statsOf(attr, resolve, f) match {
      case Some((dt, _, mx)) => compare(dt, mx, v) match {
        case Some(c) => if (strict) c > 0 else c >= 0
        case None    => true
      }
      case None => noRangeKeep(attr, resolve, f)
    }

  private def lowerMayPass(
      attr: String, v: Any, strict: Boolean, resolve: Resolver, f: WriteFileInfo): Boolean =
    statsOf(attr, resolve, f) match {
      case Some((dt, mn, _)) => compare(dt, mn, v) match {
        case Some(c) => if (strict) c < 0 else c <= 0
        case None    => true
      }
      case None => noRangeKeep(attr, resolve, f)
    }

  private def keepOne(flt: Filter, resolve: Resolver, f: WriteFileInfo): Boolean =
    flt match {
      case EqualTo(a, v) if v != null       => mayContain(a, v, resolve, f)
      case EqualNullSafe(a, v) if v != null => mayContain(a, v, resolve, f)
      case In(a, vs) =>
        val nonNull = vs.filter(_ != null)
        // an IN over only nulls matches nothing under SQL semantics
        nonNull.exists(v => mayContain(a, v, resolve, f))
      case GreaterThan(a, v) if v != null        => upperMayPass(a, v, strict = true, resolve, f)
      case GreaterThanOrEqual(a, v) if v != null => upperMayPass(a, v, strict = false, resolve, f)
      case LessThan(a, v) if v != null           => lowerMayPass(a, v, strict = true, resolve, f)
      case LessThanOrEqual(a, v) if v != null    => lowerMayPass(a, v, strict = false, resolve, f)
      case IsNull(a)    => nullsOf(a, resolve, f).forall(_ > 0)
      case IsNotNull(a) => nullsOf(a, resolve, f).forall(_ < f.records) || f.records == 0
      case And(l, r) => keepOne(l, resolve, f) && keepOne(r, resolve, f)
      case Or(l, r)  => keepOne(l, resolve, f) || keepOne(r, resolve, f)
      // Not / string matches / unknown shapes: min/max can't witness
      // them — never prune
      case _ => true
    }
}
