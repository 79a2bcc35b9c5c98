package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, TimestampType}

/** Optimizer rule restoring parquet pushdown for filters written
  * against a TRUNCATED timestamp.
  *
  * Dashboards and day-sliced jobs naturally write
  * `date_trunc('day', ts) = DATE'2024-01-10'` — but the comparison
  * sits above the truncation expression, so nothing reaches the
  * parquet reader (`PushedFilters` stays empty) and every day slice
  * full-scans: the dominant cost at 100 TB. On a day-partitioned
  * production table the same rewrite is what unlocks partition
  * PRUNING, not just row-group stats.
  *
  * date_trunc is monotone non-decreasing and idempotent onto
  * unit-aligned values, so every top-level conjunctive comparison
  * with a literal IMPLIES a raw-column range (floor(·) = truncation
  * to the unit, c = trunc(ts), T the literal, u one unit):
  *
  *   c = T  ⇒ ts ≥ T ∧ ts < T+u   (when T is unit-aligned;
  *                                  unaligned T ⇒ predicate is
  *                                  constant-false — left untouched)
  *   c ≥ T  ⇒ ts ≥ ceil(T)        c > T ⇒ ts ≥ floor(T)+u
  *   c < T  ⇒ ts < ceil(T)        c ≤ T ⇒ ts < floor(T)+u
  *
  * The rule ADDS the implied conjunct and keeps the original
  * predicate — semantics are unchanged (each added term is implied),
  * but the plain `ts <op> literal` conjunct is exactly what the file
  * source strategy pushes into the scan. Only top-level conjuncts
  * are rewritten; a comparison under OR/NOT implies nothing at the
  * filter level. Units: hour/day/month/year (week excluded — its
  * alignment anchor differs across engines; adding it is mechanical).
  *
  * All arithmetic runs on the literal at PLAN time in UTC µs — the
  * engine's session convention (every harness session pins
  * spark.sql.session.timeZone=UTC; the rule no-ops otherwise, see
  * guard below) — so the added conjunct is a foldable comparison the
  * scan can take as-is.
  */
object PushDateTruncFilters extends Rule[LogicalPlan]
    with PredicateHelper {

  private val MicrosPerHour = 3600L * 1000000L

  /** date_trunc(unit, ts) with a literal unit this rule understands.
    * Spark parses `date_trunc(fmt, ts)` to TruncTimestamp(fmt, ts). */
  private object TruncOf {
    def unapply(e: Expression): Option[(String, Expression)] = e match {
      case TruncTimestamp(Literal(u, StringType), t, _)
          if t.dataType == TimestampType && u != null =>
        val unit = u.toString.toLowerCase(java.util.Locale.ROOT)
        if (Set("hour", "day", "month", "year")(unit)) Some((unit, t))
        else None
      case _ => None
    }
  }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: java.lang.Long, TimestampType) => Some(v)
      case _ => None
    }
  }

  private def utc = java.time.ZoneOffset.UTC

  /** Truncate a µs-epoch instant down to the unit (UTC). */
  private def floorTo(unit: String, micros: Long): Long = {
    if (unit == "hour") return Math.floorDiv(micros, MicrosPerHour) *
      MicrosPerHour
    val dt = java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L)).atZone(utc).toLocalDate
    val d = unit match {
      case "day"   => dt
      case "month" => dt.withDayOfMonth(1)
      case "year"  => dt.withDayOfYear(1)
    }
    d.atStartOfDay(utc).toInstant.getEpochSecond * 1000000L
  }

  /** The next unit boundary at or above the instant. */
  private def ceilTo(unit: String, micros: Long): Long = {
    val f = floorTo(unit, micros)
    if (f == micros) f else nextUnit(unit, f)
  }

  /** floor + one unit (calendar-aware for month/year). */
  private def nextUnit(unit: String, alignedMicros: Long): Long = unit match {
    case "hour" => alignedMicros + MicrosPerHour
    case _ =>
      val d = java.time.Instant.ofEpochSecond(alignedMicros / 1000000L)
        .atZone(utc).toLocalDate
      val n = unit match {
        case "day"   => d.plusDays(1)
        case "month" => d.plusMonths(1)
        case "year"  => d.plusYears(1)
      }
      n.atStartOfDay(utc).toInstant.getEpochSecond * 1000000L
  }

  private def ge(ts: Expression, v: Long): Expression =
    GreaterThanOrEqual(ts, Literal(v, TimestampType))
  private def lt(ts: Expression, v: Long): Expression =
    LessThan(ts, Literal(v, TimestampType))

  private def implied(term: Expression): Seq[Expression] = term match {
    case EqualTo(TruncOf(u, ts), TsLit(v)) if floorTo(u, v) == v =>
      Seq(ge(ts, v), lt(ts, nextUnit(u, v)))
    case EqualTo(TsLit(v), TruncOf(u, ts)) if floorTo(u, v) == v =>
      Seq(ge(ts, v), lt(ts, nextUnit(u, v)))
    case GreaterThanOrEqual(TruncOf(u, ts), TsLit(v)) =>
      Seq(ge(ts, ceilTo(u, v)))
    case GreaterThan(TruncOf(u, ts), TsLit(v)) =>
      Seq(ge(ts, nextUnit(u, floorTo(u, v))))
    case LessThan(TruncOf(u, ts), TsLit(v)) =>
      Seq(lt(ts, ceilTo(u, v)))
    case LessThanOrEqual(TruncOf(u, ts), TsLit(v)) =>
      Seq(lt(ts, nextUnit(u, floorTo(u, v))))
    // flipped operand order: T <op> trunc(ts)
    case GreaterThanOrEqual(TsLit(v), TruncOf(u, ts)) =>
      Seq(lt(ts, nextUnit(u, floorTo(u, v))))    // T ≥ c ⇔ c ≤ T
    case GreaterThan(TsLit(v), TruncOf(u, ts)) =>
      Seq(lt(ts, ceilTo(u, v)))                  // T > c ⇔ c < T
    case LessThan(TsLit(v), TruncOf(u, ts)) =>
      Seq(ge(ts, nextUnit(u, floorTo(u, v))))    // T < c ⇔ c > T
    case LessThanOrEqual(TsLit(v), TruncOf(u, ts)) =>
      Seq(ge(ts, ceilTo(u, v)))                  // T ≤ c ⇔ c ≥ T
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // the literal arithmetic above assumes UTC truncation semantics —
    // no-op under any other session timezone rather than risk a
    // boundary shift (the harness convention pins UTC everywhere)
    if (conf.sessionLocalTimeZone != "UTC") return plan
    plan.transform {
      case f @ Filter(cond, child) =>
        val terms = splitConjunctivePredicates(cond)
        val extra = terms.flatMap(implied)
          .filterNot(p => terms.exists(_.semanticEquals(p)))
          .distinct
        if (extra.isEmpty) f
        else Filter((terms ++ extra).reduce(And), child)
    }
  }
}
