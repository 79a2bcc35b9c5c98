package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule restoring parquet pushdown for naive time filters
  * over the nanos-backed events table.
  *
  * `Tables.events` converts the raw int64 nanos column with
  * `timestamp_micros(ts div 1000)`; a filter written against the
  * converted column cannot reach the parquet reader (the comparison
  * sits above arithmetic, so `PushedFilters` stays empty and every
  * time-filtered query full-scans — the dominant cost at 100 TB).
  *
  * The conversion is monotone, so every conjunctive comparison with a
  * positive timestamp literal IMPLIES a comparison on the raw column
  * (with c = trunc(ns/1000), T > 0 in µs):
  *
  *   c ≥ T ⇒ ns ≥ 1000·T          c > T ⇒ ns ≥ 1000·(T+1)
  *   c < T ⇒ ns < 1000·T          c ≤ T ⇒ ns < 1000·(T+1)
  *   c = T ⇒ 1000·T ≤ ns < 1000·(T+1)
  *
  * The rule ADDS the implied raw-column conjunct and keeps the
  * original predicate — semantics are unchanged (each added term is
  * implied), but the plain `ts <op> literal` conjunct is exactly what
  * the file source strategy can push into the scan, where int64
  * row-group stats prune. Only top-level conjuncts are rewritten; a
  * comparison under OR/NOT implies nothing at the filter level.
  */
object PushTimestampNanosFilters extends Rule[LogicalPlan]
    with PredicateHelper {

  private val MaxMicros = Long.MaxValue / 1000 - 1

  /** timestamp_micros(raw div 1000) — the Tables.events conversion. */
  private object NanosToTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(raw, Literal(k, _), _))
          if k == 1000 && raw.dataType == LongType => Some(raw)
      case _ => None
    }
  }

  /** A positive timestamp literal (micros since epoch). */
  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: java.lang.Long, TimestampType) => Some(v)
      case _ => None
    }
  }

  private def ok(vMicros: Long): Boolean =
    vMicros > 0 && vMicros <= MaxMicros

  private def geNs(raw: Expression, vMicros: Long): Expression =
    GreaterThanOrEqual(raw, Literal(vMicros * 1000L, LongType))
  private def ltNs(raw: Expression, vMicros: Long): Expression =
    LessThan(raw, Literal(vMicros * 1000L, LongType))

  private def implied(term: Expression): Seq[Expression] = term match {
    case GreaterThanOrEqual(NanosToTs(raw), TsLit(v)) if ok(v) =>
      Seq(geNs(raw, v))
    case GreaterThan(NanosToTs(raw), TsLit(v)) if ok(v + 1) =>
      Seq(geNs(raw, v + 1))
    case LessThan(NanosToTs(raw), TsLit(v)) if ok(v) =>
      Seq(ltNs(raw, v))
    case LessThanOrEqual(NanosToTs(raw), TsLit(v)) if ok(v + 1) =>
      Seq(ltNs(raw, v + 1))
    case EqualTo(NanosToTs(raw), TsLit(v)) if ok(v + 1) =>
      Seq(geNs(raw, v), ltNs(raw, v + 1))
    // flipped operand order: T <op> c
    case GreaterThanOrEqual(TsLit(v), NanosToTs(raw)) if ok(v + 1) =>
      Seq(ltNs(raw, v + 1))                       // T ≥ c ⇔ c ≤ T
    case GreaterThan(TsLit(v), NanosToTs(raw)) if ok(v) =>
      Seq(ltNs(raw, v))                           // T > c ⇔ c < T
    case LessThan(TsLit(v), NanosToTs(raw)) if ok(v + 1) =>
      Seq(geNs(raw, v + 1))                       // T < c ⇔ c > T
    case LessThanOrEqual(TsLit(v), NanosToTs(raw)) if ok(v) =>
      Seq(geNs(raw, v))                           // T ≤ c ⇔ c ≥ T
    case EqualTo(TsLit(v), NanosToTs(raw)) if ok(v + 1) =>
      Seq(geNs(raw, v), ltNs(raw, v + 1))
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val terms = splitConjunctivePredicates(cond)
      val extra = terms.flatMap(implied)
        .filterNot(p => terms.exists(_.semanticEquals(p)))
        .distinct
      if (extra.isEmpty) f
      else Filter((terms ++ extra).reduce(And), child)
  }
}
