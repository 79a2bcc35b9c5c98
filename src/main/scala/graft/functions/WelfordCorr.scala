package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Streaming (co)variance state in Welford/Chan form: counts, means,
  * and CENTERED second moments. Keeping moments centered is what
  * makes the state numerically stable (no catastrophic cancellation
  * of `Σxy − n·x̄·ȳ` at large magnitudes) AND mergeable: two partial
  * states combine exactly via the pairwise-update formulas of Chan,
  * Golub & LeVeque (1983), so Spark can reduce per-partition partial
  * aggregates map-side and merge them in any grouping/order —
  * WelfordCorrSpec asserts merge associativity to 1 ulp-scale
  * tolerance, the property the map-side combine rests on.
  */
final case class CorrState(n: Long, mx: Double, my: Double,
                           m2x: Double, m2y: Double, cxy: Double)

/** Final block: Pearson r, sample covariance, pair count. Options so
  * degenerate groups (n < 2, zero variance) surface as SQL NULLs —
  * matching the built-in `corr` / DuckDB's NULL contract. */
final case class CorrResult(r: Option[Double], cov_samp: Option[Double],
                            n: Long)

/** A2's correlation re-implemented as the one §2.10 shape the suite
  * lacked: a custom TYPED `Aggregator` registered as a UDAF — the
  * extension point for aggregation logic Spark has no built-in for
  * (the built-in `corr` here is deliberately reimplemented so the
  * result is oracle-checkable against BOTH DuckDB and A2).
  *
  * Scale: an Aggregator declares `merge`, so Catalyst plans it like
  * any algebraic aggregate — partial states reduce inside each map
  * task and only the 48-byte state shuffles per group, never rows.
  * Ref anchor: the per-config `pearsonr` of
  * `/root/reference/scripts/05_lag_analysis.py:141-198`.
  */
object WelfordCorr extends Aggregator[(Double, Double), CorrState, CorrResult] {

  override def zero: CorrState = CorrState(0L, 0.0, 0.0, 0.0, 0.0, 0.0)

  override def reduce(s: CorrState, xy: (Double, Double)): CorrState = {
    val (x, y) = xy
    val n = s.n + 1
    val dx = x - s.mx
    val dy = y - s.my
    val mx = s.mx + dx / n
    val my = s.my + dy / n
    // update uses dx·(x − mx') — the one-pass Welford cross term
    CorrState(n, mx, my,
      s.m2x + dx * (x - mx),
      s.m2y + dy * (y - my),
      s.cxy + dx * (y - my))
  }

  override def merge(a: CorrState, b: CorrState): CorrState = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val dx = b.mx - a.mx
      val dy = b.my - a.my
      val f = a.n.toDouble * b.n / n
      CorrState(n,
        a.mx + dx * b.n / n,
        a.my + dy * b.n / n,
        a.m2x + b.m2x + dx * dx * f,
        a.m2y + b.m2y + dy * dy * f,
        a.cxy + b.cxy + dx * dy * f)
    }
  }

  override def finish(s: CorrState): CorrResult = {
    val cov = if (s.n < 2) None else Some(s.cxy / (s.n - 1))
    val denom = math.sqrt(s.m2x) * math.sqrt(s.m2y)
    val r = if (s.n < 2 || denom == 0.0) None else Some(s.cxy / denom)
    CorrResult(r, cov, s.n)
  }

  override def bufferEncoder: Encoder[CorrState] = Encoders.product[CorrState]
  override def outputEncoder: Encoder[CorrResult] = Encoders.product[CorrResult]

  /** Column form for DataFrame use: `welford(col(x), col(y))`. */
  private lazy val asUdf = udaf(this)
  def welford(x: Column, y: Column): Column = asUdf(x, y)
}
