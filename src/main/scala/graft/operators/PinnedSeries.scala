package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine CLOSED-FORM p-value chains — the round-14 burn-down of
  * the rows-only p-value twins.
  *
  * The quadrature/continued-fraction kernels ([[graft.functions.StudentT]])
  * run data-dependent iteration counts, so a DuckDB oracle cannot
  * replay them. But the two distribution families the χ²/normal twins
  * actually need have EXACT finite forms:
  *
  *  - normal two-sided tail: p = erfc(|z|/√2), with erf's Taylor
  *    series Σ (−1)ⁿ xⁿ⁺½ⁿ/(n!(2n+1)) truncated at [[ErfTerms]] —
  *    convergent and numerically sound for x < [[ErfCut]]; beyond the
  *    cut the true tail is < 5e-7, which 6-dp reporting rounds to 0,
  *    so both engines pin p = 0 there EXACTLY.
  *  - χ² survival at integer df: for even df = 2m,
  *    Q = e^(−y)·Σ_{j<m} yʲ/j!  (y = x/2, exact); for odd df = 2m+1,
  *    Q = erfc(√y) + e^(−y)·Σ_{j<m} yʲ⁺½/Γ(j+3/2)  (exact, with the
  *    erfc cut's ≤ 5e-7 absolute truncation).
  *
  * Every chain is built from IEEE-deterministic ops (*, /, +, sqrt,
  * abs, comparisons) via RECURRENCES — tⱼ = tⱼ₋₁·y/j — in pinned
  * left-associative order, generated TWICE from the same code path:
  * a Spark Column chain and a DuckDB SQL lateral-alias chain. Where
  * no transcendental enters (the erfc-only family: χ²₁ / normal z),
  * the two engines produce BIT-IDENTICAL doubles — raw outputs
  * hash-match with no rounding. Where exp(−y) enters (general χ²),
  * the engines differ by libm ulps → callers round to 6 dp (the
  * a68/a120 closed-form discipline).
  *
  * SQL literals: DuckDB parses bare fractional literals as DECIMAL
  * and its decimal→double conversion double-rounds past 15 digits
  * (the CAST-AS-VARCHAR gotcha), so irrational constants are emitted
  * as CAST('<shortest-repr>' AS DOUBLE) — string→double parsing is
  * correctly rounded, guaranteeing the same bits Spark's `lit` uses.
  */
object PinnedSeries {

  /** Taylor terms for erf. At x = ErfCut the term ratio is x²/n, so
    * 64 terms leave truncation ≲ 1e-13 — far below the 6-dp grid. */
  val ErfTerms = 64

  /** erfc(x) < 5e-7 for x ≥ 3.6, so 6-dp reporting rounds the tail to
    * 0 — both engines pin it exactly, and the alternating series
    * never runs at the large x where its cancellation degrades. */
  val ErfCut = 3.6

  /** 2/√π, one Scala-side rounding; both engines load the same bits. */
  val TwoOverSqrtPi: Double = 2.0 / math.sqrt(math.Pi)

  /** Γ(3/2) = √π/2 — seed of the odd-df χ² series. */
  val GammaThreeHalves: Double = math.sqrt(math.Pi) / 2.0

  /** Half-df terms carried by the χ² series: supports integer df ≤ 48
    * (testdata maxes at a41's (5−1)(7−1) = 24). */
  val MaxHalfDf = 24

  /** Correctly-rounded double literal for DuckDB SQL: bare fractional
    * literals parse as DECIMAL and the decimal→double conversion
    * double-rounds past 15 digits; string→double parsing is correctly
    * rounded, guaranteeing the same bits Spark's `lit` loads. Shared
    * by every oracle generator (PinnedBeta, Backtest).  */
  private[operators] def dlit(v: Double): String =
    s"CAST('${v}' AS DOUBLE)"

  // ---------------------------------------------------------------
  // erfc — Spark side
  // ---------------------------------------------------------------

  /** erfc(t) for t ≥ 0 (NULL-propagating): 1 − (2/√π)·Σ uⱼ/(2j+1)
    * with u₀ = t, uⱼ = uⱼ₋₁·(−t²)/j; 0.0 at/beyond the cut.
    *
    * Implemented as an `aggregate` HOF fold, NOT an unrolled Column
    * chain: the original 64-term unrolled tree compiled to a huge
    * janino method whose COMPILATION (not evaluation) cost 8–20 s
    * per query stage at bench time — the round-14 full sweep caught
    * every chain-carrying p twin regressing from sub-second to
    * 10 s+. The fold's expression tree is constant-size (the HOF is
    * CodegenFallback, so no giant method is ever generated) and the
    * per-step op order is IDENTICAL to the unrolled form — same
    * left-associated adds, same divisors — so every hash-checked
    * value is bit-for-bit unchanged (re-verified at all three SFs
    * after the rewrite). */
  def erfcCol(t: Column): Column = {
    val m = -(t * t)
    val st = aggregate(
      sequence(lit(1), lit(ErfTerms - 1)),
      struct(t.as("u"), (t / lit(1.0)).as("sum")),
      (acc, ji) => {
        val j = ji.cast("double")
        val u = acc.getField("u") * m / j
        struct(u.as("u"),
          (acc.getField("sum") +
            u / (lit(2.0) * j + lit(1.0))).as("sum"))
      })
    when(t >= lit(ErfCut), lit(0.0))
      .otherwise(lit(1.0) - lit(TwoOverSqrtPi) * st.getField("sum"))
  }

  /** Two-sided normal tail P(|Z| > |z|) = erfc(|z|/√2). */
  def normalTwoSidedCol(z: Column): Column =
    erfcCol(abs(z) / sqrt(lit(2.0)))

  // ---------------------------------------------------------------
  // erfc — DuckDB side (CTE chain; DuckDB inlines lateral aliases
  // recursively, so a 64-deep alias chain in ONE select blows its
  // 128-frame binder — batching ≤8 aliases per CTE keeps the
  // inlining depth constant while preserving the exact op order)
  // ---------------------------------------------------------------

  private val Batch = 8

  /** CTE definitions (to splice into a WITH list) computing erfc of
    * expression `t` (over columns of CTE `prev`) into column `out`,
    * mirroring [[erfcCol]] op-for-op. Returns (cteDefs, lastCteName);
    * every column of `prev` is carried through via SELECT *. */
  def erfcSqlCtes(prev: String, t: String, out: String,
                  pfx: String): (String, String) = {
    val b = new StringBuilder
    b ++= s"${pfx}c0 AS (SELECT *, ($t) AS ${pfx}t, " +
      s"-((${pfx}t)*(${pfx}t)) AS ${pfx}m, ${pfx}t AS ${pfx}u0 FROM $prev)"
    var j = 1
    var ci = 0
    while (j < ErfTerms) {
      val hi = math.min(j + Batch, ErfTerms)
      val items = (j until hi).map(k =>
        s"${pfx}u${k - 1} * ${pfx}m / ${k.toDouble} AS ${pfx}u$k")
        .mkString(", ")
      b ++= s", ${pfx}c${ci + 1} AS (SELECT *, $items FROM ${pfx}c$ci)"
      ci += 1
      j = hi
    }
    val sum = (0 until ErfTerms)
      .map(k => s"${pfx}u$k / ${(2 * k + 1).toDouble}").mkString(" + ")
    b ++= s", ${pfx}cz AS (SELECT *, CASE WHEN ${pfx}t >= ${dlit(ErfCut)} " +
      s"THEN 0.0 ELSE 1.0 - ${dlit(TwoOverSqrtPi)} * ($sum) END AS $out " +
      s"FROM ${pfx}c$ci)"
    (b.toString, s"${pfx}cz")
  }

  /** CTE definitions for the two-sided normal tail of expr `z`. */
  def normalTwoSidedSqlCtes(prev: String, z: String, out: String,
                            pfx: String): (String, String) =
    erfcSqlCtes(prev, s"abs($z) / sqrt(2.0)", out, pfx)

  // ---------------------------------------------------------------
  // χ² survival at integer df — Spark side
  // ---------------------------------------------------------------

  /** P(χ²_df > x) for integer df in [1, 2·MaxHalfDf]; NULL outside
    * that range (and for NULL inputs). Exact finite series; the only
    * transcendental is exp(−y) (and the erfc cut for odd df), so
    * callers round the result to 6 dp. */
  def chiSqPCol(x: Column, dfD: Column): Column = {
    val y = x / lit(2.0)
    val mEven = dfD / lit(2.0)              // gate: j < mEven
    val mOdd = (dfD - lit(1.0)) / lit(2.0)  // gate: j < mOdd
    // even series: t₀ = 1, tⱼ = tⱼ₋₁·y/j
    // odd series: r₀ = √y/Γ(3/2), rⱼ = rⱼ₋₁·y/(j+0.5)
    // Folded, not unrolled, for the same janino-compile-time reason
    // as [[erfcCol]] — identical per-step op order, bit-identical
    // values.
    val r0 = sqrt(y) / lit(GammaThreeHalves)
    val init = struct(
      lit(1.0).as("t"),
      when(lit(0.0) < mEven, lit(1.0)).otherwise(lit(0.0)).as("se"),
      r0.as("r"),
      when(lit(0.0) < mOdd, r0).otherwise(lit(0.0)).as("so"))
    val st = aggregate(sequence(lit(1), lit(MaxHalfDf - 1)), init,
      (acc, ji) => {
        val j = ji.cast("double")
        val t = acc.getField("t") * y / j
        val r = acc.getField("r") * y / (j + lit(0.5))
        struct(t.as("t"),
          (acc.getField("se") +
            when(j < mEven, t).otherwise(lit(0.0))).as("se"),
          r.as("r"),
          (acc.getField("so") +
            when(j < mOdd, r).otherwise(lit(0.0))).as("so"))
      })
    val pEven = exp(-y) * st.getField("se")
    val pOdd = erfcCol(sqrt(y)) + exp(-y) * st.getField("so")
    when(dfD >= lit(1.0) && dfD <= lit(2.0 * MaxHalfDf) &&
        (dfD % lit(2.0)) === lit(0.0), pEven)
      .when(dfD >= lit(1.0) && dfD <= lit(2.0 * MaxHalfDf) &&
        (dfD % lit(2.0)) === lit(1.0), pOdd)
  }

  // ---------------------------------------------------------------
  // χ² survival — DuckDB side
  // ---------------------------------------------------------------

  /** CTE definitions mirroring [[chiSqPCol]] for stat expr `x` and df
    * expr `df` (over columns of CTE `prev`), result in column `out`.
    * Returns (cteDefs, lastCteName). */
  def chiSqPSqlCtes(prev: String, x: String, df: String, out: String,
                    pfx: String): (String, String) = {
    val b = new StringBuilder
    b ++= s"${pfx}c0 AS (SELECT *, ($x) / 2.0 AS ${pfx}y, " +
      s"CAST(($df) AS DOUBLE) AS ${pfx}df, " +
      s"CAST(($df) AS DOUBLE) / 2.0 AS ${pfx}me, " +
      s"(CAST(($df) AS DOUBLE) - 1.0) / 2.0 AS ${pfx}mo, " +
      s"CAST(1.0 AS DOUBLE) AS ${pfx}t0, " +
      s"sqrt(($x) / 2.0) / ${dlit(GammaThreeHalves)} AS ${pfx}r0 " +
      s"FROM $prev)"
    // t/r recurrences, Batch/2 steps (= Batch aliases) per CTE
    var j = 1
    var ci = 0
    while (j < MaxHalfDf) {
      val hi = math.min(j + Batch / 2, MaxHalfDf)
      val items = (j until hi).flatMap(k => Seq(
        s"${pfx}t${k - 1} * ${pfx}y / ${k.toDouble} AS ${pfx}t$k",
        s"${pfx}r${k - 1} * ${pfx}y / ${k.toDouble + 0.5} AS ${pfx}r$k"))
        .mkString(", ")
      b ++= s", ${pfx}c${ci + 1} AS (SELECT *, $items FROM ${pfx}c$ci)"
      ci += 1
      j = hi
    }
    def gated(m: String, c: Char): String = (0 until MaxHalfDf).map { k =>
      s"CASE WHEN ${k.toDouble} < ${pfx}$m THEN ${pfx}$c$k ELSE 0.0 END"
    }.mkString(" + ")
    b ++= s", ${pfx}cs AS (SELECT *, ${gated("me", 't')} AS ${pfx}se, " +
      s"${gated("mo", 'r')} AS ${pfx}so FROM ${pfx}c$ci)"
    // erfc(√y) for the odd branch
    val (erfcDefs, erfcLast) =
      erfcSqlCtes(s"${pfx}cs", s"sqrt(${pfx}y)", s"${pfx}erfc", s"${pfx}e_")
    b ++= s", $erfcDefs"
    b ++= s", ${pfx}cz AS (SELECT *, " +
      s"CASE WHEN ${pfx}df >= 1.0 AND ${pfx}df <= ${2.0 * MaxHalfDf} " +
      s"AND ${pfx}df % 2.0 = 0.0 THEN exp(-${pfx}y) * ${pfx}se " +
      s"WHEN ${pfx}df >= 1.0 AND ${pfx}df <= ${2.0 * MaxHalfDf} " +
      s"AND ${pfx}df % 2.0 = 1.0 THEN ${pfx}erfc + exp(-${pfx}y) * ${pfx}so " +
      s"END AS $out FROM $erfcLast)"
    (b.toString, s"${pfx}cz")
  }
}
