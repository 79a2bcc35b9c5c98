package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine PINNED-ITERATION regularized incomplete beta — the
  * round-14 burn-down of the last four rows-only p-value twins
  * (`a3_corr_pvalue`, `a28_welch_pvalue`, `a52_anova_pvalue`,
  * `a74_levene_pvalue`: Student-t at data-sized df, Welch's
  * FRACTIONAL df, and the F distribution).
  *
  * These have no finite closed form (the [[PinnedSeries]] tool that
  * flipped the χ²/normal twins doesn't reach them), but they don't
  * need one: the kernel's own Lentz continued fraction
  * ([[graft.functions.StudentT.betainc]], Numerical Recipes §6.4)
  * becomes cross-engine replayable the moment its data-dependent
  * early exit is replaced by a FIXED [[Iters]]-iteration run. Every
  * CF op is +, −, ×, ÷, abs, compare — all IEEE-correctly-rounded,
  * so the fraction value is BIT-IDENTICAL between Spark's fold and a
  * DuckDB recursive CTE (verified bit-for-bit over a 15-case
  * (a, b, x) grid spanning a ∈ [0.5, 5000] before landing). Running
  * past convergence only multiplies the Lentz product by del ≈ 1
  * factors — both engines multiply the SAME factors, and vs the
  * early-exiting kernel the drift measured ≤ 1.2e-14 absolute
  * (PinnedBetaSpec pins it), invisible on the 6-dp grid.
  *
  * The only transcendentals are the prefactor's exp/ln (and the
  * Lanczos log-gamma, mirrored op-for-op from
  * [[graft.functions.StudentT.logGamma]]) — libm-ulp territory, so
  * callers round the final p to 6 dp, the same discipline as the
  * χ² family's exp(−y).
  *
  * Both chains consume the ALREADY-HASH-CHECKED rounded statistic
  * columns of their main queries (the a41 flip precedent), so the
  * chain inputs are bit-identical across engines by construction.
  *
  * Scale: the chains run on post-aggregation frames (grid cells /
  * 1-row test results), never the corpus — [[Iters]]×~30 flops per
  * GROUP, not per event.
  */
object PinnedBeta {

  /** Fixed CF iteration count = the kernel's own MaxIt, so whenever
    * the kernel converges the pinned run contains its full iteration
    * sequence (and when it doesn't, both ran the identical 200). */
  val Iters = 200

  /** Lentz underflow clamp — same constant as the kernel. */
  val FpMin = 1e-300

  /** x is clamped into [XLo, XHi] before entering the chain so no
    * ln(≤0) can ever evaluate (DuckDB ERRORS on ln(0); the true
    * x ≤ 0 / x ≥ 1 edges are resolved by the caller-visible CASE,
    * which returns 0/1 without consulting the chain). XHi is
    * nextDown(1.0); XLo keeps 1−x ≥ 1.1e-16 > 0. */
  val XHi = 0.9999999999999999
  val XLo = 1e-300

  /** Lanczos g=7, n=9 coefficients — bit-for-bit the kernel's. */
  private val G = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /** 0.5·ln(2π), folded once in Scala; both engines load the bits. */
  val HalfLog2Pi: Double = 0.5 * math.log(2 * math.Pi)

  // ---------------------------------------------------------------
  // Spark side
  // ---------------------------------------------------------------

  /** ln Γ(x) for x ≥ 0.5 — the kernel's Lanczos branch op-for-op
    * (the reflection branch is never needed: every a, b here is a
    * half-df ≥ 0.5). */
  def logGammaCol(x: Column): Column = {
    val xx = x - lit(1.0)
    var aSum = lit(G(0))
    var i = 1
    while (i < 9) { aSum = aSum + lit(G(i)) / (xx + lit(i.toDouble)); i += 1 }
    val t = xx + lit(7.5)
    lit(HalfLog2Pi) + (xx + lit(0.5)) * log(t) - t + log(aSum)
  }

  private def clamp(v: Column): Column =
    when(abs(v) < lit(FpMin), lit(FpMin)).otherwise(v)

  /** Lentz continued fraction for I_x(a,b), pinned [[Iters]]
    * iterations — [[graft.functions.StudentT.betacf]] with the early
    * exit removed, in the identical op order. */
  private def betacfCol(a: Column, b: Column, x: Column): Column = {
    val qab = a + b
    val qap = a + lit(1.0)
    val qam = a - lit(1.0)
    val d0 = clamp(lit(1.0) - qab * x / qap)
    val ddInv0 = lit(1.0) / d0
    val init = struct(lit(1.0).as("c"), ddInv0.as("dd"), ddInv0.as("h"))
    val st = aggregate(sequence(lit(1), lit(Iters)), init, (acc, mi) => {
      val md = mi.cast("double")
      val m2 = lit(2.0) * md
      val aa1 = md * (b - md) * x / ((qam + m2) * (a + m2))
      val dda = clamp(lit(1.0) + aa1 * acc.getField("dd"))
      val ca = clamp(lit(1.0) + aa1 / acc.getField("c"))
      val ddai = lit(1.0) / dda
      val ha = acc.getField("h") * (ddai * ca)
      val aa2 = -((a + md) * (qab + md) * x) / ((a + m2) * (qap + m2))
      val ddb = clamp(lit(1.0) + aa2 * ddai)
      val cb = clamp(lit(1.0) + aa2 / ca)
      val ddbi = lit(1.0) / ddb
      val hb = ha * (ddbi * cb)
      struct(cb.as("c"), ddbi.as("dd"), hb.as("h"))
    })
    st.getField("h")
  }

  /** Regularized incomplete beta I_x(a, b) — the kernel's assembly
    * with both CF branches evaluated and CASE-selected (SQL can't
    * lazily branch; value-parity is what the hash needs). Callers
    * guarantee a, b ≥ 0.5 on rows that reach the chain. */
  def betaincCol(a: Column, b: Column, x: Column): Column = {
    val xc = greatest(least(x, lit(XHi)), lit(XLo))
    val x2 = lit(1.0) - xc
    val bt = exp(logGammaCol(a + b) - logGammaCol(a) - logGammaCol(b) +
      a * log(xc) + b * log(x2))
    when(x <= lit(0.0), lit(0.0))
      .when(x >= lit(1.0), lit(1.0))
      .when(xc < (a + lit(1.0)) / (a + b + lit(2.0)),
        bt * betacfCol(a, b, xc) / a)
      .otherwise(lit(1.0) - bt * betacfCol(b, a, x2) / b)
  }

  /** Two-sided Student-t p at (possibly fractional) df —
    * [[graft.functions.StudentT.tPValue]]'s arithmetic on the
    * pinned chain. NULL for undefined inputs. */
  def tTwoSidedPCol(t: Column, df: Column): Column =
    when(t.isNull || df.isNull || df <= lit(0.0), lit(null).cast("double"))
      .otherwise(betaincCol(df / lit(2.0), lit(0.5), df / (df + t * t)))

  /** Upper-tail F p at (d1, d2) —
    * [[graft.functions.StudentT.fPValue]]'s arithmetic. */
  def fUpperPCol(f: Column, d1: Column, d2: Column): Column =
    when(f.isNull || f < lit(0.0) || d1 < lit(1.0) || d2 < lit(1.0),
        lit(null).cast("double"))
      .otherwise(betaincCol(d2 / lit(2.0), d1 / lit(2.0),
        d2 / (d2 + d1 * f)))

  /** Two-sided Pearson-r p with n observations (df = n−2) —
    * [[graft.functions.StudentT.pValue]]'s arithmetic. */
  def pearsonPCol(r: Column, n: Column): Column = {
    val df = (n - lit(2)).cast("double")
    val t2 = r * r * df / (lit(1.0) - r * r)
    when(r.isNull || n < lit(3), lit(null).cast("double"))
      .when(abs(r) >= lit(1.0), lit(0.0))
      .otherwise(betaincCol(df / lit(2.0), lit(0.5), df / (df + t2)))
  }

  // ---------------------------------------------------------------
  // DuckDB side — a recursive CTE carrying both CF states, with the
  // two half-steps as lateral aliases inside the recursive term's
  // subquery (≤ ~14 inline depth, far under the 128-frame binder;
  // SELECT * EXCLUDE/REPLACE keeps the rCTE schema fixed)
  // ---------------------------------------------------------------

  /** SQL expr for ln Γ(x ≥ 0.5), mirroring [[logGammaCol]]. */
  def logGammaSql(x: String): String = {
    val xx = s"(($x) - 1.0)"
    var aSum = PinnedSeries.dlit(G(0))
    var i = 1
    while (i < 9) {
      aSum = s"($aSum + ${PinnedSeries.dlit(G(i))} / ($xx + ${i.toDouble}))"
      i += 1
    }
    val t = s"($xx + 7.5)"
    s"(${PinnedSeries.dlit(HalfLog2Pi)} + ($xx + 0.5) * ln($t) - $t + ln($aSum))"
  }

  private def clampSql(v: String, out: String): String =
    s"CASE WHEN abs($v) < ${PinnedSeries.dlit(FpMin)} THEN ${PinnedSeries.dlit(FpMin)} ELSE $v END AS $out"

  /** One full CF iteration's lateral-alias items (two half-steps),
    * mirroring the fold body. Returns (items, cFinal, ddFinal,
    * hFinal) alias names. */
  private def cfStepSql(c: String, dd: String, h: String, a: String,
                        b: String, x: String, qab: String, qap: String,
                        qam: String, md: String, sfx: String)
      : (Seq[String], String, String, String) = {
    val m2 = s"(2.0 * $md)"
    val items = Seq.newBuilder[String]
    items += s"$md * ($b - $md) * $x / (($qam + $m2) * ($a + $m2)) AS aa1$sfx"
    items += s"1.0 + aa1$sfx * $dd AS dda$sfx"
    items += clampSql(s"dda$sfx", s"ddac$sfx")
    items += s"1.0 + aa1$sfx / $c AS ca$sfx"
    items += clampSql(s"ca$sfx", s"cac$sfx")
    items += s"1.0 / ddac$sfx AS ddai$sfx"
    items += s"$h * (ddai$sfx * cac$sfx) AS ha$sfx"
    items += s"-(($a + $md) * ($qab + $md) * $x) / " +
      s"(($a + $m2) * ($qap + $m2)) AS aa2$sfx"
    items += s"1.0 + aa2$sfx * ddai$sfx AS ddb$sfx"
    items += clampSql(s"ddb$sfx", s"ddbc$sfx")
    items += s"1.0 + aa2$sfx / cac$sfx AS cb$sfx"
    items += clampSql(s"cb$sfx", s"cbc$sfx")
    items += s"1.0 / ddbc$sfx AS ddbi$sfx"
    items += s"ha$sfx * (ddbi$sfx * cbc$sfx) AS hb$sfx"
    (items.result(), s"cbc$sfx", s"ddbi$sfx", s"hb$sfx")
  }

  /** CTE definitions computing I_x(a,b) of expressions `aE`/`bE`/`xE`
    * (over columns of CTE `prev`) into column `out`, mirroring
    * [[betaincCol]] op-for-op. The first returned CTE set contains a
    * RECURSIVE member — the caller's WITH list must say
    * `WITH RECURSIVE`. Guarded rows (the caller's final CASE never
    * reads the chain there) must still feed SAFE dummies: aE/bE
    * ≥ 0.5 and xE finite, or DuckDB's ln() errors on them. Returns
    * (cteDefs, lastCteName); all of `prev`'s columns carry through. */
  def betaincSqlCtes(prev: String, aE: String, bE: String, xE: String,
                     out: String, pfx: String): (String, String) = {
    val p = pfx
    val initItems = Seq(
      s"($aE) AS ${p}a", s"($bE) AS ${p}b",
      s"greatest(least(($xE), ${PinnedSeries.dlit(XHi)}), ${PinnedSeries.dlit(XLo)}) AS ${p}x",
      s"($xE) AS ${p}xraw",
      s"${p}a + ${p}b AS ${p}qab",
      // CF1 = betacf(a, b, x)
      s"${p}a + 1.0 AS ${p}qap1", s"${p}a - 1.0 AS ${p}qam1",
      s"1.0 - ${p}qab * ${p}x / ${p}qap1 AS ${p}d01",
      clampSql(s"${p}d01", s"${p}d01c"),
      s"1.0 / ${p}d01c AS ${p}dd1",
      s"CAST(1.0 AS DOUBLE) AS ${p}c1",
      s"1.0 / ${p}d01c AS ${p}h1",
      // CF2 = betacf(b, a, 1−x)
      s"1.0 - ${p}x AS ${p}x2",
      s"${p}b + 1.0 AS ${p}qap2", s"${p}b - 1.0 AS ${p}qam2",
      s"1.0 - ${p}qab * ${p}x2 / ${p}qap2 AS ${p}d02",
      clampSql(s"${p}d02", s"${p}d02c"),
      s"1.0 / ${p}d02c AS ${p}dd2",
      s"CAST(1.0 AS DOUBLE) AS ${p}c2",
      s"1.0 / ${p}d02c AS ${p}h2",
      s"0 AS ${p}m")
    val base = s"${p}in AS (SELECT *, ${initItems.mkString(", ")} FROM $prev)"
    val seed =
      s"SELECT * EXCLUDE (${p}d01, ${p}d01c, ${p}d02, ${p}d02c) FROM ${p}in"
    val md = s"md$p"
    val (items1, c1f, dd1f, h1f) = cfStepSql(s"${p}c1", s"${p}dd1",
      s"${p}h1", s"${p}a", s"${p}b", s"${p}x", s"${p}qab", s"${p}qap1",
      s"${p}qam1", md, "_1")
    val (items2, c2f, dd2f, h2f) = cfStepSql(s"${p}c2", s"${p}dd2",
      s"${p}h2", s"${p}b", s"${p}a", s"${p}x2", s"${p}qab", s"${p}qap2",
      s"${p}qam2", md, "_2")
    val innerItems = Seq(s"CAST(${p}m + 1 AS DOUBLE) AS $md") ++
      items1 ++ items2
    val inter = (Seq(s"CAST(${p}m + 1 AS DOUBLE) AS $md") ++ items1 ++
      items2).map(_.split(" AS ").last)
    val rec = s"SELECT * EXCLUDE (${inter.mkString(", ")}) " +
      s"REPLACE (${p}m + 1 AS ${p}m, $c1f AS ${p}c1, $dd1f AS ${p}dd1, " +
      s"$h1f AS ${p}h1, $c2f AS ${p}c2, $dd2f AS ${p}dd2, $h2f AS ${p}h2) " +
      s"FROM (SELECT *, ${innerItems.mkString(", ")} " +
      s"FROM ${p}cf WHERE ${p}m < $Iters)"
    val cf = s"${p}cf AS ($seed UNION ALL $rec)"
    val fin = s"${p}fin AS (SELECT * FROM ${p}cf WHERE ${p}m = $Iters)"
    val bt = s"exp(${logGammaSql(s"${p}a + ${p}b")} - " +
      s"${logGammaSql(s"${p}a")} - ${logGammaSql(s"${p}b")} + " +
      s"${p}a * ln(${p}x) + ${p}b * ln(${p}x2))"
    val outc = s"${p}out AS (SELECT *, $bt AS ${p}bt, " +
      s"CASE WHEN ${p}xraw <= 0.0 THEN 0.0 " +
      s"WHEN ${p}xraw >= 1.0 THEN 1.0 " +
      s"WHEN ${p}x < (${p}a + 1.0) / (${p}a + ${p}b + 2.0) " +
      s"THEN ${p}bt * ${p}h1 / ${p}a " +
      s"ELSE 1.0 - ${p}bt * ${p}h2 / ${p}b END AS $out FROM ${p}fin)"
    (Seq(base, cf, fin, outc).mkString(", "), s"${p}out")
  }
}
