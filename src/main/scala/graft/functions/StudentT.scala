package graft.functions

/** Two-sided p-value of a Pearson correlation under the null, via the
  * Student-t distribution — the scipy.stats.pearsonr p-value the
  * reference relies on (`scripts/05_lag_analysis.py:151`).
  *
  * t = r * sqrt((n-2) / (1-r²)) with n-2 dof;
  * p = I_{df/(df+t²)}(df/2, 1/2)  (regularized incomplete beta).
  *
  * The incomplete beta uses the standard Lentz continued-fraction
  * evaluation (public-domain algorithm, e.g. Numerical Recipes §6.4 /
  * Apache Commons Math) — pure Scala, deterministic, no dependencies.
  */
object StudentT {

  /** ln Γ(x) — Lanczos approximation (g=7, n=9), |err| < 1e-13. */
  def logGamma(x: Double): Double = {
    val g = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) {
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    } else {
      val xx = x - 1.0
      var a = g(0)
      val t = xx + 7.5
      var i = 1
      while (i < 9) { a += g(i) / (xx + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (xx + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Continued fraction for the incomplete beta (Lentz's method). */
  private def betacf(a: Double, b: Double, x: Double): Double = {
    val MaxIt = 200; val Eps = 3e-14; val FpMin = 1e-300
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0
    var dd = 1.0 - qab * x / qap
    if (math.abs(dd) < FpMin) dd = FpMin
    dd = 1.0 / dd
    var h = dd
    var m = 1
    var done = false
    while (m <= MaxIt && !done) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      dd = 1.0 + aa * dd
      if (math.abs(dd) < FpMin) dd = FpMin
      c = 1.0 + aa / c
      if (math.abs(c) < FpMin) c = FpMin
      dd = 1.0 / dd
      h *= dd * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      dd = 1.0 + aa * dd
      if (math.abs(dd) < FpMin) dd = FpMin
      c = 1.0 + aa / c
      if (math.abs(c) < FpMin) c = FpMin
      dd = 1.0 / dd
      val del = dd * c
      h *= del
      if (math.abs(del - 1.0) < Eps) done = true
      m += 1
    }
    h
  }

  /** Regularized incomplete beta I_x(a, b). */
  def betainc(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) 0.0
    else if (x >= 1.0) 1.0
    else {
      val bt = math.exp(logGamma(a + b) - logGamma(a) - logGamma(b) +
        a * math.log(x) + b * math.log(1.0 - x))
      if (x < (a + 1.0) / (a + b + 2.0)) bt * betacf(a, b, x) / a
      else 1.0 - bt * betacf(b, a, 1.0 - x) / b
    }
  }

  /** Regularized upper incomplete gamma Q(a, x) — series for x < a+1,
    * modified-Lentz continued fraction beyond (the published
    * Numerical Recipes §6.2 construction, like betacf above).
    * Q(k/2, x/2) is the chi-square survival function. */
  def gammaQ(a: Double, x: Double): Double = {
    if (a <= 0.0 || x < 0.0 || a.isNaN || x.isNaN) Double.NaN
    else if (x == 0.0) 1.0
    else if (x < a + 1.0) 1.0 - gser(a, x)
    else gcf(a, x)
  }

  /** Lower regularized gamma P by series (x < a+1 regime). */
  private def gser(a: Double, x: Double): Double = {
    var ap = a
    var sum = 1.0 / a
    var del = sum
    var n = 0
    while (n < 500 && math.abs(del) >= math.abs(sum) * 1e-16) {
      ap += 1.0; del *= x / ap; sum += del; n += 1
    }
    sum * math.exp(-x + a * math.log(x) - logGamma(a))
  }

  /** Upper regularized gamma Q by continued fraction (x ≥ a+1). */
  private def gcf(a: Double, x: Double): Double = {
    val tiny = 1e-300
    var b = x + 1.0 - a
    var c = 1.0 / tiny
    var dd = 1.0 / b
    var h = dd
    var i = 1
    var del = 0.0
    do {
      val an = -i * (i - a)
      b += 2.0
      dd = an * dd + b; if (math.abs(dd) < tiny) dd = tiny
      c = b + an / c; if (math.abs(c) < tiny) c = tiny
      dd = 1.0 / dd
      del = dd * c
      h *= del
      i += 1
    } while (i < 500 && math.abs(del - 1.0) >= 1e-16)
    math.exp(-x + a * math.log(x) - logGamma(a)) * h
  }

  /** Chi-square upper-tail p-value at k degrees of freedom. */
  def chiSqPValue(x: Double, k: Double): Double =
    if (k <= 0.0 || x < 0.0 || x.isNaN || k.isNaN) Double.NaN
    else gammaQ(k / 2.0, x / 2.0)

  /** Two-sided p-value for a t statistic at (possibly FRACTIONAL)
    * degrees of freedom — Welch's test feeds Satterthwaite df here;
    * the incomplete-beta kernel is continuous in df, so nothing
    * special is needed for non-integer values. */
  def tPValue(t: Double, df: Double): Double =
    if (df <= 0.0 || t.isNaN || df.isNaN) Double.NaN
    else betainc(df / 2.0, 0.5, df / (df + t * t))

  /** Upper-tail p-value for an F statistic at (d1, d2) dof —
    * P(F > f) = I_{d2/(d2+d1·f)}(d2/2, d1/2), the same regularized
    * incomplete beta the t kernel uses (ANOVA feeds k−1, N−k). */
  def fPValue(f: Double, d1: Double, d2: Double): Double =
    if (d1 <= 0.0 || d2 <= 0.0 || f < 0.0 ||
        f.isNaN || d1.isNaN || d2.isNaN) Double.NaN
    else betainc(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))

  /** Two-sided p-value for Pearson r with n observations (dof = n-2). */
  def pValue(r: Double, n: Long): Double = {
    if (n < 3 || r.isNaN) Double.NaN
    else if (math.abs(r) >= 1.0) 0.0
    else {
      val df = (n - 2).toDouble
      val t2 = r * r * df / (1.0 - r * r)
      betainc(df / 2.0, 0.5, df / (df + t2))
    }
  }
}
