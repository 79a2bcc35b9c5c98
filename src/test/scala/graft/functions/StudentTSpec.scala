package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Goldens + cross-validation for the Pearson-r p-value
  * (scipy.stats.pearsonr semantics — `scripts/05_lag_analysis.py:151`).
  *
  * The continued-fraction betainc path is cross-checked against an
  * INDEPENDENT numerical quadrature of the Student-t density, so the
  * test does not share code with the implementation under test.
  */
class StudentTSpec extends AnyFunSuite {

  /** ln of the t-density normalizing constant for df dof. */
  private def logC(df: Double): Double =
    StudentT.logGamma((df + 1) / 2.0) - StudentT.logGamma(df / 2.0) -
      0.5 * math.log(df * math.Pi)

  /** Two-sided p via Simpson quadrature of the t pdf. The t tail is
    * polynomial (x^-(df+1)), so a truncated integral loses ~1e-5 at
    * low df; substituting x = √df·tan(y) maps [|t|, ∞) to a finite
    * interval with integrand c·√df·cos^(df-1)(y) — exact tails.
    * Independent of the betainc path under test. */
  private def pByQuadrature(t: Double, df: Double): Double = {
    val lo = math.atan(math.abs(t) / math.sqrt(df)); val hi = math.Pi / 2
    val n = 20000 // even
    val h = (hi - lo) / n
    val c = math.exp(logC(df)) * math.sqrt(df)
    def f(y: Double): Double = c * math.pow(math.cos(y), df - 1)
    var s = f(lo) + f(hi)
    var i = 1
    while (i < n) { s += f(lo + i * h) * (if (i % 2 == 1) 4.0 else 2.0); i += 1 }
    2.0 * s * h / 3.0
  }

  private def pRef(r: Double, n: Long): Double = {
    val df = (n - 2).toDouble
    val t = math.abs(r) * math.sqrt(df / (1 - r * r))
    pByQuadrature(t, df)
  }

  test("matches independent quadrature across the (r, n) grid") {
    for (r <- Seq(0.05, 0.2, 0.4, 0.529, 0.7, 0.9, 0.99);
         n <- Seq(5L, 10L, 34L, 100L, 1000L)) {
      val p = StudentT.pValue(r, n)
      val ref = pRef(r, n)
      assert(math.abs(p - ref) < 1e-8 * math.max(1.0, 1 / math.max(ref, 1e-12)) ||
        math.abs(p - ref) / math.max(ref, 1e-300) < 1e-6,
        s"r=$r n=$n: p=$p quadrature=$ref")
    }
  }

  test("reference golden: r=-0.529, n=34 is significant at ~0.001") {
    // The reference's flagged config (docs/imp_numbers.txt:284): the
    // scipy p-value is ~1.3e-3 (reported there rounded as ≈0.0016).
    val p = StudentT.pValue(-0.529, 34)
    assert(p > 5e-4 && p < 2e-3, s"p=$p")
    assert(math.abs(p - pRef(0.529, 34)) / pRef(0.529, 34) < 1e-6)
  }

  test("edge cases: r=0 → 1, |r|=1 → 0, n<3 → NaN, symmetry") {
    assert(math.abs(StudentT.pValue(0.0, 50) - 1.0) < 1e-12)
    assert(StudentT.pValue(1.0, 50) == 0.0)
    assert(StudentT.pValue(-1.0, 50) == 0.0)
    assert(StudentT.pValue(0.5, 2).isNaN)
    assert(StudentT.pValue(Double.NaN, 50).isNaN)
    for (r <- Seq(0.1, 0.5, 0.9))
      assert(StudentT.pValue(r, 30) == StudentT.pValue(-r, 30))
  }

  test("p is strictly decreasing in |r| and in n") {
    val ps = Seq(0.1, 0.3, 0.5, 0.7, 0.9).map(StudentT.pValue(_, 30))
    assert(ps == ps.sorted.reverse && ps.distinct.size == ps.size)
    val pn = Seq(5L, 10L, 30L, 100L).map(StudentT.pValue(0.4, _))
    assert(pn == pn.sorted.reverse && pn.distinct.size == pn.size)
  }

  test("tPValue: independent quadrature at FRACTIONAL (Welch) df") {
    for (t <- Seq(0.5, 1.3, 2.7); df <- Seq(3.7, 11.25, 40.5)) {
      val got = StudentT.tPValue(t, df)
      val want = pByQuadrature(t, df)
      assert(math.abs(got - want) < 1e-8, s"t=$t df=$df: $got vs $want")
    }
  }

  test("tPValue: collapses to the Pearson kernel at integer df") {
    // pValue(r, n) is DEFINED as the two-sided t test of
    // t = r·√(df/(1−r²)) at df = n−2 — the two kernels must agree
    for (r <- Seq(0.1, 0.42, 0.9); n <- Seq(5L, 34L, 200L)) {
      val df = (n - 2).toDouble
      val t = r * math.sqrt(df / (1 - r * r))
      assert(math.abs(StudentT.tPValue(t, df) -
        StudentT.pValue(r, n)) < 1e-14, s"r=$r n=$n")
    }
  }

  test("tPValue edges: p(0)=1, sign symmetry, monotone in |t|, df≤0 NaN") {
    assert(StudentT.tPValue(0.0, 7.3) == 1.0)
    assert(StudentT.tPValue(-2.1, 9.4) == StudentT.tPValue(2.1, 9.4))
    assert(StudentT.tPValue(3.0, 9.4) < StudentT.tPValue(2.0, 9.4))
    assert(StudentT.tPValue(1.0, 0.0).isNaN)
    assert(StudentT.tPValue(1.0, -3.0).isNaN)
  }

  test("chiSqPValue: analytic goldens at k = 2 and k = 4") {
    // k=2: Q(1, x/2) = e^{-x/2} exactly; k=4: Q(2, x/2) = e^{-x/2}(1 + x/2)
    for (x <- Seq(0.1, 1.0, 3.7, 10.0, 25.0)) {
      val p2 = StudentT.chiSqPValue(x, 2.0)
      assert(math.abs(p2 - math.exp(-x / 2)) < 1e-12, s"k=2 x=$x: $p2")
      val p4 = StudentT.chiSqPValue(x, 4.0)
      val want4 = math.exp(-x / 2) * (1 + x / 2)
      assert(math.abs(p4 - want4) < 1e-12, s"k=4 x=$x: $p4 vs $want4")
    }
  }

  test("chiSqPValue: independent quadrature across the (x, k) grid") {
    // 1 − ∫₀ˣ chi²-pdf via Simpson — shares no code with gammaQ
    def pdf(t: Double, k: Double): Double =
      math.exp((k / 2 - 1) * math.log(t) - t / 2 -
        (k / 2) * math.log(2.0) - StudentT.logGamma(k / 2))
    def byQuad(x: Double, k: Double): Double = {
      val n = 20000
      val h = x / n
      var s = pdf(1e-12, k) + pdf(x, k)
      var i = 1
      while (i < n) {
        s += pdf(i * h, k) * (if (i % 2 == 1) 4.0 else 2.0); i += 1
      }
      1.0 - s * h / 3.0
    }
    for (x <- Seq(2.0, 7.5, 15.5); k <- Seq(3.0, 8.0, 20.0)) {
      val got = StudentT.chiSqPValue(x, k)
      val want = byQuad(x, k)
      // 1e-6: Simpson converges slowly at odd k (√t-type integrand
      // near 0 is not smooth), so the cross-check tolerance is looser
      // than the t-test one
      assert(math.abs(got - want) < 1e-6, s"x=$x k=$k: $got vs $want")
    }
  }

  test("chiSqPValue edges: p(0)=1, monotone in x, invalid → NaN") {
    assert(StudentT.chiSqPValue(0.0, 8.0) == 1.0)
    assert(StudentT.chiSqPValue(12.0, 8.0) <
      StudentT.chiSqPValue(6.0, 8.0))
    assert(StudentT.chiSqPValue(-1.0, 8.0).isNaN)
    assert(StudentT.chiSqPValue(1.0, 0.0).isNaN)
  }

  test("betainc analytic golden: I_x(1/2, 1/2) = (2/π)·asin(√x)") {
    for (x <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val expect = 2.0 / math.Pi * math.asin(math.sqrt(x))
      assert(math.abs(StudentT.betainc(0.5, 0.5, x) - expect) < 1e-10)
    }
  }
}
