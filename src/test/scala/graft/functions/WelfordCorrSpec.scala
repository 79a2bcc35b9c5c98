package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.splitmix64

/** Goldens for the Welford/Chan streaming-correlation Aggregator:
  * the merge associativity that makes it map-side combinable, the
  * agreement with a two-pass textbook computation, and the NULL
  * contract on degenerate groups.
  */
class WelfordCorrSpec extends AnyFunSuite {

  // deterministic pseudo-random pairs with real correlation structure
  private def u(i: Long): Double =
    (splitmix64(i) >>> 11).toDouble / (1L << 53).toDouble
  private val pairs: Vector[(Double, Double)] =
    (1 to 997).map { i =>
      val x = u(i) * 200 - 100
      val y = 0.7 * x + u(i + 100000) * 60 - 30
      (x, y)
    }.toVector

  private def fold(xs: Seq[(Double, Double)]): CorrState =
    xs.foldLeft(WelfordCorr.zero)(WelfordCorr.reduce)

  /** Two-pass reference: exact means, then centered sums. */
  private def twoPass(xs: Seq[(Double, Double)]): (Double, Double) = {
    val n = xs.size
    val mx = xs.map(_._1).sum / n
    val my = xs.map(_._2).sum / n
    val m2x = xs.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val m2y = xs.map(p => (p._2 - my) * (p._2 - my)).sum
    val cxy = xs.map(p => (p._1 - mx) * (p._2 - my)).sum
    (cxy / (math.sqrt(m2x) * math.sqrt(m2y)), cxy / (n - 1))
  }

  private def closeTo(a: Double, b: Double, tol: Double = 1e-11): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("merge is associative and grouping-invariant (map-side combine)") {
    // the same rows sliced three ways — a sequential fold, uneven
    // chunks merged left-to-right, and a balanced tree of tiny chunks
    // (what a 1000-partition map-side combine actually produces) —
    // must land on the same state up to ulp-scale noise
    val whole = fold(pairs)
    val chunks = pairs.grouped(101).map(fold).toVector
    val leftFold = chunks.reduceLeft(WelfordCorr.merge)
    def tree(v: Vector[CorrState]): CorrState = v match {
      case Vector(one) => one
      case _ =>
        val (l, r) = v.splitAt(v.size / 2)
        WelfordCorr.merge(tree(l), tree(r))
    }
    val treeFold = tree(pairs.grouped(7).map(fold).toVector)
    for (m <- Seq(leftFold, treeFold)) {
      assert(m.n == whole.n)
      assert(closeTo(m.mx, whole.mx) && closeTo(m.my, whole.my))
      assert(closeTo(m.m2x, whole.m2x) && closeTo(m.m2y, whole.m2y))
      assert(closeTo(m.cxy, whole.cxy))
    }
    // merging with the empty state is the identity (first-row partials)
    assert(WelfordCorr.merge(WelfordCorr.zero, whole) == whole)
    assert(WelfordCorr.merge(whole, WelfordCorr.zero) == whole)
  }

  test("finish agrees with the two-pass textbook computation") {
    val got = WelfordCorr.finish(fold(pairs))
    val (r, cov) = twoPass(pairs)
    assert(got.n == pairs.size)
    assert(closeTo(got.r.get, r, 1e-9))
    assert(closeTo(got.cov_samp.get, cov, 1e-9))
    // the data is built with positive correlation — sanity-pin sign
    // and range so a silently-wrong formula can't pass on noise
    assert(got.r.get > 0.8 && got.r.get < 1.0)
  }

  test("degenerate groups surface as NULLs, matching corr's contract") {
    val one = WelfordCorr.finish(fold(pairs.take(1)))
    assert(one.r.isEmpty && one.cov_samp.isEmpty && one.n == 1)
    // constant x: zero variance → r NULL, covariance defined (= 0)
    val const = WelfordCorr.finish(fold(Vector((5.0, 1.0), (5.0, 2.0), (5.0, 3.0))))
    assert(const.r.isEmpty)
    assert(const.cov_samp.exists(c => math.abs(c) < 1e-12))
  }
}
