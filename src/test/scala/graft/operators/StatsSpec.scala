package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Cross-anchor for the rows-only A3: `a3_corr_pvalue` carries the
  * native Student-t p-value expression (no DuckDB equivalent), but
  * its (event_type, k, r, n) columns are exactly the oracle-checked
  * `a3_corr_grid` cells. Anchoring the two leaves only the p-value
  * itself rows-only — and that is golden-tested in StudentTSpec /
  * PearsonPValueSpec.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf0001

  test("a28_welch_pvalue anchors to the oracle-checked a28 row") {
    val base = Stats.queries("a28_welch_ttest")(spark, sf).collect()
    val pv = Stats.queries("a28_welch_pvalue")(spark, sf).collect()
    assert(base.length == 1 && pv.length == 1)
    // every shared column identical (the p query builds ON the base)
    (0 until 6).foreach { i =>
      assert(base(0).get(i) == pv(0).get(i), s"column $i diverged")
    }
    // the one rows-only column: recompute from the golden-tested
    // kernel at the SAME rounded inputs the query used
    val t = pv(0).getDouble(4); val df = pv(0).getDouble(5)
    val want = math.rint(graft.functions.StudentT.tPValue(t, df) * 1e6) / 1e6
    val got = pv(0).getDouble(6)
    assert(math.abs(got - want) <= 1e-6, s"p=$got vs kernel=$want")
    assert(got > 0.0 && got <= 1.0)
  }

  test("a3_corr_pvalue rows are oracle-verified grid cells") {
    val cells = Stats.queries("a3_corr_grid")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (Option(r.get(2)), r.getLong(3))).toMap
    val pv = Stats.queries("a3_corr_pvalue")(spark, sf).collect()
    assert(pv.nonEmpty && pv.length == cells.size,
      "same cell set on both sides")
    pv.foreach { r =>
      val key = (r.getString(0), r.getInt(1))
      assert(cells.contains(key), s"cell $key missing from the grid")
      val (cellR, cellN) = cells(key)
      assert(Option(r.get(2)) == cellR,
        s"$key: a3 r=${r.get(2)} vs grid r=$cellR")
      assert(r.getLong(3) == cellN, s"$key: n mismatch")
      // the one rows-only column: a valid probability wherever defined
      if (r.get(4) != null) {
        val p = r.getDouble(4)
        assert(p >= 0.0 && p <= 1.0, s"$key: p_value out of range: $p")
      }
    }
  }
}
