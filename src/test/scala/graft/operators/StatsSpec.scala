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
