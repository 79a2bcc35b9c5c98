package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy anchors for the round-14 closed-form p-value chains: the
  * PinnedSeries erfc/χ² series must track the quadrature-validated
  * [[graft.functions.StudentT]] kernel (itself golden-tested against
  * scipy in StudentTSpec) everywhere the 6-dp reporting grid can see.
  */
class PinnedSeriesSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  test("erfc series tracks the kernel's chi-sq(1) identity on a z sweep") {
    import spark.implicits._
    // two-sided normal p of z: kernel = Q(1/2, z²/2); dense sweep
    // through the cut at |z|/√2 = 3.6 (z ≈ 5.091)
    val zs = (BigDecimal(0.0) to BigDecimal(6.0) by BigDecimal(0.037))
      .map(_.toDouble)
    val got = zs.toDF("z")
      .select(col("z"), PinnedSeries.normalTwoSidedCol(col("z")).as("p"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    zs.foreach { z =>
      val kernel = graft.functions.StudentT.chiSqPValue(z * z, 1.0)
      val p = got(z)
      assert(p >= 0.0 && p <= 1.0, s"z=$z p=$p out of range")
      if (kernel < 5e-7)
        assert(p <= 5e-7, s"z=$z beyond-cut p=$p must be sub-grid")
      else
        assert(math.abs(p - kernel) <= 1e-11,
          s"z=$z series $p vs kernel $kernel")
    }
  }

  test("chi-sq series tracks the kernel for every df 1..48 across stats") {
    import spark.implicits._
    val cases = for {
      df <- 1 to 2 * PinnedSeries.MaxHalfDf
      x <- Seq(0.0, 0.3, 1.0, df * 0.5, df * 1.0, df * 2.0, df * 5.0,
        1600.0)
    } yield (x, df.toDouble)
    val got = cases.toDF("x", "df")
      .select(col("x"), col("df"),
        PinnedSeries.chiSqPCol(col("x"), col("df")).as("p"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    cases.foreach { case (x, df) =>
      val kernel = graft.functions.StudentT.chiSqPValue(x, df)
      val p = got((x, df))
      assert(p >= 0.0 && p <= 1.0 + 1e-12, s"x=$x df=$df p=$p")
      if (kernel < 5e-7)
        assert(p <= 1e-6, s"x=$x df=$df tail p=$p must be sub-grid")
      else
        // the odd-df branch carries the erfc cut's ≤ 5e-7 absolute
        // truncation; even df is exact to series precision
        assert(math.abs(p - kernel) <= (if (df % 2 == 0) 1e-10 else 5e-7),
          s"x=$x df=$df series $p vs kernel $kernel")
    }
  }

  test("chi-sq series is NULL outside its integer-df contract") {
    import spark.implicits._
    val rows = Seq((3.0, 0.0), (3.0, -2.0), (3.0, 49.0), (3.0, 2.5))
      .toDF("x", "df")
      .select(PinnedSeries.chiSqPCol(col("x"), col("df")).as("p"))
      .collect()
    assert(rows.forall(_.isNullAt(0)),
      "df outside [1, 48] or non-integer must yield NULL")
  }
}
