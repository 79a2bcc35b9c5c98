package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.functions.StudentT

/** Anchors the pinned-iteration incomplete-beta chain (the round-14
  * flip of the last four p-value twins) to the quadrature-validated
  * early-exit kernel: running the Lentz fraction a fixed 200
  * iterations instead of exiting at convergence may only drift the
  * product by post-convergence del ≈ 1 factors — measured ≤ ~1e-13
  * absolute over the full parameter range the queries feed it
  * (a = half-df up to 2500, b down to the t-family's 0.5, fractional
  * Welch df included). Cross-engine bit-parity of the chain itself is
  * proven by the driver hash checks at all three SFs.
  */
class PinnedBetaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Tol = 1e-9

  test("betainc chain tracks the kernel across the (a, b, x) range") {
    val cases = for {
      a <- Seq(0.5, 0.75, 1.0, 2.5, 12.34, 50.0, 125.0, 913.0, 2500.0)
      b <- Seq(0.5, 1.0, 2.0, 3.5, 50.0)
      x <- Seq(1e-9, 0.001, 0.1, 0.5, 0.9, 0.999, 1.0 - 1e-9)
    } yield (a, b, x)
    val got = cases.toDF("a", "b", "x")
      .select(col("a"), col("b"), col("x"),
        PinnedBeta.betaincCol(col("a"), col("b"), col("x")).as("p"))
      .collect()
    got.foreach { r =>
      val (a, b, x, p) = (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))
      val want = StudentT.betainc(a, b, x)
      assert(math.abs(p - want) <= Tol,
        s"I_$x($a,$b): chain=$p kernel=$want")
      assert(p >= 0.0 && p <= 1.0, s"I_$x($a,$b) out of range: $p")
    }
  }

  test("t wrapper matches tPValue, fractional Welch df included") {
    val cases = for {
      df <- Seq(1.0, 2.0, 7.0, 13.37, 48.0, 123.456, 1826.0, 5000.0)
      t <- Seq(0.0, 0.37, 1.0, 2.5, 10.0, -3.2)
    } yield (t, df)
    val got = cases.toDF("t", "df")
      .select(col("t"), col("df"),
        PinnedBeta.tTwoSidedPCol(col("t"), col("df")).as("p"))
      .collect()
    got.foreach { r =>
      val (t, df, p) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      val want = StudentT.tPValue(t, df)
      assert(math.abs(p - want) <= Tol, s"t=$t df=$df: $p vs $want")
    }
  }

  test("F wrapper matches fPValue over (d1, d2, f)") {
    val cases = for {
      d1 <- Seq(1.0, 2.0, 3.0, 4.0, 7.0)
      d2 <- Seq(5.0, 37.0, 250.0, 2993.0)
      f <- Seq(0.0, 0.3, 1.0, 4.9646, 25.0)
    } yield (f, d1, d2)
    val got = cases.toDF("f", "d1", "d2")
      .select(col("f"), col("d1"), col("d2"),
        PinnedBeta.fUpperPCol(col("f"), col("d1"), col("d2")).as("p"))
      .collect()
    got.foreach { r =>
      val (f, d1, d2, p) = (r.getDouble(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3))
      val want = StudentT.fPValue(f, d1, d2)
      assert(math.abs(p - want) <= Tol, s"F($d1,$d2) at $f: $p vs $want")
    }
  }

  test("pearson wrapper matches pValue; edges resolve without the chain") {
    val cases = for {
      r <- Seq(-0.999999, -0.5, -0.000001, 0.0, 0.123456, 0.9, 0.999999)
      n <- Seq(3L, 10L, 365L, 3650L)
    } yield (r, n)
    val got = cases.toDF("r", "n")
      .select(col("r"), col("n"),
        PinnedBeta.pearsonPCol(col("r"), col("n")).as("p"))
      .collect()
    got.foreach { row =>
      val (r, n, p) = (row.getDouble(0), row.getLong(1), row.getDouble(2))
      val want = StudentT.pValue(r, n)
      assert(math.abs(p - want) <= Tol, s"r=$r n=$n: $p vs $want")
    }
    // the guarded edges: |r| >= 1 pins 0.0, n < 3 and NULL r give NULL
    val edges = Seq((Some(1.0), 100L), (Some(-1.0), 100L),
      (Some(0.5), 2L), (None: Option[Double], 100L))
      .toDF("r", "n")
      .select(PinnedBeta.pearsonPCol(col("r"), col("n")).as("p"))
      .collect()
    assert(edges(0).getDouble(0) == 0.0 && edges(1).getDouble(0) == 0.0)
    assert(edges(2).isNullAt(0) && edges(3).isNullAt(0))
  }

  test("flipped queries carry chain p on their oracle-checked stats") {
    val sf = graft.SparkTestSession.Sf0001
    // a52/a74: p recomputed from the kernel at the query's own
    // rounded (stat, d1, d2) — one 6-dp grid step is the bound
    Seq("a52_anova_pvalue" -> StudentT.fPValue _,
        "a74_levene_pvalue" -> StudentT.fPValue _).foreach {
      case (q, kern) =>
        val row = Stats.queries(q)(spark, sf).head()
        if (!row.isNullAt(3)) {
          val want = kern(row.getDouble(0), row.getDouble(1),
            row.getDouble(2))
          assert(math.abs(row.getDouble(3) - want) <= 1e-6 + 1e-9,
            s"$q: ${row.getDouble(3)} vs kernel $want")
        }
    }
    val a3 = Stats.queries("a3_corr_pvalue")(spark, sf).collect()
    assert(a3.nonEmpty)
    a3.filter(r => !r.isNullAt(4)).foreach { r =>
      val want = StudentT.pValue(r.getDouble(2), r.getLong(3))
      assert(math.abs(r.getDouble(4) - want) <= 1e-6 + 1e-9,
        s"a3 ${r.getString(0)}/${r.getInt(1)}: ${r.getDouble(4)} vs $want")
    }
  }
}
