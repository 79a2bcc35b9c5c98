package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Replay of the reference's golden run A (`trades/HOLDING_PERIOD_24/`,
  * summary `backtest_summary_20260206_201756.json`, rendered at
  * `docs/imp_numbers.txt:396-425`) through the engine's 34-metric
  * block: the SHIPPED trade log and daily equity curve ([[GoldenRunA]])
  * go through [[Backtest.fullMetricsOf]] and every headline metric is
  * pinned to the PUBLISHED value — 24 trades, −1.46% total return,
  * Sharpe −0.42, Sortino −0.19, max drawdown −2.68% over
  * 2024-01-02→2024-03-06 (64 days). This is the strongest available
  * end-to-end convergence evidence for the metrics block: the inputs
  * are the reference's own committed outputs, not engine-shaped
  * fixtures. (The raw price/signal series behind the run is not
  * shipped by the reference, so the FOLD is anchored separately by
  * BacktestSpec's goldens; this spec anchors everything downstream of
  * the fold on real reference data.) */
class GoldenRunASpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def ts(day: String) = java.sql.Timestamp.valueOf(day + " 00:00:00")

  private lazy val metrics: Map[String, Any] = {
    import spark.implicits._
    val tradeRows = GoldenRunA.trades.map { case (day, key, pnl, held, why) =>
      Backtest.OutRow("trade", ts(day), key, 0.0, 0.0, 0.0, pnl, 0.0,
        why, held, 0.0, 0.0, 0)
    }
    val equityRows = GoldenRunA.equity.map { case (day, eq) =>
      Backtest.OutRow("equity", ts(day), -1L, 0.0, 0.0, 0.0, 0.0, 0.0,
        "", 0, eq, 0.0, 0)
    }
    val out = (tradeRows ++ equityRows).toDF()
    val row = Backtest.fullMetricsOf(out, initialCash = 100000.0).head()
    row.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> row.get(i) }
      .toMap
  }

  private def dbl(name: String): Double = metrics(name) match {
    case d: Double => d
    case f: Float  => f.toDouble
    case x         => fail(s"$name is ${x.getClass}")
  }
  private def lng(name: String): Long = metrics(name) match {
    case l: Long => l
    case i: Int  => i.toLong
    case x       => fail(s"$name is ${x.getClass}")
  }

  test("trade block matches the published summary") {
    assert(lng("n_trades") == 24L)
    assert(lng("wins") == 12L && lng("losses") == 12L)
    assert(dbl("win_rate") == 0.5)
    assert(dbl("avg_win") == 313.607848)      // 313.60784831590627
    assert(dbl("avg_loss") == -435.521989)    // -435.5219887705921
    assert(dbl("largest_win") == 593.991343)  // 593.9913433953643
    assert(dbl("largest_loss") == -669.462283) // -669.4622828002448
    assert(dbl("profit_factor") == 0.720074)  // 0.7200735127086703
    assert(dbl("expectancy") == -60.95707)    // -60.95707022734291
    assert(dbl("avg_days_held") == 4.583333)  // 4.583333333333333
    assert(lng("max_days_held") == 5L)
    assert(lng("n_stop_loss") == 6L && lng("n_hold_period") == 18L &&
      lng("n_take_profit") == 0L && lng("n_end_close") == 0L)
    assert(lng("max_win_streak") == 3L && lng("max_loss_streak") == 3L)
  }

  test("equity/risk block matches the published summary") {
    assert(lng("n_days") == 522L)
    assert(dbl("final_equity") == 98537.030315) // 98537.03031454378
    assert(dbl("total_return") == -0.01463)     // -0.014629696854562169
    assert(dbl("mean_daily") == -0.000027)      // -2.720598121445706e-05
    assert(dbl("std_daily") == 0.001033)        // 0.0010330630131695842
    // float32 columns: pin within float precision of the published
    // double (ann_return -0.00683255, ann_vol 0.01639937,
    // sharpe -0.41663509, sortino -0.19341600)
    assert(math.abs(dbl("ann_return") - -0.00683255177576636) < 1e-6)
    assert(math.abs(dbl("ann_vol") - 0.016399366929034584) < 1e-6)
    assert(math.abs(dbl("sharpe") - -0.416635093618738) < 1e-5)
    assert(math.abs(dbl("sortino") - -0.19341600205498136) < 1e-5)
    assert(dbl("max_drawdown") == -0.026764)    // -0.026764126077025274
  }

  test("max-drawdown period matches the published summary") {
    assert(metrics("max_dd_peak_date").toString == "2024-01-02")
    assert(metrics("max_dd_trough_date").toString == "2024-03-06")
    assert(lng("max_dd_duration_days") == 64L)
  }
}
