package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Replay of the reference's golden run B — its BEST-published shipped
  * backtest (`trades/trade_log_20260206_235717.csv` +
  * `trades/daily_equity_20260206_235717.csv`, summary
  * `trades/backtest_summary_20260206_235717.json`, headline at
  * `README.md:271-275`) — through the engine's 34-metric block: the
  * shipped trade log and equity curve ([[GoldenRunB]]) go through
  * [[Backtest.fullMetricsOf]] and every headline metric is pinned to
  * the PUBLISHED value — 25 trades, +24.60% total return ($124,601.51
  * final), Sharpe 0.647, Sortino 0.658, Calmar 0.467 (derived),
  * profit factor 1.48, max drawdown −29.45% over
  * 2025-02-04→2025-04-08 (63 days). Together with [[GoldenRunASpec]]
  * (a slightly-losing, all-stop-loss/hold-period run) this doubles the
  * independent anchors on the least oracle-checkable component: run B
  * exercises the arms A never reaches — take-profit and
  * end-of-backtest exits, a double-digit winning return, an 11-trade
  * loss streak, and a 100×-deeper drawdown window. */
class GoldenRunBSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def ts(day: String) = java.sql.Timestamp.valueOf(day + " 00:00:00")

  private lazy val metrics: Map[String, Any] = {
    import spark.implicits._
    val tradeRows = GoldenRunB.trades.map { case (day, key, pnl, held, why) =>
      Backtest.OutRow("trade", ts(day), key, 0.0, 0.0, 0.0, pnl, 0.0,
        why, held, 0.0, 0.0, 0)
    }
    val equityRows = GoldenRunB.equity.map { case (day, eq) =>
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
    assert(lng("n_trades") == 25L)
    assert(lng("wins") == 7L && lng("losses") == 18L)
    assert(dbl("win_rate") == 0.28)           // published 28.0 (%)
    assert(dbl("avg_win") == 10758.630862)    // 10758.630862293701
    assert(dbl("avg_loss") == -2827.130431)   // -2827.1304314572913
    assert(dbl("largest_win") == 21034.888723)  // 21034.888723220574
    assert(dbl("largest_loss") == -9713.238338) // -9713.2383384149
    assert(dbl("profit_factor") == 1.479915)  // 1.479914741622458
    assert(dbl("expectancy") == 976.882731)   // 976.8827307929864
    assert(dbl("avg_days_held") == 15.36)
    assert(lng("max_days_held") == 46L)
    // run B reaches the exit arms run A never does: 6 take-profits and
    // 2 end-of-backtest closes beside 17 stop-losses, 0 hold-period
    assert(lng("n_stop_loss") == 17L && lng("n_take_profit") == 6L &&
      lng("n_hold_period") == 0L && lng("n_end_close") == 2L)
    assert(lng("max_win_streak") == 4L && lng("max_loss_streak") == 11L)
  }

  test("equity/risk block matches the published summary") {
    assert(lng("n_days") == 522L)
    assert(dbl("final_equity") == 124601.50745)  // 124601.50745042652
    assert(dbl("total_return") == 0.246015)      // 0.2460150745042653
    assert(dbl("mean_daily") == 0.000512)        // 0.0005118457871438433
    assert(dbl("std_daily") == 0.0134)           // 0.01340023689794208
    // float32 columns: pin within float precision of the published
    // double (annual_return 0.13763567, annual_volatility 0.21272217,
    // sharpe_ratio 0.64702084, sortino_ratio 0.65751189)
    assert(math.abs(dbl("ann_return") - 0.13763567490285267) < 1e-6)
    assert(math.abs(dbl("ann_vol") - 0.21272216604783817) < 1e-6)
    assert(math.abs(dbl("sharpe") - 0.6470208415981453) < 1e-5)
    assert(math.abs(dbl("sortino") - 0.6575118910441614) < 1e-5)
    assert(dbl("max_drawdown") == -0.29448)      // -0.2944804529111328
    // calmar_ratio (0.46738475692438525) is published but not a fold
    // column — pin its definition on the fold's own outputs
    assert(math.abs(dbl("ann_return") / math.abs(dbl("max_drawdown")) -
      0.46738475692438525) < 1e-5)
  }

  test("max-drawdown period matches the published summary") {
    assert(metrics("max_dd_peak_date").toString == "2025-02-04")
    assert(metrics("max_dd_trough_date").toString == "2025-04-08")
    assert(lng("max_dd_duration_days") == 63L)
  }
}
