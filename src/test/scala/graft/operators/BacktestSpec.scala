package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Hand-computed fixtures + invariants for the sequential portfolio
  * fold (reference `scripts/07_backtest.py:37-164`): entry sizing,
  * stop-loss / take-profit / hold-period / end-of-backtest exits,
  * no re-entry while held, the maxPositions cap, and the cash ↔ pnl
  * accounting identity (SURVEY §7.3 invariants).
  */
class BacktestSpec extends AnyFunSuite {
  import Backtest._
  import BacktestConfig.Default.{initialCash, positionFrac, maxPositions,
    holdDays, cost, slippage}

  private def day(i: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00")

  private def row(d: Int, key: Long, signal: String, price: Double) =
    DayRow(day(d), key, signal, price)

  private def runFold(rows: DayRow*): Seq[OutRow] = fold(rows.iterator).toSeq

  test("stop-loss exit: exact entry sizing, pnl, and equity accounting") {
    val out = runFold(row(0, 1, "BUY", 100.0), row(1, 1, "HOLD", 90.0))
    val trades = out.filter(_.kind == "trade")
    val equity = out.filter(_.kind == "equity")
    assert(trades.size == 1 && equity.size == 2)

    // hand-computed: px = 100·(1+0.0005); alloc = 10000·0.8;
    // shares = alloc / (px·(1+0.001)); cash after entry = 2000 exactly.
    val px = 100.0 * (1 + slippage)
    val shares = initialCash * positionFrac / (px * (1 + cost))
    val t = trades.head
    assert(t.exitReason == "stop_loss" && t.daysHeld == 1)
    assert(math.abs(t.entryPrice - px) < 1e-12)
    assert(math.abs(t.shares - shares) < 1e-12)
    val exitPx = 90.0 * (1 - slippage)
    val proceeds = shares * exitPx * (1 - cost)
    val expectedPnl = proceeds - shares * px
    assert(math.abs(t.pnl - expectedPnl) < 1e-5, s"pnl=${t.pnl}")
    assert(t.pnl < 0)

    // day-0 equity: cash 2000 + shares marked at raw close 100.
    assert(math.abs(equity.head.equity - (2000.0 + shares * 100.0)) < 1e-5)
    assert(math.abs(equity.head.cash - 2000.0) < 1e-6)
    assert(equity.head.numPositions == 1)
    // day-1 equity: all cash after the exit, no open positions.
    assert(math.abs(equity(1).equity - (2000.0 + proceeds)) < 1e-5)
    assert(equity(1).numPositions == 0)
  }

  test("take-profit exit fires at +20% of entry price") {
    val out = runFold(row(0, 1, "BUY", 100.0), row(1, 1, "HOLD", 125.0))
    val t = out.filter(_.kind == "trade").head
    assert(t.exitReason == "take_profit" && t.pnl > 0)
  }

  test("hold-period exit after holdDays flat days") {
    val rows = (0 to 6).map(d => row(d, 1, if (d == 0) "BUY" else "HOLD", 100.0))
    val trades = runFold(rows: _*).filter(_.kind == "trade")
    assert(trades.size == 1)
    assert(trades.head.exitReason == "hold_period")
    assert(trades.head.daysHeld == holdDays)
  }

  test("no re-entry while a position is held") {
    val rows = (0 to 3).map(d => row(d, 1, "BUY", 100.0))
    val out = runFold(rows: _*)
    // one position for the whole run → exactly one trade at force-close
    // … unless hold/stop fires first; at flat prices only hold can, at
    // day 5 — beyond this 4-day run, so the single exit is end-of-run.
    val trades = out.filter(_.kind == "trade")
    assert(trades.size == 1)
    assert(out.filter(_.kind == "equity").forall(_.numPositions <= 1))
  }

  test("maxPositions cap holds with more BUY signals than slots") {
    val rows = (1L to 6L).map(k => row(0, k, "BUY", 100.0))
    val out = runFold(rows: _*)
    assert(out.filter(_.kind == "equity").forall(_.numPositions <= maxPositions))
    assert(out.filter(_.kind == "equity").head.numPositions == maxPositions)
    // force-close emits exactly maxPositions trades
    assert(out.count(_.kind == "trade") == maxPositions)
  }

  test("accounting identity: final cash = initial + Σpnl − cost·Σbasis") {
    // a volatile multi-key run exercising all exit paths
    val prices = Map(
      1L -> Seq(100.0, 94.0, 99.0, 101.0, 103.0, 104.0, 100.0),
      2L -> Seq(50.0, 55.0, 61.0, 64.0, 60.0, 59.0, 58.0),
      3L -> Seq(200.0, 201.0, 199.0, 203.0, 202.0, 204.0, 205.0))
    val rows = for {
      d <- 0 to 6; (k, ps) <- prices.toSeq
    } yield row(d, k, if (d % 2 == 0) "BUY" else "HOLD", ps(d))
    val out = runFold(rows: _*)
    val trades = out.filter(_.kind == "trade")
    assert(trades.nonEmpty)
    val sumPnl = trades.map(_.pnl).sum
    val sumBasis = trades.map(t => t.shares * t.entryPrice).sum
    // Δcash = Σ(proceeds − alloc) = Σpnl − cost·Σbasis (alloc = basis·(1+cost))
    val lastCash = out.filter(_.kind == "equity").last.cash +
      trades.filter(_.exitReason == "end_of_backtest")
        .map(t => t.shares * t.exitPrice * (1 - cost)).sum
    assert(math.abs(lastCash - (initialCash + sumPnl - cost * sumBasis)) < 1e-3,
      s"cash=$lastCash pnl=$sumPnl basis=$sumBasis")
    // every day: position count within cap, cash non-negative
    val eq = out.filter(_.kind == "equity")
    assert(eq.forall(e => e.numPositions <= maxPositions && e.cash >= -1e-9))
  }

  test("exit-price slippage and cost are applied on both legs") {
    val out = runFold(row(0, 1, "BUY", 100.0), row(1, 1, "HOLD", 125.0))
    val t = out.filter(_.kind == "trade").head
    assert(math.abs(t.exitPrice - 125.0 * (1 - slippage)) < 1e-12)
    // naive pnl without frictions would be shares·25; actual is less
    val naive = t.shares * 25.0
    assert(t.pnl < naive)
  }

  test("Hold24 variant moves the hold-period exit from day 5 to day 24") {
    // the parameterized re-run the reference ships as
    // trades/HOLDING_PERIOD_24/: on a flat 30-day path the ONLY
    // config-sensitive exit is the holding period, so the two configs
    // must produce the same single trade at different ages.
    val rows = (0 to 29).map(d => row(d, 1, if (d == 0) "BUY" else "HOLD", 100.0))
    val d5 = fold(rows.iterator).toSeq.filter(_.kind == "trade")
    val h24 = fold(rows.iterator, BacktestConfig.Hold24).toSeq
      .filter(_.kind == "trade")
    assert(d5.size == 1 && d5.head.exitReason == "hold_period" &&
           d5.head.daysHeld == holdDays)
    assert(h24.size == 1 && h24.head.exitReason == "hold_period" &&
           h24.head.daysHeld == BacktestConfig.Hold24.holdDays)
    // flat price + frictions: both exits realize the same (small) loss
    assert(math.abs(d5.head.pnl - h24.head.pnl) < 1e-9)
  }

  test("t7_trade_metrics equals an independent recomputation of the fold") {
    // the fold itself is golden/invariant-tested above; this anchors
    // the rows-only METRIC block on real testdata by recomputing every
    // aggregate from the fold's own trade rows in plain Scala.
    val spark = graft.SparkTestSession.spark
    val sf = graft.SparkTestSession.Sf0001
    val pnls = Backtest.queries("t7_portfolio_fold")(spark, sf).collect()
      .filter(_.getString(0) == "trade").map(_.getAs[Double]("pnl"))
    assert(pnls.nonEmpty, "vacuous: no trades at sf0.001")
    val m = Backtest.queries("t7_trade_metrics")(spark, sf).collect().head
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val wins = pnls.filter(_ > 0); val losses = pnls.filter(_ <= 0)
    assert(m.getLong(0) == pnls.length, "n_trades")
    assert(m.getLong(1) == wins.length, "wins")
    // pnl values are 1e-6-rounded by the fold, so count/extreme/total
    // aggregates snap to the same grid regardless of summation order;
    // the averages divide off the grid, so compare within one grid step
    if (wins.nonEmpty)
      assert(math.abs(m.getDouble(2) - r6(wins.sum / wins.length)) <= 1e-6,
        "avg_win")
    if (losses.nonEmpty)
      assert(math.abs(m.getDouble(3) - r6(losses.sum / losses.length)) <= 1e-6,
        "avg_loss")
    assert(m.getDouble(4) == r6(pnls.max), "largest_win")
    assert(m.getDouble(5) == r6(pnls.min), "largest_loss")
    assert(m.getDouble(6) == r6(pnls.sum), "total_pnl")
  }
}
