package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Timestamp

/** Property-based invariants for the portfolio fold under random
  * market paths (SURVEY §7.3): for ANY day/price/signal sequence —
  *  - cash never goes negative and positions never exceed the cap,
  *  - per key, exits arrive in day order (no overlapping holdings),
  *  - every trade's exit reason is one of the four defined,
  *  - the accounting identity Δcash = Σpnl − cost·Σbasis holds.
  * Scenarios come from seeded ScalaCheck generators (deterministic —
  * no wall-clock randomness), sampled 200×.
  */
class BacktestPropSpec extends AnyFunSuite {
  import Backtest._
  import BacktestConfig.Default.{initialCash, maxPositions, cost}

  private def day(i: Int): Timestamp =
    new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
      i * 86400000L)

  private val genScenario: Gen[Seq[DayRow]] = for {
    nDays <- Gen.choose(1, 25)
    nKeys <- Gen.choose(1, 6)
    cells <- Gen.listOfN(nDays * nKeys,
      Gen.zip(Gen.choose(1.0, 300.0), Gen.oneOf("BUY", "SELL", "HOLD")))
  } yield cells.zipWithIndex.map { case ((price, signal), i) =>
    DayRow(day(i / nKeys), (i % nKeys + 1).toLong, signal, price)
  }

  test("fold invariants hold on 200 random market paths") {
    var seed = Seed(42L)
    for (_ <- 1 to 200) {
      val rows = genScenario.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val out = fold(rows.iterator).toSeq
      val equity = out.filter(_.kind == "equity")
      val trades = out.filter(_.kind == "trade")

      // one equity row per distinct day, in order
      assert(equity.map(_.day.getTime) ==
        rows.map(_.day.getTime).distinct.sorted)
      // cash ≥ 0 and the position cap respected every day
      assert(equity.forall(e => e.cash >= -1e-6))
      assert(equity.forall(_.numPositions <= maxPositions))
      // defined exit reasons only; holding periods non-negative
      val reasons = Set("stop_loss", "take_profit", "hold_period",
        "end_of_backtest")
      assert(trades.forall(t => reasons.contains(t.exitReason)))
      assert(trades.forall(_.daysHeld >= 0))
      // per key, exits arrive in day order (no overlapping holdings)
      trades.groupBy(_.key).foreach { case (_, ts) =>
        val exitDays = ts.map(_.day.getTime)
        assert(exitDays == exitDays.sorted)
      }
      // accounting identity (force-closed proceeds land after the
      // last equity row)
      val sumPnl = trades.map(_.pnl).sum
      val sumBasis = trades.map(t => t.shares * t.entryPrice).sum
      val finalCash = equity.lastOption.map(_.cash).getOrElse(initialCash) +
        trades.filter(_.exitReason == "end_of_backtest")
          .map(t => t.shares * t.exitPrice * (1 - cost)).sum
      assert(math.abs(finalCash - (initialCash + sumPnl - cost * sumBasis))
        < 1e-2, s"cash=$finalCash pnl=$sumPnl basis=$sumBasis")
    }
  }
}
