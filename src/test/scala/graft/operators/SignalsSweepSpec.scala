package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** PIPE11 — the strategy slider sweep (`pipe11_strategy_sweep`).
  * The DuckDB oracle certifies exact values; these invariants pin the
  * SHAPE of the response surface a dashboard reader relies on:
  * completeness of the grid, conservation of signal mass per cell,
  * and the two slider monotonicities (raising the news bar can only
  * add HOLDs; raising the sentiment bar can only remove trades).
  */
class SignalsSweepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf0001

  private lazy val rows =
    Signals.queries("pipe11_strategy_sweep")(spark, sf)
      .collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))

  test("the grid is complete: one row per (tau, min_news, lookback)") {
    val cells = rows.map { case (t, m, l, _, _, _, _, _) => (t, m, l) }.toSet
    val expected = (for {
      t <- Signals.SweepTaus; m <- Signals.SweepMinNews
      l <- Signals.SweepLookbacks
    } yield (t, m, l)).toSet
    assert(cells == expected)
  }

  test("signal mass is conserved: buy+sell+hold constant per lookback") {
    // every cell of a lookback classifies the SAME (key, day) rows
    rows.groupBy(_._3).foreach { case (_, cells) =>
      val masses = cells.map { case (_, _, _, b, s, h, _, _) => b + s + h }
      assert(masses.toSet.size == 1, masses.mkString(","))
      assert(masses.head > 0)
    }
  }

  test("raising min_news only converts trades to HOLDs") {
    for {
      t <- Signals.SweepTaus; l <- Signals.SweepLookbacks
      sorted = rows.filter(r => r._1 == t && r._3 == l).sortBy(_._2)
      Array(lo, hi) <- sorted.map(_._6).sliding(2).map(_.toArray)
    } assert(lo <= hi, s"n_hold not monotone in min_news at tau=$t l=$l")
  }

  test("raising tau only removes trade signals") {
    for {
      m <- Signals.SweepMinNews; l <- Signals.SweepLookbacks
      sorted = rows.filter(r => r._2 == m && r._3 == l).sortBy(_._1)
      Array(lo, hi) <- sorted.map(c => c._4 + c._5).sliding(2).map(_.toArray)
    } assert(lo >= hi, s"trades not antitone in tau at m=$m l=$l")
  }

  test("pipe12 outcomes agree with pipe11's entry counts per cell") {
    // the two queries share sweepSignals — a drift in the refactor
    // would show up as diverging n_entries on the same corpus
    val p11 = rows.map { case (t, m, l, _, _, _, e, _) => (t, m, l) -> e }
      .toMap
    val out = Signals.queries("pipe12_sweep_outcomes")(spark, sf).collect()
    assert(out.length == p11.size)
    out.foreach { r =>
      val cell = (r.getDouble(0), r.getInt(1), r.getInt(2))
      val (entries, scored) = (r.getLong(3), r.getLong(4))
      assert(entries == p11(cell), s"entry drift at $cell")
      assert(scored <= entries)
      if (scored > 0) {
        val (avg, best, worst) =
          (r.getDouble(5), r.getDouble(7), r.getDouble(8))
        val hit = r.getDouble(6)
        assert(hit >= 0.0 && hit <= 1.0, s"hit_rate $hit at $cell")
        assert(worst <= avg + 1e-9 && avg <= best + 1e-9,
          s"ordering $worst/$avg/$best at $cell")
      } else {
        assert(r.isNullAt(5) && r.isNullAt(6), s"unscored cell $cell")
      }
    }
    // non-vacuous: at least one cell actually scores entries
    assert(out.exists(r => r.getLong(4) > 0))
  }

  test("the tau=0.4/min_news=7 sweep cell equals a single-point P8 run") {
    // the reference's published single-point counts anchor P8
    // (docs/imp_numbers.txt:324-333 — 95/202/27 of 324 at τ=0.4);
    // this ties the sweep surface to that anchor: the sweep's
    // (0.4, 7, lookback=1) cell must reproduce exactly what the P8
    // pipeline reports when RUN at that slider point on the same
    // frame (lookback=1 IS the P8 path — plain daily sentiment, no
    // trailing window), so the 27-cell surface and the single-point
    // query can never drift apart
    val cell = rows.filter(r => r._1 == 0.4 && r._2 == 7 && r._3 == 1)
    assert(cell.length == 1)
    val (_, _, _, b, sl, h, _, _) = cell.head
    val p8 = Signals.pipeline(spark, sf, SignalConfig(0.4, 7))
      .groupBy("signal").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p8.getOrElse("BUY", 0L) == b && p8.getOrElse("SELL", 0L) == sl &&
      p8.getOrElse("HOLD", 0L) == h, s"sweep ($b,$sl,$h) vs p8 $p8")
    assert(b + sl + h == p8.values.sum)
  }

  test("entries are BUY transitions: n_entries <= n_buy, keys bounded") {
    val nKeys = graft.Tables.events(spark, sf)
      .select("event_type").distinct().count()
    rows.foreach { case (t, m, l, b, _, _, e, k) =>
      assert(e <= b, s"entries > buys at ($t,$m,$l)")
      assert(k <= nKeys && (e == 0 || k >= 1))
    }
  }
}
