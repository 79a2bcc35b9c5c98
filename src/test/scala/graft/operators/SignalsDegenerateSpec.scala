package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate screens for the Signals family (P8, PIPE11, PIPE12) —
  * the same family-wide ANSI crash discipline Windows/Stats/Text have:
  *  - FLAT corpus: constant value and constant k ⇒ corr variance 0 ⇒
  *    the inverse-flip config r is NULL for every key (the CASE arms
  *    must treat NULL as direct, not throw);
  *  - ONE-DAY corpus: every event on a single day ⇒ lead(horizon) is
  *    NULL everywhere ⇒ every PIPE12 cell is fully censored
  *    (n_scored = 0, NULL outcome columns — the no-scored-rows arms);
  *  - ZERO-PRICE corpus: value ≡ 0 ⇒ the daily mark price is 0 and
  *    the forward return is undefined — Spark 4 ANSI throws on ANY
  *    division by zero, so this exercises pipe12's p ≠ 0 guard
  *    directly.
  * Per-cell semantics stay pinned in SignalsSweepSpec; this is the
  * crash screen plus the grid-completeness invariant under each
  * degeneracy (27 cells must survive censoring).
  */
class SignalsDegenerateSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def eventsFixture(name: String,
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)])
      : String = {
    import spark.implicits._
    val d = graft.SparkTestSession.fixtureDir(name)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def days(n: Int, value: Double): Seq[
      (Long, java.sql.Timestamp, Long, String, Double, String)] =
    for {
      day <- 0 until n
      t <- Seq("click", "purchase")
      i <- 0 until 3
    } yield ((day * 10 + i).toLong * 10 + (if (t == "click") 0 else 1),
      new java.sql.Timestamp(1704067200000L + day.toLong * 86400000L +
        i.toLong * 3600000L),
      i.toLong, t, value, "{\"k\": 10}")

  private lazy val flatDir = eventsFixture("sig-flat", days(12, 5.0))
  private lazy val oneDayDir = eventsFixture("sig-oneday", days(1, 150.0))
  private lazy val zeroDir = eventsFixture("sig-zero", days(12, 0.0))
  // value 100.0 ⇒ sent = 0 exactly ⇒ inside every ±τ band ⇒ all HOLD
  private lazy val holdDir = eventsFixture("sig-hold", days(12, 100.0))

  private def screen(dir: String, label: String): Unit = {
    val failures = Signals.queries.keys.toSeq.sorted.flatMap { name =>
      try { Signals.queries(name)(spark, dir).collect(); None }
      catch { case e: Throwable =>
        Some(name -> e.getMessage.linesIterator.take(1).mkString) }
    }
    assert(failures.isEmpty,
      s"$label ANSI crashes:\n" + failures.map { case (n, m) =>
        s"  $n: $m" }.mkString("\n"))
  }

  test("every Signals query survives a flat corpus (corr variance 0)") {
    screen(flatDir, "flat")
    // flat value 5.0 ⇒ sent = −0.95 < −τ everywhere; NULL r must read
    // as direct ⇒ SELL, never an entry
    val sweep = Signals.queries("pipe11_strategy_sweep")(spark, flatDir)
      .collect()
    assert(sweep.length == 27)
    assert(sweep.forall(r => r.getLong(6) == 0L), "no entries on SELLs")
  }

  test("all-HOLD corpus: zero trades in every sweep cell, outcomes NULL") {
    // the round-13 verdict's screen extension: with every signal HOLD
    // the grid agg's hit-rate denominator sum(when(scored, 1.0)) is
    // NULL (never 0), so the whole surface must flow NULLs, not throw
    screen(holdDir, "all-hold")
    val sweep = Signals.queries("pipe11_strategy_sweep")(spark, holdDir)
      .collect()
    assert(sweep.length == 27)
    sweep.foreach { r =>
      assert(r.getLong(3) == 0L && r.getLong(4) == 0L,
        "no trades at sent = 0")
      assert(r.getLong(5) > 0L, "all mass must land in HOLD")
      assert(r.getLong(6) == 0L && r.getLong(7) == 0L)
    }
    val out = Signals.queries("pipe12_sweep_outcomes")(spark, holdDir)
      .collect()
    assert(out.length == 27)
    out.foreach { r =>
      assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
      assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7) &&
        r.isNullAt(8), "outcome columns must be NULL with no entries")
    }
  }

  test("one-day corpus: every PIPE12 cell fully censored, grid intact") {
    screen(oneDayDir, "one-day")
    val out = Signals.queries("pipe12_sweep_outcomes")(spark, oneDayDir)
      .collect()
    assert(out.length == 27)
    out.foreach { r =>
      assert(r.getLong(4) == 0L, "n_scored must be 0 with no forward day")
      assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7) &&
        r.isNullAt(8), "outcome columns must be NULL when censored")
    }
  }

  test("lag grid survives a flat corpus: every cell NULL-r, no throw") {
    // corrSafe makes every grid cell's correlation NULL on a flat
    // corpus (zero variance both sides); the downstream argmax /
    // config / artifact queries must ride the all-NULL grid without
    // an ANSI throw, and the grid keeps its full cell count
    LagGrid.grid.invalidate(spark, flatDir)
    val failures = LagGrid.queries.keys.toSeq.sorted.flatMap { name =>
      try { LagGrid.queries(name)(spark, flatDir).collect(); None }
      catch { case e: Throwable =>
        Some(name -> e.getMessage.linesIterator.take(1).mkString) }
    }
    assert(failures.isEmpty,
      "flat-grid ANSI crashes:\n" + failures.map { case (n, m) =>
        s"  $n: $m" }.mkString("\n"))
    val cells = LagGrid.queries("lag_grid_corr")(spark, flatDir).collect()
    assert(cells.nonEmpty && cells.forall(_.isNullAt(3)),
      "every flat-corpus cell correlation must be NULL")
  }

  test("zero-price corpus exercises the p != 0 forward-return guard") {
    screen(zeroDir, "zero-price")
    val out = Signals.queries("pipe12_sweep_outcomes")(spark, zeroDir)
      .collect()
    assert(out.length == 27)
    // price 0 ⇒ every forward return undefined ⇒ fully censored cells
    assert(out.forall(r => r.getLong(4) == 0L))
  }
}
