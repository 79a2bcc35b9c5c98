package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Flat-market degenerate fixture for the indicator family: a series
  * whose price never moves (every value identical, volume constant)
  * hits every zero-denominator arm at once — RSI's zero average loss,
  * CCI's zero mean deviation, stochastic's flat envelope, CMO's zero
  * up+down sum, ADX's zero true range, Aroon/Donchian's degenerate
  * extremes. Spark 4 ANSI throws on ANY division by zero (doubles
  * included), so every one of these arms needs a guard the natural
  * corpus never exercises. The spec runs EVERY W-family query over
  * the flat fixture and asserts none throws — the per-indicator
  * degenerate semantics (NULL vs 0 vs dropped row) stay documented at
  * each operator; this is the family-wide ANSI crash screen. */
class WindowsDegenerateSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private lazy val flatDir: String = {
    import spark.implicits._
    val d = graft.SparkTestSession.fixtureDir("w-flat")
    // 40 consecutive days × 2 types × 3 intraday events: enough rows
    // for every lookback window in the family (up to W47's 14+11)
    val rows = for {
      day <- 1 to 40
      t <- Seq("click", "purchase")
      i <- 0 until 3
    } yield (day.toLong * 100 + i,
      java.sql.Timestamp.valueOf(f"2024-01-${(day % 28) + 1}%02d " +
        f"${8 + i}%02d:00:00").toString, t)
    rows.zipWithIndex.map { case ((id, _, t), idx) =>
      // strictly increasing timestamps across the whole span
      (id + idx, new java.sql.Timestamp(1704067200000L +
        idx.toLong * 3600000L), idx.toLong % 7, t, 5.0, "{\"k\": 10}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    // flat-revenue orders for w7 (one constant-price order per day)
    (1 to 40).map { day =>
      (day.toLong, day.toLong % 5, "F", 100.0,
        new java.sql.Timestamp(1704067200000L + day.toLong * 86400000L),
        "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  test("every W-family query survives a flat market without an ANSI throw") {
    val wQueries = Windows.queries.keys.toSeq.sorted
    assert(wQueries.nonEmpty)
    val failures = wQueries.flatMap { name =>
      try { Windows.queries(name)(spark, flatDir).collect(); None }
      catch { case e: Throwable =>
        Some(name -> e.getMessage.linesIterator.take(1).mkString) }
    }
    assert(failures.isEmpty,
      "flat-market ANSI crashes:\n" + failures.map { case (n, m) =>
        s"  $n: $m" }.mkString("\n"))
  }
}
