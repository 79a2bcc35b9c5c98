package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Signal generation: threshold predicates (P5), the conditional
  * BUY/SELL/HOLD CASE expression with inverse-flip on correlation sign
  * (P8), and the per-key config broadcast join (J5).
  *
  * Reference: `scripts/06_strategy_signals.py:88-150` — per-ticker best
  * lag config is applied to every daily sentiment row; sentiment above
  * +τ with enough news ⇒ BUY (direct) or SELL (inverse when the
  * fitted correlation is negative), below −τ the reverse, else HOLD.
  *
  * Scale: the config side is a per-key aggregate (|keys| rows) —
  * explicitly `broadcast()` so the fact side never shuffles for the
  * join; the daily aggregate before it is map-side combinable.
  */
/** Signal thresholds — the reference dashboard's slider parameters
  * (`config/stock_universe.py:26-28`: SENTIMENT_THRESHOLD,
  * MIN_NEWS_COUNT), rewritten into the config source file by
  * `app/experiment.py:252-285` before each re-run. Here they are plain
  * parameters driving the same lazy plan. */
final case class SignalConfig(tau: Double, minNews: Int)

object SignalConfig {
  /** The shipped default thresholds. */
  val Default = SignalConfig(0.1, 5)
  /** Higher-bar re-run: trade only strong, well-evidenced days. */
  val Strict = SignalConfig(0.5, 60)
}

object Signals {

  private def r6(c: Column): Column = round(c, 6)

  /** The P5+P8+J5 pipeline under a given threshold config. */
  def pipeline(s: SparkSession, d: String,
               cfg: SignalConfig = SignalConfig.Default): DataFrame = {
    val ev = Tables.events(s, d)
    // J5 config side: per-key correlation (sign drives the flip).
    val keyCfg = ev
      .select(col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("double").as("k"))
      .groupBy(col("event_type"))
      .agg(corr(col("value"), col("k")).as("r"))
    // Daily sentiment-like aggregate per key.
    val dailyAgg = ev
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(avg(col("value")).as("avg_v"), count(lit(1)).as("n"))
      .withColumn("sent", col("avg_v") / 100.0 - 1)
    val inverse = col("r") < 0
    // P5 threshold gates + P8 nested CASE with inverse flip.
    val signal =
      when(col("n") < cfg.minNews, "HOLD")
        .when(col("sent") > cfg.tau, when(inverse, "SELL").otherwise("BUY"))
        .when(col("sent") < -cfg.tau, when(inverse, "BUY").otherwise("SELL"))
        .otherwise("HOLD")
    dailyAgg.join(broadcast(keyCfg), Seq("event_type"))
      .select(col("event_type"), col("day"), r6(col("sent")).as("sent"),
        col("n"), signal.as("signal"),
        when(inverse, "inverse").otherwise("direct").as("signal_type"))
      .orderBy("event_type", "day")
  }

  /** PIPE11 — the dashboard's slider sweep as ONE plan. The reference
    * re-runs signal generation + backtest per slider change
    * (`app/experiment.py:252-325` rewrites SENTIMENT_THRESHOLD /
    * MIN_NEWS_COUNT / LOOKBACK_HOURS into `config/stock_universe.py`
    * and shells out to scripts 06+07, ≤300 s budget per point); this
    * query computes the whole (τ × min_news × lookback) response
    * surface — signal counts and position-entry counts per cell — in
    * one declarative plan, the Spark-native answer to that re-query
    * loop.
    *
    * Scale shape: ONE hash agg over the fact table (daily per-key
    * sums, decimal-pinned so both engines see bit-identical sentiment
    * at every threshold comparison), then three constant-frame
    * trailing windows over the O(keys × days) daily rows (range
    * frames must be plan constants, so lookbacks are union branches,
    * not an exploded column), a 9-row broadcast grid multiply — the
    * `grid_build` pattern — and partition-parallel lag windows per
    * (key, cell). The fact table is scanned once regardless of grid
    * size; everything after the first agg is O(keys × days × |grid|).
    */
  val SweepTaus: Seq[Double] = Seq(0.1, 0.25, 0.4)
  val SweepMinNews: Seq[Int] = Seq(2, 5, 7)
  val SweepLookbacks: Seq[Int] = Seq(1, 3, 7)

  def strategySweep(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val keyCfg = ev
      .select(col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("double").as("k"))
      .groupBy(col("event_type"))
      .agg(corr(col("value"), col("k")).as("r"))
    val daily = ev
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("sum_v"),
        count(lit(1)).as("n"))
      .withColumn("day_idx",
        datediff(to_date(col("day")), to_date(lit("1970-01-01"))))
    val trailing = SweepLookbacks.map { l =>
      val w = Window.partitionBy("event_type").orderBy("day_idx")
        .rangeBetween(-(l - 1), 0)
      daily.select(col("event_type"), col("day_idx"),
        (sum(col("sum_v")).over(w).cast("double") /
          sum(col("n")).over(w).cast("double") / 100.0 - 1).as("sent"),
        sum(col("n")).over(w).as("n_news"),
        lit(l).as("lookback"))
    }.reduce(_ unionByName _)
    val gridDf = (for { t <- SweepTaus; m <- SweepMinNews } yield (t, m))
      .toDF("tau", "min_news")
    val inverse = col("r") < 0
    val signal =
      when(col("n_news") < col("min_news"), "HOLD")
        .when(col("sent") > col("tau"), when(inverse, "SELL").otherwise("BUY"))
        .when(col("sent") < -col("tau"), when(inverse, "BUY").otherwise("SELL"))
        .otherwise("HOLD")
    val wSig = Window
      .partitionBy("event_type", "lookback", "tau", "min_news")
      .orderBy("day_idx")
    trailing
      .crossJoin(broadcast(gridDf))
      .join(broadcast(keyCfg), Seq("event_type"))
      .withColumn("signal", signal)
      .withColumn("prev_sig", lag(col("signal"), 1).over(wSig))
      .withColumn("is_entry",
        (col("signal") === "BUY" &&
          (col("prev_sig").isNull || col("prev_sig") =!= "BUY")).cast("int"))
      .groupBy(col("tau"), col("min_news"), col("lookback"))
      .agg(
        sum(when(col("signal") === "BUY", 1L).otherwise(0L)).as("n_buy"),
        sum(when(col("signal") === "SELL", 1L).otherwise(0L)).as("n_sell"),
        sum(when(col("signal") === "HOLD", 1L).otherwise(0L)).as("n_hold"),
        sum(col("is_entry").cast("long")).as("n_entries"),
        countDistinct(when(col("is_entry") === 1, col("event_type")))
          .as("n_keys_traded"))
      .orderBy("tau", "min_news", "lookback")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p8_signal_pipeline" -> ((s, d) => pipeline(s, d)),
    // The parameterized re-run (both threshold sliders moved), fully
    // oracle-checked like the default — thresholds are SQL constants.
    "p8_signal_strict" -> ((s, d) => pipeline(s, d, SignalConfig.Strict)),
    "pipe11_strategy_sweep" -> ((s, d) => strategySweep(s, d))
  )

  /** Oracle SQL interpolates the SAME config constants the Spark plan
    * uses, so the two cannot drift. */
  private def oracleFor(cfg: SignalConfig): String =
    s"""WITH cfg AS (
           SELECT event_type,
                  corr(value, CAST(json_extract_string(props, '$$.k') AS DOUBLE)) AS r
           FROM events GROUP BY 1),
         daily AS (
           SELECT event_type, date_trunc('day', ts) AS day,
                  avg(value) / 100.0 - 1 AS sent, count(*) AS n
           FROM events GROUP BY 1, 2)
         SELECT d.event_type, d.day, round(d.sent, 6) AS sent, d.n,
                CASE WHEN d.n < ${cfg.minNews} THEN 'HOLD'
                     WHEN d.sent > ${cfg.tau} THEN
                       CASE WHEN c.r < 0 THEN 'SELL' ELSE 'BUY' END
                     WHEN d.sent < -${cfg.tau} THEN
                       CASE WHEN c.r < 0 THEN 'BUY' ELSE 'SELL' END
                     ELSE 'HOLD' END AS signal,
                CASE WHEN c.r < 0 THEN 'inverse' ELSE 'direct' END AS signal_type
         FROM daily d JOIN cfg c ON d.event_type = c.event_type
         ORDER BY d.event_type, d.day"""

  /** The sweep oracle interpolates the same grid constants and builds
    * the three trailing-lookback branches the Spark plan unions.
    * DECIMAL-pinned daily sums make the per-threshold comparisons
    * bit-identical across engines (both divide the same exact sums). */
  private def trailingBranch(l: Int): String =
    s"""SELECT event_type, day_idx,
       |       CAST(sum(sum_v) OVER w$l AS DOUBLE)
       |         / CAST(sum(n) OVER w$l AS DOUBLE)
       |         / CAST(100.0 AS DOUBLE) - 1 AS sent,
       |       sum(n) OVER w$l AS n_news, $l AS lookback
       |FROM didx
       |WINDOW w$l AS (PARTITION BY event_type ORDER BY day_idx
       |             RANGE BETWEEN ${l - 1} PRECEDING AND CURRENT ROW)"""
      .stripMargin

  private val sweepOracle: String = {
    val tauRows = SweepTaus.map(t => s"($t)").mkString(",")
    val mRows = SweepMinNews.map(m => s"($m)").mkString(",")
    s"""WITH cfg AS (
       |  SELECT event_type,
       |         corr(value, CAST(json_extract_string(props, '$$.k') AS DOUBLE)) AS r
       |  FROM events GROUP BY 1),
       |daily AS (
       |  SELECT event_type, date_trunc('day', ts) AS day,
       |         sum(CAST(value AS DECIMAL(18,6))) AS sum_v, count(*) AS n
       |  FROM events GROUP BY 1, 2),
       |didx AS (
       |  SELECT event_type, sum_v, n,
       |         date_diff('day', DATE '1970-01-01', CAST(day AS DATE)) AS day_idx
       |  FROM daily),
       |trail AS (
       |${SweepLookbacks.map(trailingBranch).mkString("", "\nUNION ALL\n", "")}),
       |grid AS (
       |  SELECT CAST(t.tau AS DOUBLE) AS tau, m.min_news
       |  FROM (VALUES $tauRows) t(tau), (VALUES $mRows) m(min_news)),
       |sig AS (
       |  SELECT g.tau, g.min_news, t.lookback, t.event_type, t.day_idx,
       |         CASE WHEN t.n_news < g.min_news THEN 'HOLD'
       |              WHEN t.sent > g.tau THEN
       |                CASE WHEN c.r < 0 THEN 'SELL' ELSE 'BUY' END
       |              WHEN t.sent < -g.tau THEN
       |                CASE WHEN c.r < 0 THEN 'BUY' ELSE 'SELL' END
       |              ELSE 'HOLD' END AS signal
       |  FROM trail t
       |  CROSS JOIN grid g
       |  JOIN cfg c ON t.event_type = c.event_type),
       |ent AS (
       |  SELECT tau, min_news, lookback, event_type, signal,
       |         CASE WHEN signal = 'BUY' AND (prev IS NULL OR prev <> 'BUY')
       |              THEN 1 ELSE 0 END AS is_entry
       |  FROM (SELECT *, lag(signal) OVER (
       |          PARTITION BY event_type, lookback, tau, min_news
       |          ORDER BY day_idx) AS prev
       |        FROM sig))
       |SELECT tau, min_news, lookback,
       |       CAST(sum(CASE WHEN signal = 'BUY' THEN 1 ELSE 0 END) AS BIGINT) AS n_buy,
       |       CAST(sum(CASE WHEN signal = 'SELL' THEN 1 ELSE 0 END) AS BIGINT) AS n_sell,
       |       CAST(sum(CASE WHEN signal = 'HOLD' THEN 1 ELSE 0 END) AS BIGINT) AS n_hold,
       |       CAST(sum(is_entry) AS BIGINT) AS n_entries,
       |       count(DISTINCT CASE WHEN is_entry = 1 THEN event_type END) AS n_keys_traded
       |FROM ent
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "p8_signal_pipeline" -> oracleFor(SignalConfig.Default),
    "p8_signal_strict" -> oracleFor(SignalConfig.Strict),
    "pipe11_strategy_sweep" -> sweepOracle
  )
}
