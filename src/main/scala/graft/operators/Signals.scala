package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p8_signal_pipeline" -> ((s, d) => pipeline(s, d)),
    // The parameterized re-run (both threshold sliders moved), fully
    // oracle-checked like the default — thresholds are SQL constants.
    "p8_signal_strict" -> ((s, d) => pipeline(s, d, SignalConfig.Strict))
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

  val oracles: Map[String, String] = Map(
    "p8_signal_pipeline" -> oracleFor(SignalConfig.Default),
    "p8_signal_strict" -> oracleFor(SignalConfig.Strict)
  )
}
